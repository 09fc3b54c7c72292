"""Cache path helpers for model weights (reference parity: ``floodsr/cache_paths.py``).

Layout: ``<cache>/<model_version>/<file_name>`` under the platform user cache
(or an explicit override). The richer cache-policy surface the reference only
specifies as future work (ADR-0012) is implemented in
:mod:`floodsr_tpu.cache_policy`.
"""

from __future__ import annotations

import logging
from pathlib import Path

from platformdirs import user_cache_dir

APP_NAME = "floodsr"
APP_AUTHOR = "floodsr"
log = logging.getLogger(__name__)


def get_cache_dir(cache_dir: str | Path | None = None) -> Path:
    """Return a writable cache directory, creating it as needed."""
    if cache_dir is not None:
        path = Path(cache_dir).expanduser().resolve()
    else:
        path = Path(user_cache_dir(APP_NAME, APP_AUTHOR))
    path.mkdir(parents=True, exist_ok=True)
    assert path.exists(), f"failed to create cache directory: {path}"
    return path


def get_model_cache_path(
    model_version: str,
    file_name: str,
    cache_dir: str | Path | None = None,
) -> Path:
    """Cache path for one model file, grouped per model version."""
    assert model_version, "model_version cannot be empty"
    assert file_name, "file_name cannot be empty"
    model_fp = get_cache_dir(cache_dir) / model_version / file_name
    model_fp.parent.mkdir(parents=True, exist_ok=True)
    return model_fp
