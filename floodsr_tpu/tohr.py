"""ToHR pipeline entrypoint (reference parity: ``floodsr/tohr.py:9-43``)."""

from __future__ import annotations

import logging
from pathlib import Path

from floodsr_tpu.model_registry import resolve_model_worker_class


def tohr(
    *,
    model_version: str,
    model_fp: str | Path,
    depth_lr_fp: str | Path,
    dem_hr_fp: str | Path,
    output_fp: str | Path,
    max_depth: float | None = None,
    dem_pct_clip: float | None = None,
    window_method: str = "feather",
    tile_overlap: int | None = None,
    tile_size: int | None = None,
    logger=None,
    engine_options: dict | None = None,
) -> dict[str, object]:
    """Run one ToHR pass through the model worker lifecycle.

    ``engine_options`` (e.g. ``compute_dtype``, ``max_batch``,
    ``output_transfer`` from :mod:`floodsr_tpu.config`) are forwarded to the
    worker constructor where its signature accepts them.
    """
    import inspect

    log = logger or logging.getLogger(__name__)
    assert model_version, "model_version cannot be empty"
    model_path = Path(model_fp).expanduser().resolve()
    assert model_path.exists(), f"model file does not exist: {model_path}"

    worker_class = resolve_model_worker_class(model_version)
    accepted = inspect.signature(worker_class.__init__).parameters
    options = {
        k: v for k, v in (engine_options or {}).items() if k in accepted
    }
    worker = worker_class(model_fp=model_path, logger=log, **options)
    with worker as ready_worker:
        result = ready_worker.run(
            depth_lr_fp=depth_lr_fp,
            dem_hr_fp=dem_hr_fp,
            output_fp=output_fp,
            max_depth=max_depth,
            dem_pct_clip=dem_pct_clip,
            window_method=window_method,
            tile_overlap=tile_overlap,
            tile_size=tile_size,
        )
    return result
