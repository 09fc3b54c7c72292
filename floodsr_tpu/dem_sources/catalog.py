"""Registry and dispatch for DEM source backends (reference parity:
``floodsr/dem_sources/catalog.py:10-32``)."""

from __future__ import annotations

import logging
from pathlib import Path

from floodsr_tpu.dem_sources.base import DemFetchResult


def _hrdem_fetch(**kwargs) -> DemFetchResult:
    from floodsr_tpu.dem_sources.hrdem_stac import fetch_hrdem_for_lowres_tile

    return fetch_hrdem_for_lowres_tile(**kwargs)


_SOURCE_REGISTRY = {
    "hrdem": _hrdem_fetch,
}


def fetch_dem(
    *,
    source_id: str,
    depth_lr_fp: str | Path,
    output_fp: str | Path | None = None,
    logger=None,
) -> DemFetchResult:
    """Fetch a DEM for the given low-res depth tile using one registered source."""
    log = logger or logging.getLogger(__name__)
    source_key = str(source_id).strip().lower()
    assert source_key in _SOURCE_REGISTRY, f"unsupported DEM source_id='{source_id}'"
    log.debug(f"dispatching DEM fetch for source_id={source_key}")
    return _SOURCE_REGISTRY[source_key](
        depth_lr_fp=depth_lr_fp,
        output_fp=output_fp,
        logger=log,
    )
