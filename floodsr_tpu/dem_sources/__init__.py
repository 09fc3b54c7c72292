from floodsr_tpu.dem_sources.catalog import fetch_dem
from floodsr_tpu.dem_sources.base import DemFetchResult

__all__ = ["fetch_dem", "DemFetchResult"]
