from floodsr_tpu.ops.normalize import (
    dem_tile_stats,
    invert_depth_log1p,
    invert_depth_log1p_np,
    normalize_dem,
    normalize_dem_batch,
    normalize_dem_with_stats,
    normalize_dem_with_stats_np,
    replace_nodata_with_zero,
    scale_depth_log1p,
    scale_depth_log1p_np,
)

__all__ = [
    "scale_depth_log1p",
    "scale_depth_log1p_np",
    "invert_depth_log1p",
    "invert_depth_log1p_np",
    "normalize_dem",
    "normalize_dem_batch",
    "normalize_dem_with_stats",
    "normalize_dem_with_stats_np",
    "dem_tile_stats",
    "replace_nodata_with_zero",
]
