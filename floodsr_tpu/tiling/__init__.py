from floodsr_tpu.tiling.windows import (
    build_feather_ramp,
    build_tile_starts,
    iter_window_origins,
)
from floodsr_tpu.tiling.mosaic import (
    build_window_grid,
    feather_weights_for_grid,
    mosaic_scatter_add,
)

__all__ = [
    "build_tile_starts",
    "build_feather_ramp",
    "iter_window_origins",
    "build_window_grid",
    "feather_weights_for_grid",
    "mosaic_scatter_add",
]
