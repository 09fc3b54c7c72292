"""Vector feature ingestion (building footprints) for blocking.

Implements the reference's planned-but-unbuilt building-blocking feature
(reference ``PLAN.md`` "add building blocking feature" +
``docs/dev/adr/0016-buildings.md``): load building footprints, rasterize
them onto a raster grid, and block them in the models — CostGrow excludes
buildings from the hydraulic-connectivity growth domain; the ToHR worker
masks super-resolved depths inside footprints.
"""

from floodsr_tpu.features.footprints import (
    building_mask_for_grid,
    load_footprints,
    rasterize_polygons,
)

__all__ = [
    "building_mask_for_grid",
    "load_footprints",
    "rasterize_polygons",
]
