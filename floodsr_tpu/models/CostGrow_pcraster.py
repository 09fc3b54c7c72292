"""CostGrow_pcraster model worker: the PCRaster-variant CostGrow on device.

Implements the reference's planned ``costgrow_pcraster`` model feature
(reference ``PLAN.md`` "add costgrow_pcraster model feature";
``others/CostGrow_pcraster_inline.ipynb``) as a sibling worker of
:mod:`floodsr_tpu.models.CostGrow`. The two variants share phases 01
(resample), 02 (wet partials) and 04 (anchored-component filter); this one
reproduces the notebook's phase-03 differences exactly:

- the *neutral* fill happens on the COARSE grid — nearest finite value
  under a grid metric (the notebook's ``distance_transform_cdt`` index
  fill) — and is then bilinear-resampled to the fine grid to build the
  terrain-penalty cost surface (notebook ``_distance_fill_cost_terrain``);
- the growth threshold and linear decay use the plain grid distance
  (chessboard by default) from the wet anchors over the WHOLE raster,
  not the cost-weighted geodesic distance (notebook ``_03_dry_partials``);
- the fill allocation is PCRaster ``spreadzone`` semantics: every dry cell
  takes the WSE of its minimum-cost source over the friction surface
  (notebook ``_distance_fill_cost_pcraster``). On device this is the same
  least-cost value propagation as the base worker's MCP fill — PCRaster's
  ``spread`` and skimage's ``MCP_Geometric`` share the edge-weight
  convention (step length × mean endpoint friction), so one wavefront
  kernel serves both variants.

The "model artifact" is a JSON parameter file (no weights):
``{"model_version": "CostGrow_pcraster", "dp_coarse_pixel_max": 10,
"decay_frac": 0.001, "terrain_penalty_scale": 1.0,
"distance_metric": "chessboard", "output_kind": "wse"|"depth"}`` —
every key optional. ``dp_coarse_pixel_max: null`` disables the growth
threshold (the notebook's ``dp_coarse_pixel_max=None`` branch).
"""

from __future__ import annotations

from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from floodsr_tpu.models.CostGrow import ModelWorker as _CostGrowWorker
from floodsr_tpu.ops.costgrow import (
    grid_distance_jax,
    keep_components_connected_to_anchor_jax,
    mcp_fill_jax,
    nearest_fill_numpy,
)
from floodsr_tpu.ops.resample import reproject_bilinear_auto


def _costgrow_pcraster_phases(
    wse_fine: jnp.ndarray,
    dem: jnp.ndarray,
    dem_valid: jnp.ndarray,
    cost_fine: jnp.ndarray,
    *,
    dp_fine_pixel_max: float | None,
    decay_per_pixel: float,
    metric: str,
) -> jnp.ndarray:
    """Phases 02-04 (PCRaster semantics) as one traceable computation.

    ``cost_fine`` is the terrain-penalty friction surface built host-side
    from the coarse-filled WSE (NaN = outside the traversable domain);
    ``dem`` carries ``inf`` on invalid cells so comparisons stay NaN-free.
    """
    # 02: wet partials — keep cells strictly above terrain (notebook
    # ``_02_wet_partials`` masks ``wse <= dem``).
    wse_wet = jnp.where(wse_fine > dem, wse_fine, jnp.nan)
    anchor_mask = jnp.isfinite(wse_wet)

    # 03a: plain grid distance from the anchors over the whole raster
    # (notebook ``distance_transform_cdt`` on ``wse2.isnull()``). With a
    # growth threshold, only distances < dp_fine_pixel_max are consumed
    # (farther cells never grow, and their untouched ``inf`` distance
    # fails the threshold exactly like a converged large value), so the
    # relaxation is bounded instead of running to whole-grid fixpoint.
    dist_iters = None
    if dp_fine_pixel_max is not None:
        dist_iters = max(8, int(np.ceil(dp_fine_pixel_max)) + 1)
    distance_px = grid_distance_jax(anchor_mask, metric=metric, max_iters=dist_iters)

    # 03b: spreadzone allocation — each dry cell inherits the WSE of its
    # minimum-cost source over the friction surface.
    cost_valid = jnp.isfinite(cost_fine)
    domain = dem_valid & cost_valid
    filled, _ = mcp_fill_jax(
        jnp.where(anchor_mask, wse_wet, jnp.nan),
        anchor_mask,
        jnp.where(cost_valid, cost_fine, jnp.inf),
        domain,
    )

    # 03c: linear decay with grid distance, grown zone only (anchors keep
    # their exact WSE — notebook ``decay_zone_bar = wse2.isnull()``).
    decay = jnp.where(anchor_mask, 0.0, distance_px * decay_per_pixel)
    filled_decayed = filled - decay

    # 03d: growth threshold in coarse-pixel grid distance.
    if dp_fine_pixel_max is None:
        grow_thresh = jnp.ones_like(anchor_mask)
    else:
        grow_thresh = distance_px < dp_fine_pixel_max

    grown = jnp.where(
        grow_thresh & (filled_decayed > dem), filled_decayed, jnp.nan
    )
    out = jnp.where(anchor_mask, wse_wet, grown)

    # 04: drop wet blobs disconnected from the anchors (orthogonal
    # adjacency — the notebook's ``label(..., connectivity=1)``).
    wet_post = jnp.isfinite(out)
    keep = keep_components_connected_to_anchor_jax(wet_post, anchor_mask)
    out = jnp.where(keep, out, jnp.nan)
    return jnp.where(dem_valid, out, jnp.nan)


class ModelWorker(_CostGrowWorker):
    """CostGrow with the PCRaster variant's phase-03 semantics."""

    model_version = "CostGrow_pcraster"
    _PARAM_KEYS = frozenset(
        {
            "model_version",
            "dp_coarse_pixel_max",
            "decay_frac",
            "terrain_penalty_scale",
            "distance_metric",
            "output_kind",
        }
    )

    def _apply_phases(
        self,
        *,
        wse_fine: np.ndarray,
        dem: np.ndarray,
        dem_valid: np.ndarray,
        wse_coarse: np.ndarray,
        wse_transform,
        dem_transform,
        downscale: int,
        fine_pixel: float,
    ) -> tuple[np.ndarray, dict[str, Any]]:
        dp_raw = self.params.get("dp_coarse_pixel_max", 10)
        dp_coarse_pixel_max = None if dp_raw is None else float(dp_raw)
        decay_frac = float(self.params.get("decay_frac", 0.001))
        terrain_penalty_scale = float(self.params.get("terrain_penalty_scale", 1.0))
        metric = str(self.params.get("distance_metric", "chessboard")).lower()
        if metric not in {"chessboard", "taxicab"}:
            raise ValueError(
                f"unsupported distance_metric={metric!r} (chessboard|taxicab)"
            )
        dp_fine_pixel_max = (
            None if dp_coarse_pixel_max is None else dp_coarse_pixel_max * downscale
        )

        # 03 prologue (host): neutral-fill the COARSE WSE, resample to the
        # fine grid, and build the terrain-penalty friction surface
        # (notebook ``_distance_fill_cost_terrain``).
        coarse = np.asarray(wse_coarse, dtype=np.float64)
        finite = np.isfinite(coarse)
        if finite.any() and not finite.all():
            coarse_filled = nearest_fill_numpy(coarse, metric=metric)
        else:
            coarse_filled = coarse
        filled_fine = reproject_bilinear_auto(
            np.where(np.isfinite(coarse_filled), coarse_filled, -9999.0),
            wse_transform,
            dem.shape,
            dem_transform,
            src_nodata=-9999.0,
            dst_nodata=np.nan,
        )
        delta = filled_fine - dem
        cost_fine = np.where(
            delta > 0.0, 1.0, 1.0 + np.abs(delta) * terrain_penalty_scale
        )
        cost_fine = np.where(
            dem_valid & np.isfinite(delta), cost_fine, np.nan
        ).astype(np.float32)

        phases = jax.jit(
            lambda a, b, c, d: _costgrow_pcraster_phases(
                a,
                b,
                c,
                d,
                dp_fine_pixel_max=dp_fine_pixel_max,
                decay_per_pixel=decay_frac * fine_pixel,
                metric=metric,
            )
        )
        wse_out = np.asarray(
            phases(
                jnp.asarray(wse_fine),
                jnp.asarray(np.nan_to_num(dem, nan=np.inf)),
                jnp.asarray(dem_valid),
                jnp.asarray(cost_fine),
            )
        )
        return wse_out, {
            "variant": "pcraster",
            "dp_coarse_pixel_max": dp_coarse_pixel_max,
            "dp_fine_pixel_max": dp_fine_pixel_max,
            "decay_frac": decay_frac,
            "terrain_penalty_scale": terrain_penalty_scale,
            "distance_metric": metric,
        }
