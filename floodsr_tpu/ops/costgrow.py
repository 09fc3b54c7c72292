"""CostGrow primitives: least-cost distance/fill and connectivity filtering.

The reference's future CostGrow model (reference:
``others/CostGrow_inline.ipynb`` cells 6, 14-22; listed as planned in
``README.md:10-12``) uses ``skimage.graph.MCP_Geometric`` — a sequential
Cython Dijkstra — for three primitives:

- ``mcp_distance``: least-cost distance from seed cells over a domain;
- ``mcp_fill``: propagate each seed's VALUE along its least-cost paths
  (geometric edge weight: step length × mean of endpoint costs, 8-connected);
- ``keep_components_connected_to_anchor``: drop wet blobs disconnected from
  anchor cells.

TPU-native formulation: all three are Bellman-Ford-style wavefront
relaxations — each iteration is eight shifted adds and a minimum, fully
vectorized on the VPU — run under ``lax.while_loop`` until fixpoint. A
sequential-Dijkstra numpy twin is provided as the correctness oracle for
tests (exact same edge-weight convention).
"""

from __future__ import annotations

import heapq
import math

import numpy as np

import jax
import jax.numpy as jnp

_SQRT2 = math.sqrt(2.0)
# 8-connected neighborhood: (dy, dx, step length)
_NEIGHBORS = [
    (-1, -1, _SQRT2), (-1, 0, 1.0), (-1, 1, _SQRT2),
    (0, -1, 1.0), (0, 1, 1.0),
    (1, -1, _SQRT2), (1, 0, 1.0), (1, 1, _SQRT2),
]

_INF = jnp.float32(jnp.inf)


def _shift(arr: jnp.ndarray, dy: int, dx: int, fill) -> jnp.ndarray:
    """Shift a 2-D array by (dy, dx), filling vacated cells."""
    out = arr
    if dy:
        pad = jnp.full((abs(dy), arr.shape[1]), fill, arr.dtype)
        out = (
            jnp.concatenate([pad, out[:-dy]], axis=0)
            if dy > 0
            else jnp.concatenate([out[-dy:], pad], axis=0)
        )
    if dx:
        pad = jnp.full((out.shape[0], abs(dx)), fill, arr.dtype)
        out = (
            jnp.concatenate([pad, out[:, :-dx]], axis=1)
            if dx > 0
            else jnp.concatenate([out[:, -dx:], pad], axis=1)
        )
    return out


def _relax_distance_value(dist, value, cost):
    """One 8-neighbor relaxation of (distance, carried value)."""
    best_d, best_v = dist, value
    for dy, dx, length in _NEIGHBORS:
        neighbor_d = _shift(dist, dy, dx, jnp.inf)
        neighbor_c = _shift(cost, dy, dx, jnp.inf)
        neighbor_v = _shift(value, dy, dx, jnp.nan)
        cand = neighbor_d + length * 0.5 * (neighbor_c + cost)
        take = cand < best_d
        best_d = jnp.where(take, cand, best_d)
        best_v = jnp.where(take, neighbor_v, best_v)
    return best_d, best_v


def _pallas_block_rows(h: int, w: int) -> int:
    """Largest row-band (multiple of 8) fitting the stencil's VMEM working set."""
    budget = 10 * 1024 * 1024  # bytes; ~11 band-sized f32 buffers live at once
    rows = budget // max(1, 11 * w * 4)
    rows = max(8, min(256, (rows // 8) * 8))
    return rows


def mcp_fill_jax(
    seed_values: jnp.ndarray,
    seed_mask: jnp.ndarray,
    cost_surface: jnp.ndarray,
    domain_mask: jnp.ndarray,
    target_mask: jnp.ndarray | None = None,
    max_iters: int | None = None,
    relaxations_per_check: int = 8,
    use_pallas: bool | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Propagate seed values along least-cost paths; returns (filled, costs).

    Matches ``mcp_fill_fast`` semantics (reference notebook cell 6): the
    filled array keeps seed values on seeds, copies the source seed's value
    onto reachable target cells, and leaves everything else untouched.

    On TPU the relaxation runs as a Pallas row-band stencil
    (:mod:`floodsr_tpu.ops.pallas.costgrow_stencil`); elsewhere (or with
    ``use_pallas=False``) the vectorized shift formulation is used.
    """
    h, w = seed_values.shape
    if max_iters is None:
        # Worst-case least-cost path visits every cell once (serpentine
        # channels); h*w relaxations guarantee convergence, and the
        # while_loop exits as soon as a sweep changes nothing.
        max_iters = h * w
    if use_pallas is None:
        from floodsr_tpu.ops.pallas.costgrow_stencil import pallas_available

        use_pallas = pallas_available()

    cost = jnp.where(domain_mask, cost_surface.astype(jnp.float32), jnp.inf)
    valid_seeds = seed_mask & domain_mask
    dist0 = jnp.where(valid_seeds, 0.0, jnp.inf).astype(jnp.float32)
    val0 = jnp.where(valid_seeds, seed_values, jnp.nan).astype(jnp.float32)

    pad_h = 0
    if use_pallas:
        from floodsr_tpu.ops.pallas.costgrow_stencil import relax_step_pallas

        block_rows = _pallas_block_rows(h, w)
        pad_h = (-h) % block_rows
        if pad_h:
            # Impassable padding rows: infinite cost blocks traversal.
            dist0 = jnp.pad(dist0, ((0, pad_h), (0, 0)), constant_values=jnp.inf)
            val0 = jnp.pad(val0, ((0, pad_h), (0, 0)), constant_values=jnp.nan)
            cost_p = jnp.pad(cost, ((0, pad_h), (0, 0)), constant_values=jnp.inf)
        else:
            cost_p = cost

        def relax(dist, value):
            return relax_step_pallas(dist, value, cost_p, block_rows=block_rows)

    else:

        def relax(dist, value):
            return _relax_distance_value(dist, value, cost)

    def cond(state):
        dist, value, prev_dist, it = state
        changed = jnp.any(dist < prev_dist)
        return changed & (it < max_iters)

    def body(state):
        dist, value, _prev, it = state
        prev = dist
        for _ in range(relaxations_per_check):
            dist, value = relax(dist, value)
        return dist, value, prev, it + relaxations_per_check

    dist, value, _, _ = jax.lax.while_loop(
        cond, body, (dist0, val0, jnp.full_like(dist0, jnp.inf), jnp.int32(0))
    )
    if pad_h:
        dist = dist[:h]
        value = value[:h]
    if use_pallas:
        # Boundary-fill sentinels (~3e38) are not reachable distances.
        dist = jnp.where(dist > 1e37, jnp.inf, dist)

    if target_mask is None:
        fill_here = domain_mask & ~valid_seeds
    else:
        fill_here = target_mask & domain_mask & ~valid_seeds
    fill_here = fill_here & jnp.isfinite(dist)
    filled = jnp.where(fill_here, value, seed_values.astype(jnp.float32))
    return filled, dist


def mcp_distance_jax(
    seed_mask: jnp.ndarray,
    domain_mask: jnp.ndarray,
    max_iters: int | None = None,
) -> jnp.ndarray:
    """Least-cost distance over a unit-cost domain (reference ``mcp_distance``)."""
    zeros = jnp.zeros(seed_mask.shape, jnp.float32)
    _, dist = mcp_fill_jax(
        zeros, seed_mask, jnp.ones(seed_mask.shape, jnp.float32), domain_mask,
        max_iters=max_iters,
    )
    return dist


def grid_distance_jax(
    seed_mask: jnp.ndarray,
    metric: str = "chessboard",
    max_iters: int | None = None,
    relaxations_per_check: int = 8,
) -> jnp.ndarray:
    """Unit-step grid distance from seed cells over the whole array.

    Device twin of ``scipy.ndimage.distance_transform_cdt`` as the
    reference's PCRaster CostGrow variant uses it (reference
    ``others/CostGrow_pcraster_inline.ipynb`` ``_distance_fill`` /
    ``_03_dry_partials``): ``"chessboard"`` = Chebyshev distance
    (8-neighbor unit steps), ``"taxicab"`` = Manhattan (4-neighbor).
    No domain masking — the reference computes it over the full raster
    and masks afterwards. Returns float32 distances in pixels
    (``inf`` where no seed is reachable, i.e. only when no seed exists).
    """
    if metric not in ("chessboard", "taxicab"):
        raise ValueError(f"metric must be 'chessboard' or 'taxicab', got {metric!r}")
    h, w = seed_mask.shape
    if max_iters is None:
        # Chebyshev/Manhattan eccentricity is bounded by the grid extent.
        max_iters = h + w
    steps = [
        (dy, dx)
        for dy, dx, _len in _NEIGHBORS
        if metric == "chessboard" or dy == 0 or dx == 0
    ]
    dist0 = jnp.where(seed_mask, 0.0, jnp.inf).astype(jnp.float32)

    def relax(dist):
        best = dist
        for dy, dx in steps:
            best = jnp.minimum(best, _shift(dist, dy, dx, jnp.inf) + 1.0)
        return best

    def cond(state):
        dist, prev, it = state
        return jnp.any(dist < prev) & (it < max_iters)

    def body(state):
        dist, _prev, it = state
        prev = dist
        for _ in range(relaxations_per_check):
            dist = relax(dist)
        return dist, prev, it + relaxations_per_check

    dist, _, _ = jax.lax.while_loop(
        cond, body, (dist0, jnp.full_like(dist0, jnp.inf), jnp.int32(0))
    )
    return dist


def nearest_fill_numpy(
    values: np.ndarray, metric: str = "chessboard"
) -> np.ndarray:
    """Fill NaN cells with the value of the nearest finite cell (host side).

    Behavioral twin of the reference's ``_distance_fill`` (reference
    ``others/CostGrow_pcraster_inline.ipynb``: ``distance_transform_cdt``
    index lookup): each empty cell takes the value of its nearest finite
    cell under the chosen grid metric. Ties between equidistant sources are
    resolved by neighbor-scan order (the reference inherits scipy's
    internal tie-break; both pick *some* nearest source). Runs as iterated
    dilation in numpy — intended for the small coarse grid.
    """
    if metric not in ("chessboard", "taxicab"):
        raise ValueError(f"metric must be 'chessboard' or 'taxicab', got {metric!r}")
    out = np.asarray(values, dtype=np.float64).copy()
    filled = np.isfinite(out)
    if not filled.any():
        raise ValueError("nearest_fill_numpy: array has no finite cells")
    steps = [
        (dy, dx)
        for dy, dx, _len in _NEIGHBORS
        if metric == "chessboard" or dy == 0 or dx == 0
    ]
    h, w = out.shape
    while not filled.all():
        # Read only the previous ring: filling must not chain within one
        # dilation step or the metric degrades (taxicab would pick up
        # diagonal jumps composed from two orthogonal shifts).
        prev_out = out.copy()
        prev_filled = filled.copy()
        for dy, dx in steps:
            src_slice = (
                slice(max(0, -dy), h - max(0, dy)),
                slice(max(0, -dx), w - max(0, dx)),
            )
            dst_slice = (
                slice(max(0, dy), h - max(0, -dy)),
                slice(max(0, dx), w - max(0, -dx)),
            )
            take = ~filled[dst_slice] & prev_filled[src_slice]
            if take.any():
                dst_view = out[dst_slice]
                dst_view[take] = prev_out[src_slice][take]
                filled[dst_slice] |= take
    return out


def keep_components_connected_to_anchor_jax(
    wet_mask: jnp.ndarray,
    anchor_mask: jnp.ndarray,
    max_iters: int | None = None,
    connectivity: int = 1,
) -> jnp.ndarray:
    """Keep wet cells connected to any anchor (reference notebook cell 22).

    ``connectivity`` follows the skimage convention the reference uses
    (``label(..., connectivity=1)`` in both ``others/CostGrow_inline.ipynb``
    and ``others/CostGrow_pcraster_inline.ipynb``): 1 = orthogonal
    neighbors only (the reference default), 2 = diagonals included.
    """
    if connectivity not in (1, 2):
        raise ValueError(f"connectivity must be 1 or 2, got {connectivity}")
    h, w = wet_mask.shape
    if max_iters is None:
        # A connected component can snake through every wet cell, so the
        # safe dilation bound is h*w; convergence exits the loop early.
        max_iters = h * w
    wet = wet_mask.astype(bool)
    reach0 = (anchor_mask & wet).astype(bool)
    steps = [
        (dy, dx)
        for dy, dx, _len in _NEIGHBORS
        if connectivity == 2 or dy == 0 or dx == 0
    ]

    def dilate(mask):
        out = mask
        for dy, dx in steps:
            out = out | _shift(mask, dy, dx, False)
        return out & wet

    def cond(state):
        reach, prev_count, it = state
        return (jnp.sum(reach) > prev_count) & (it < max_iters)

    def body(state):
        reach, _prev, it = state
        prev = jnp.sum(reach)
        for _ in range(8):
            reach = dilate(reach)
        return reach, prev, it + 8

    reach, _, _ = jax.lax.while_loop(cond, body, (reach0, jnp.int32(-1), jnp.int32(0)))
    return reach


# ---------------------------------------------------------------------------
# numpy oracle (sequential Dijkstra; tests only — small grids)
# ---------------------------------------------------------------------------


def mcp_fill_numpy(
    seed_values: np.ndarray,
    seed_mask: np.ndarray,
    cost_surface: np.ndarray,
    domain_mask: np.ndarray,
    target_mask: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Exact Dijkstra twin of :func:`mcp_fill_jax` (MCP_Geometric weights)."""
    h, w = seed_values.shape
    cost = np.where(domain_mask, cost_surface.astype(np.float64), np.inf)
    valid_seeds = seed_mask & domain_mask
    if not valid_seeds.any():
        raise ValueError("No valid seed cells available for MCP fill.")

    dist = np.full((h, w), np.inf)
    value = np.full((h, w), np.nan)
    heap: list[tuple[float, int, int]] = []
    rows, cols = np.nonzero(valid_seeds)
    for r, c in zip(rows, cols):
        dist[r, c] = 0.0
        value[r, c] = seed_values[r, c]
        heapq.heappush(heap, (0.0, int(r), int(c)))

    while heap:
        d, r, c = heapq.heappop(heap)
        if d > dist[r, c]:
            continue
        for dy, dx, length in _NEIGHBORS:
            nr, nc = r + dy, c + dx
            if not (0 <= nr < h and 0 <= nc < w):
                continue
            if not np.isfinite(cost[nr, nc]):
                continue
            nd = d + length * 0.5 * (cost[r, c] + cost[nr, nc])
            if nd < dist[nr, nc]:
                dist[nr, nc] = nd
                value[nr, nc] = value[r, c]
                heapq.heappush(heap, (nd, nr, nc))

    if target_mask is None:
        fill_here = domain_mask & ~valid_seeds
    else:
        fill_here = target_mask & domain_mask & ~valid_seeds
    fill_here = fill_here & np.isfinite(dist)
    filled = np.where(fill_here, value, seed_values.astype(np.float64))
    return filled.astype(np.float32), dist.astype(np.float32)
