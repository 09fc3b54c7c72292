"""Row-band-sharded CostGrow wavefront for multi-chip scale-out.

Single-chip CostGrow runs the least-cost fill as a whole-scene relaxation
(:func:`floodsr_tpu.ops.costgrow.mcp_fill_jax`). Continental-scale DEMs
(the HRDEM mosaics the fetcher targets) outgrow one chip's HBM; this module
shards the scene into contiguous row bands over a mesh axis and runs the
same relaxation per band with an overlapping halo, exchanging only the
band-edge rows between relaxation blocks.

Why this is exact: after ``k`` relaxations, information travels at most
``k`` rows. Each outer block (a) refreshes a ``k``-row halo from the
neighboring bands' current state with one ``ppermute`` per direction,
(b) relaxes ``k`` times on the halo-padded band, (c) crops back to the
core rows. Core rows after a block therefore equal the unsharded
relaxation's rows after the same ``k`` steps; halo rows are scratch and
are re-fetched fresh each block. Convergence is a global fixpoint test
(``psum`` of per-band change flags), matching the unsharded while_loop.

Communication per block: 2 buffers (distance, carried value) × 2
directions × ``k`` rows — a few KB over ICI; the cost surface's halo is
static and exchanged once.

Reference: the single-device semantics being reproduced are the notebook's
``mcp_fill_fast`` (reference ``others/CostGrow_inline.ipynb`` cell 6);
SURVEY §2 names spatial sharding as the TPU-native scale-out equivalent.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax>=0.4.30 moved shard_map out of experimental
    from jax.sharding import shard_map  # type: ignore[attr-defined]
except ImportError:  # pragma: no cover - version shim
    from jax.experimental.shard_map import shard_map

from floodsr_tpu.ops.costgrow import _relax_distance_value


def _exchange_halos(
    core: jnp.ndarray,
    k: int,
    axis_name: str,
    n_bands: int,
    fill,
) -> jnp.ndarray:
    """Pad a (band, w) core with k rows from each neighbor band.

    The first band's top halo and the last band's bottom halo have no
    source; ``ppermute`` leaves them zero, so they are overwritten with
    ``fill`` (an impassable/neutral boundary, matching the unsharded
    array edge).
    """
    idx = jax.lax.axis_index(axis_name)
    down = [(d, d + 1) for d in range(n_bands - 1)]  # my bottom -> next top
    up = [(d, d - 1) for d in range(1, n_bands)]  # my top -> prev bottom
    top_halo = jax.lax.ppermute(core[-k:], axis_name, down)
    bot_halo = jax.lax.ppermute(core[:k], axis_name, up)
    top_halo = jnp.where(idx == 0, fill, top_halo)
    bot_halo = jnp.where(idx == n_bands - 1, fill, bot_halo)
    return jnp.concatenate([top_halo, core, bot_halo], axis=0)


# (mesh, shape, axis, k, cap) -> compiled fill; Mesh is hashable, and the
# jitted function would otherwise be rebuilt (and re-traced/compiled) on
# every mcp_fill_sharded call.
_BUILD_CACHE: dict[tuple, object] = {}


def build_banded_mcp_fill(
    mesh: Mesh,
    shape: tuple[int, int],
    *,
    batch_axis: str = "dp",
    relaxations_per_check: int = 8,
    max_iters: int | None = None,
):
    """Compile a row-band-sharded least-cost fill for a fixed (h, w).

    Returns ``fn(seed_values, seed_mask, cost_surface, domain_mask) ->
    (filled, dist)`` operating on full (h, w) arrays laid out with
    ``PartitionSpec(batch_axis, None)``; h must divide evenly by the mesh
    axis size (use :func:`mcp_fill_sharded` for the padding wrapper).
    """
    h, w = shape
    n_bands = mesh.shape[batch_axis]
    if h % n_bands != 0:
        raise ValueError(f"height {h} not divisible by {n_bands} bands")
    cache_key = (mesh, (h, w), batch_axis, relaxations_per_check, max_iters)
    cached = _BUILD_CACHE.get(cache_key)
    if cached is not None:
        return cached
    # Information travels one row per relaxation: running more relaxations
    # per block than the halo holds would read stale neighbor state, so the
    # block size is clamped to the band height (= widest exchangeable halo).
    k = max(1, min(relaxations_per_check, h // n_bands))
    cap = h * w if max_iters is None else max_iters

    def band_fn(seed_values, seed_mask, cost_surface, domain_mask):
        cost = jnp.where(domain_mask, cost_surface.astype(jnp.float32), jnp.inf)
        valid_seeds = seed_mask & domain_mask
        dist = jnp.where(valid_seeds, 0.0, jnp.inf).astype(jnp.float32)
        value = jnp.where(valid_seeds, seed_values, jnp.nan).astype(jnp.float32)

        # The friction surface never changes: exchange its halo once.
        cost_h = _exchange_halos(cost, k, batch_axis, n_bands, jnp.inf)

        def cond(state):
            _dist, _value, changed, it = state
            return changed & (it < cap)

        def body(state):
            dist, value, _changed, it = state
            dist_h = _exchange_halos(dist, k, batch_axis, n_bands, jnp.inf)
            value_h = _exchange_halos(value, k, batch_axis, n_bands, jnp.nan)
            for _ in range(k):
                dist_h, value_h = _relax_distance_value(dist_h, value_h, cost_h)
            new_dist, new_value = dist_h[k:-k], value_h[k:-k]
            local_changed = jnp.any(new_dist < dist)
            changed = jax.lax.psum(local_changed.astype(jnp.int32), batch_axis) > 0
            return new_dist, new_value, changed, it + k

        dist, value, _, _ = jax.lax.while_loop(
            cond, body, (dist, value, jnp.bool_(True), jnp.int32(0))
        )

        fill_here = domain_mask & ~valid_seeds & jnp.isfinite(dist)
        filled = jnp.where(fill_here, value, seed_values.astype(jnp.float32))
        return filled, dist

    spec = P(batch_axis, None)
    fn = jax.jit(
        shard_map(
            band_fn,
            mesh=mesh,
            in_specs=(spec, spec, spec, spec),
            out_specs=(spec, spec),
            check_rep=False,
        )
    )
    _BUILD_CACHE[cache_key] = fn
    return fn


def mcp_fill_sharded(
    seed_values: np.ndarray,
    seed_mask: np.ndarray,
    cost_surface: np.ndarray,
    domain_mask: np.ndarray,
    mesh: Mesh,
    *,
    batch_axis: str = "dp",
    relaxations_per_check: int = 8,
    max_iters: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Row-band-sharded twin of :func:`floodsr_tpu.ops.costgrow.mcp_fill_jax`.

    Pads the scene to a band multiple with impassable rows, lays the inputs
    out band-sharded on the mesh, runs the halo-exchange relaxation, and
    crops. Semantics (including unreachable-cell behavior) match the
    unsharded fill exactly; only the execution layout differs.
    """
    h, w = seed_values.shape
    n_bands = mesh.shape[batch_axis]
    pad = (-h) % n_bands
    if pad:
        seed_values = np.pad(seed_values, ((0, pad), (0, 0)), constant_values=np.nan)
        seed_mask = np.pad(seed_mask, ((0, pad), (0, 0)), constant_values=False)
        cost_surface = np.pad(
            cost_surface, ((0, pad), (0, 0)), constant_values=np.inf
        )
        domain_mask = np.pad(domain_mask, ((0, pad), (0, 0)), constant_values=False)

    fn = build_banded_mcp_fill(
        mesh,
        seed_values.shape,
        batch_axis=batch_axis,
        relaxations_per_check=relaxations_per_check,
        max_iters=max_iters,
    )
    sharding = NamedSharding(mesh, P(batch_axis, None))
    args = [
        jax.device_put(np.asarray(a), sharding)
        for a in (
            seed_values.astype(np.float32),
            seed_mask.astype(bool),
            cost_surface.astype(np.float32),
            domain_mask.astype(bool),
        )
    ]
    filled, dist = fn(*args)
    filled = np.asarray(filled)[:h]
    dist = np.asarray(dist)[:h]
    return filled, dist
