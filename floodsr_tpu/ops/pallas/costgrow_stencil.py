"""Pallas TPU stencil for the CostGrow wavefront relaxation.

One Bellman-Ford relaxation step of (distance, carried value) over the
8-connected grid with MCP-geometric edge weights
(``length × (cost[u] + cost[v]) / 2``). The jnp reference implementation in
:mod:`floodsr_tpu.ops.costgrow` materializes eight shifted copies of three
scene-sized arrays per step; this kernel performs the whole neighborhood
update in one VMEM pass per block row, reading each input once.

Blocks are row-bands with one-row halos passed as separately-mapped views of
the same arrays (three ``in_specs`` per array with clamped index maps), the
standard Pallas halo pattern. Horizontal neighbors are built in-register with
``pltpu.roll`` + edge masking.

Falls back to the jnp implementation on non-TPU backends (the kernel also
runs under ``interpret=True`` in tests for exactness checks).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SQRT2 = math.sqrt(2.0)
_BIG = 3.0e38  # plain float: kernels cannot capture traced constants


def _shift_x(arr: jnp.ndarray, dx: int, fill: jnp.ndarray) -> jnp.ndarray:
    """Shift columns by dx within a block, filling the vacated edge column."""
    w = arr.shape[1]
    rolled = pltpu.roll(arr, dx % w, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, arr.shape, 1)
    if dx > 0:
        mask = col < dx
    else:
        mask = col >= w + dx
    return jnp.where(mask, fill, rolled)


def _relax_kernel(
    dist_up,
    dist_mid,
    dist_dn,
    val_up,
    val_mid,
    val_dn,
    cost_up,
    cost_mid,
    cost_dn,
    dist_out,
    val_out,
):
    """One relaxation step for a row band (halos as up/dn block views)."""
    # Load all band views once (refs → values).
    dist_up, dist_mid, dist_dn = dist_up[:], dist_mid[:], dist_dn[:]
    val_up, val_mid, val_dn = val_up[:], val_mid[:], val_dn[:]
    cost_up, cost_mid, cost_dn = cost_up[:], cost_mid[:], cost_dn[:]
    best_d = dist_mid
    best_v = val_mid
    cost_c = cost_mid

    def consider(nd, nv):
        nonlocal best_d, best_v
        take = nd < best_d
        best_d = jnp.where(take, nd, best_d)
        best_v = jnp.where(take, nv, best_v)

    b = dist_mid.shape[0]

    # Vertical neighbor rows: up-band's last row sits above row 0.
    dist_above = jnp.concatenate([dist_up[b - 1 :, :], dist_mid[: b - 1, :]], axis=0)
    val_above = jnp.concatenate([val_up[b - 1 :, :], val_mid[: b - 1, :]], axis=0)
    cost_above = jnp.concatenate([cost_up[b - 1 :, :], cost_mid[: b - 1, :]], axis=0)
    row = jax.lax.broadcasted_iota(jnp.int32, dist_mid.shape, 0)
    i = pl.program_id(0)
    above_ok = (row > 0) | (i > 0)
    dist_above = jnp.where(above_ok, dist_above, _BIG)
    # Mask the cost too so boundary candidates overflow to inf instead of
    # producing a finite ~3e38 pseudo-distance that could spread.
    cost_above = jnp.where(above_ok, cost_above, _BIG)

    dist_below = jnp.concatenate([dist_mid[1:, :], dist_dn[:1, :]], axis=0)
    val_below = jnp.concatenate([val_mid[1:, :], val_dn[:1, :]], axis=0)
    cost_below = jnp.concatenate([cost_mid[1:, :], cost_dn[:1, :]], axis=0)
    below_ok = (row < b - 1) | (i < pl.num_programs(0) - 1)
    dist_below = jnp.where(below_ok, dist_below, _BIG)
    cost_below = jnp.where(below_ok, cost_below, _BIG)

    for dist_n, val_n, cost_n, vertical in (
        (dist_mid, val_mid, cost_mid, False),      # horizontal only
        (dist_above, val_above, cost_above, True),
        (dist_below, val_below, cost_below, True),
    ):
        if vertical:
            consider(dist_n + 1.0 * 0.5 * (cost_n + cost_c), val_n)
        step = _SQRT2 if vertical else 1.0
        for dx in (1, -1):
            nd = _shift_x(dist_n, dx, _BIG)
            nv = _shift_x(val_n, dx, float('nan'))
            nc = _shift_x(cost_n, dx, _BIG)
            consider(nd + step * 0.5 * (nc + cost_c), nv)

    dist_out[:] = best_d
    val_out[:] = best_v


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def relax_step_pallas(
    dist: jnp.ndarray,
    value: jnp.ndarray,
    cost: jnp.ndarray,
    block_rows: int = 256,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One 8-neighbor relaxation of (dist, value) over a 2-D grid.

    Infinities are encoded as ≥ ``3e38`` (``jnp.inf`` works too — comparisons
    behave identically). Grid height must be a multiple of ``block_rows``
    (callers pad; :func:`relax_padded` handles it).
    """
    h, w = dist.shape
    assert h % block_rows == 0, f"height {h} not divisible by block {block_rows}"
    n_blocks = h // block_rows

    band = lambda i: (i, 0)  # block index in units of block shape
    up = lambda i: (jnp.maximum(i - 1, 0), 0)
    down = lambda i: (jnp.minimum(i + 1, n_blocks - 1), 0)

    def band_spec(index_map):
        return pl.BlockSpec((block_rows, w), index_map, memory_space=pltpu.VMEM)

    out_shape = (
        jax.ShapeDtypeStruct(dist.shape, jnp.float32),
        jax.ShapeDtypeStruct(value.shape, jnp.float32),
    )
    new_dist, new_value = pl.pallas_call(
        _relax_kernel,
        grid=(n_blocks,),
        in_specs=[
            band_spec(up), band_spec(band), band_spec(down),
            band_spec(up), band_spec(band), band_spec(down),
            band_spec(up), band_spec(band), band_spec(down),
        ],
        out_specs=(band_spec(band), band_spec(band)),
        out_shape=out_shape,
        interpret=interpret,
    )(
        dist, dist, dist,
        value, value, value,
        cost, cost, cost,
    )
    return new_dist, new_value


def pallas_available() -> bool:
    """Whether the compiled (non-interpret) kernel path can run."""
    return jax.default_backend() == "tpu"
