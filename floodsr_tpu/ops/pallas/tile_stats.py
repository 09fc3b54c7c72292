"""Pallas TPU kernel: per-tile DEM normalization stats in one VMEM pass.

``dem_tile_stats`` (``ops/normalize.py``) finds the per-tile percentile by
value-domain bisection — exact to ~(range/2^30), but under XLA every one of
the 30 counting iterations re-reads the ``[N, H, W]`` batch from HBM
(~250 MB of traffic per 8×512² chunk). This kernel keeps each tile resident
in VMEM: one HBM read per tile, then min/max + all bisection iterations on
the VPU, emitting ``[p_clip, dem_min, dem_max]`` per tile.

Semantics match the unfused path exactly (same clamp-to-zero, same
``np.nanpercentile`` linear interpolation between bracketing order
statistics, same derived clipped min/max; reference behavior:
``floodsr/preprocessing.py:118``). Since ``clip(x, 0, p)`` is monotone, the
clipped stats are ``min(lo, p)`` / ``min(hi, p)`` — no extra pass.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BISECT_ITERS = 30  # bracket shrinks to (range / 2^30) — matches normalize.py


def _tile_stats_kernel(dem_ref, out_ref, *, rank_lo: int, rank_hi: int, frac: float):
    x = jnp.maximum(dem_ref[0].astype(jnp.float32), 0.0)
    lo0 = jnp.min(x)
    hi0 = jnp.max(x)

    # Bisect both bracketing order statistics together: carry is
    # [lo_a, hi_a, lo_b, hi_b] as f32 scalars.
    want_a = jnp.float32(rank_lo + 1)
    want_b = jnp.float32(rank_hi + 1)

    def body(_, carry):
        lo_a, hi_a, lo_b, hi_b = carry
        mid_a = 0.5 * (lo_a + hi_a)
        mid_b = 0.5 * (lo_b + hi_b)
        le_a = jnp.sum((x <= mid_a).astype(jnp.float32))
        le_b = jnp.sum((x <= mid_b).astype(jnp.float32))
        hit_a = le_a >= want_a
        hit_b = le_b >= want_b
        return (
            jnp.where(hit_a, lo_a, mid_a),
            jnp.where(hit_a, mid_a, hi_a),
            jnp.where(hit_b, lo_b, mid_b),
            jnp.where(hit_b, mid_b, hi_b),
        )

    _, stat_a, _, stat_b = jax.lax.fori_loop(
        0, BISECT_ITERS, body, (lo0, hi0, lo0, hi0)
    )
    p_clip = stat_a + jnp.float32(frac) * (stat_b - stat_a)
    # The whole [N, 3] stats array rides in SMEM (TPU block-shape rules
    # reject a (1, 3) block); each grid step writes its own row.
    i = pl.program_id(0)
    out_ref[i, 0] = p_clip
    out_ref[i, 1] = jnp.minimum(lo0, p_clip)
    out_ref[i, 2] = jnp.minimum(hi0, p_clip)


@functools.partial(jax.jit, static_argnames=("pct_clip", "interpret"))
def dem_tile_stats_pallas(
    dem: jnp.ndarray, pct_clip: float, *, interpret: bool = False
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-tile ``(p_clip, dem_min, dem_max)`` for a ``[N, H, W]`` batch."""
    assert dem.ndim == 3, dem.shape
    n, h, w = dem.shape
    count = h * w
    target = (float(pct_clip) / 100.0) * (count - 1)
    k = math.floor(target)
    frac = target - k

    kernel = functools.partial(
        _tile_stats_kernel,
        rank_lo=int(k),
        rank_hi=int(min(k + 1, count - 1)),
        frac=float(frac),
    )
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((n, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((n, 3), jnp.float32),
        interpret=interpret,
    )(dem.astype(jnp.float32))
    return out[:, 0], out[:, 1], out[:, 2]


def tile_stats_eligible(shape: tuple[int, ...]) -> bool:
    """VMEM residency bound: one [H, W] f32 tile plus comparison temporaries.

    The kernel needs the tile plus ~2 tile-sized boolean/float temporaries
    for the bisection counts, so the bound is 3 tile-equivalents against the
    Mosaic default 16 MiB VMEM budget (the hr_tail kernel documents the same
    default) — a tile over ~5 MiB would compile-fail at runtime instead of
    falling back to the unfused XLA path.
    """
    if len(shape) != 3:
        return False
    return 3 * shape[1] * shape[2] * 4 <= 16 * 1024 * 1024
