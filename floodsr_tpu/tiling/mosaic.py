"""Device-side tile mosaicking: batched feather blend as one jitted region.

The reference stitches tiles with a Python loop of numpy slice-adds over the
scene (reference: ``floodsr/models/ResUNet_16x_DEM.py:296-363``). Here the
whole mosaic is computed on device: per-tile feather weights (including the
reference's scene-edge flattening) are built vectorized over the tile batch,
and accumulation runs as a ``lax.fori_loop`` of contiguous dynamic-slice
updates — deterministic, fusion-friendly, and without host round-trips.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from floodsr_tpu.tiling.windows import build_feather_ramp, build_tile_starts


def build_window_grid(
    height: int,
    width: int,
    tile: int,
    stride: int,
) -> dict[str, np.ndarray | int]:
    """Build the full row-major window-origin grid for a padded scene.

    Returns origin arrays ``y0``/``x0`` with grid indices ``yi``/``xi`` (used
    for edge-flattened feather weights) plus grid extents ``ny``/``nx``.
    """
    y_starts = build_tile_starts(height, tile, stride)
    x_starts = build_tile_starts(width, tile, stride)
    ny, nx = len(y_starts), len(x_starts)
    yi, xi = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
    y0 = np.asarray(y_starts, dtype=np.int32)[yi]
    x0 = np.asarray(x_starts, dtype=np.int32)[xi]
    return {
        "y0": y0.reshape(-1).astype(np.int32),
        "x0": x0.reshape(-1).astype(np.int32),
        "yi": yi.reshape(-1).astype(np.int32),
        "xi": xi.reshape(-1).astype(np.int32),
        "ny": ny,
        "nx": nx,
    }


def feather_weights_for_grid(
    tile: int,
    overlap: int,
    yi: jnp.ndarray,
    xi: jnp.ndarray,
    ny: int,
    nx: int,
) -> jnp.ndarray:
    """Per-tile ``[N, tile, tile]`` feather weights with scene-edge flattening.

    Matches the reference blend: a separable linear ramp, with the ramp
    replaced by 1.0 on tiles touching the scene boundary so domain edges are
    not dimmed (reference: ``floodsr/models/ResUNet_16x_DEM.py:330-345``).
    ``overlap == 0`` yields all-ones weights (hard mode on a disjoint grid).
    """
    ramp = jnp.asarray(build_feather_ramp(tile, overlap))  # [tile]
    pos = jnp.arange(tile)
    in_head = pos < overlap
    in_tail = pos >= tile - overlap

    def axis_weights(idx: jnp.ndarray, n: int) -> jnp.ndarray:
        w = jnp.broadcast_to(ramp, (idx.shape[0], tile))
        if overlap > 0:
            first = (idx == 0)[:, None]
            last = (idx == n - 1)[:, None]
            w = jnp.where(first & in_head[None, :], 1.0, w)
            w = jnp.where(last & in_tail[None, :], 1.0, w)
        return w

    wy = axis_weights(yi, ny)  # [N, tile]
    wx = axis_weights(xi, nx)  # [N, tile]
    return (wy[:, :, None] * wx[:, None, :]).astype(jnp.float32)


def mosaic_scatter_add(
    preds: jnp.ndarray,
    weights: jnp.ndarray,
    y0: jnp.ndarray,
    x0: jnp.ndarray,
    out_shape: tuple[int, int],
) -> jnp.ndarray:
    """Accumulate weighted tiles into a scene and normalize by the weight sum.

    ``preds``/``weights`` are ``[N, t, t]``; origins index the padded scene of
    ``out_shape``. The weight-sum divide uses the reference guard
    ``maximum(w, 1e-6)`` with zero output where no tile contributed
    (reference: ``floodsr/models/ResUNet_16x_DEM.py:355-363``).
    """
    n, t, _ = preds.shape
    accum = jnp.zeros(out_shape, dtype=jnp.float32)
    wsum = jnp.zeros(out_shape, dtype=jnp.float32)

    def body(i, carry):
        acc, ws = carry
        pw = preds[i] * weights[i]
        start = (y0[i], x0[i])
        cur = jax.lax.dynamic_slice(acc, start, (t, t))
        acc = jax.lax.dynamic_update_slice(acc, cur + pw, start)
        curw = jax.lax.dynamic_slice(ws, start, (t, t))
        ws = jax.lax.dynamic_update_slice(ws, curw + weights[i], start)
        return acc, ws

    accum, wsum = jax.lax.fori_loop(0, n, body, (accum, wsum))
    out = jnp.where(wsum > 0, accum / jnp.maximum(wsum, 1e-6), 0.0)
    return out.astype(jnp.float32)
