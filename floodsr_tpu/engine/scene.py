"""Whole-scene fused executor: one jit region from padded scene to mosaic.

Motivation (measured on the axon-tunneled v5e): per-tile batching with host
round-trips spends ~16 s shipping 121 tile predictions back over a ~35 MB/s
device→host link and ~7 s re-uploading them for the mosaic, while the actual
forward compute is ~0.5 s. This executor keeps everything on device:

    H2D once (padded LR depth ~KBs + padded HR DEM) →
      scan over tile chunks:
        gather tiles (dynamic_slice) → normalize (per-tile percentile) →
        ResUNet forward → invert to meters → feather-weight →
        accumulate into the scene mosaic (dynamic-slice adds)
      → weight-normalize → crop → clip → optional device post-resample →
        low-depth mask
    → D2H once (final scene only).

One XLA executable per scene geometry (tile grid + shapes static); the tile
count is padded to a multiple of the chunk size with zero-weight dummies.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from floodsr_tpu.io.affine import Affine
from floodsr_tpu.nn.resunet import ResUNetConfig, resunet_apply
from floodsr_tpu.ops.normalize import (
    invert_depth_log1p,
    normalize_dem_batch,
    scale_depth_log1p,
)
from floodsr_tpu.ops.resample import reproject_bilinear_jax
from floodsr_tpu.tiling.windows import build_feather_ramp


def _gather_tiles(scene: jnp.ndarray, y0: jnp.ndarray, x0: jnp.ndarray, tile: int):
    """Vmapped dynamic-slice gather of [C, tile, tile] from a 2-D scene."""

    def one(y, x):
        return jax.lax.dynamic_slice(scene, (y, x), (tile, tile))

    return jax.vmap(one)(y0, x0)


def _feather_weights_chunk(
    tile: int,
    overlap: int,
    yi: jnp.ndarray,
    xi: jnp.ndarray,
    ny: int,
    nx: int,
    valid: jnp.ndarray,
) -> jnp.ndarray:
    """Edge-flattened separable feather weights for one tile chunk."""
    ramp = jnp.asarray(build_feather_ramp(tile, overlap))
    pos = jnp.arange(tile)
    in_head = pos < overlap
    in_tail = pos >= tile - overlap

    def axis_w(idx, n):
        w = jnp.broadcast_to(ramp, (idx.shape[0], tile))
        if overlap > 0:
            w = jnp.where((idx == 0)[:, None] & in_head[None, :], 1.0, w)
            w = jnp.where((idx == n - 1)[:, None] & in_tail[None, :], 1.0, w)
        return w

    wy = axis_w(yi, ny)
    wx = axis_w(xi, nx)
    w = wy[:, :, None] * wx[:, None, :]
    return (w * valid[:, None, None]).astype(jnp.float32)


def build_scene_executor(
    cfg: ResUNetConfig,
    *,
    scene_shape: tuple[int, int],
    grid: dict[str, np.ndarray | int],
    overlap_hr: int,
    chunk: int,
    max_depth: float,
    dem_pct_clip: float,
    crop_shape: tuple[int, int],
    post_resample: tuple[tuple[int, int], Affine, Affine] | None = None,
    low_depth_mask_m: float = 1e-3,
    compute_dtype=jnp.float32,
    forward_fn=None,
    transfer_dtype: str = "float32",
    mesh=None,
    batch_axis: str = "dp",
):
    """Build ``(jitted_fn, padded_index_arrays)`` for one scene geometry.

    ``jitted_fn(params, state, depth_pad, dem_pad)`` returns
    ``(scene_out, stats)`` where ``scene_out`` is the finished meter-domain
    scene (post-resampled + masked when configured) and ``stats`` are per-tile
    DEM normalization stats ``[N_pad, 3]``.

    With a ``mesh``, each scan step's tile chunk is sharded over ``batch_axis``
    (data-parallel forward over ICI); scene buffers and inputs stay replicated
    and the partitioner inserts the gathers feeding the mosaic accumulation.
    """
    tile = cfg.hr_tile
    lr_tile = cfg.lr_tile
    scale = cfg.scale
    n = len(grid["y0"])
    if mesh is not None:
        # Chunks must split evenly across the data-parallel axis.
        dp = int(mesh.shape[batch_axis])
        chunk = max(chunk, dp)
        chunk = -(-chunk // dp) * dp
    n_pad = -(-n // chunk) * chunk
    ny, nx = int(grid["ny"]), int(grid["nx"])

    def pad_idx(a, fill=0):
        return np.concatenate([np.asarray(a, np.int32), np.full(n_pad - n, fill, np.int32)])

    idx = {
        "chunks": {
            "y0": pad_idx(grid["y0"]).reshape(-1, chunk),
            "x0": pad_idx(grid["x0"]).reshape(-1, chunk),
            "yi": pad_idx(grid["yi"]).reshape(-1, chunk),
            "xi": pad_idx(grid["xi"]).reshape(-1, chunk),
            "valid": np.concatenate(
                [np.ones(n, np.float32), np.zeros(n_pad - n, np.float32)]
            ).reshape(-1, chunk),
        }
    }

    # Rectilinear post-resample factorizes into two MXU matmuls (a TPU
    # element-wise gather over a scene-sized grid costs ~seconds); the
    # interpolation matrices ride along with the index arrays.
    post_separable = False
    if post_resample is not None:
        from floodsr_tpu.ops.resample import separable_resample_matrices

        dst_shape, src_t, dst_t = post_resample
        if src_t.is_rectilinear() and dst_t.is_rectilinear():
            ry, rx = separable_resample_matrices(crop_shape, src_t, dst_shape, dst_t)
            idx["post_ry"] = ry
            idx["post_rx"] = rx
            post_separable = True

    def scene_fn(params, state, depth_raw, dem_raw, idx):
        # Pad to the tile grid on device (static pad widths).
        dem_pad = jnp.pad(
            dem_raw,
            ((0, scene_shape[0] - dem_raw.shape[0]), (0, scene_shape[1] - dem_raw.shape[1])),
        )
        lr_shape = (scene_shape[0] // scale, scene_shape[1] // scale)
        depth_pad = jnp.pad(
            depth_raw,
            ((0, lr_shape[0] - depth_raw.shape[0]), (0, lr_shape[1] - depth_raw.shape[1])),
        )

        def chunk_step(carry, chunk_idx):
            accum, wsum = carry
            y0c = chunk_idx["y0"]
            x0c = chunk_idx["x0"]
            depth_tiles = _gather_tiles(depth_pad, y0c // scale, x0c // scale, lr_tile)
            dem_tiles = _gather_tiles(dem_pad, y0c, x0c, tile)

            depth_norm = scale_depth_log1p(depth_tiles, max_depth)
            dem_norm, stats = normalize_dem_batch(dem_tiles, dem_pct_clip)
            if forward_fn is not None:
                pred_norm = forward_fn(
                    params, state, depth_norm[..., None], dem_norm[..., None],
                    compute_dtype,
                )
            else:
                pred_norm, _ = resunet_apply(
                    params,
                    state,
                    depth_norm[..., None],
                    dem_norm[..., None],
                    cfg,
                    train=False,
                    compute_dtype=compute_dtype,
                )
            pred_m = invert_depth_log1p(pred_norm[..., 0], max_depth)

            weights = _feather_weights_chunk(
                tile, overlap_hr, chunk_idx["yi"], chunk_idx["xi"], ny, nx,
                chunk_idx["valid"],
            )
            pw = pred_m * weights

            def body(i, acc_ws):
                acc, ws = acc_ws
                start = (y0c[i], x0c[i])
                cur = jax.lax.dynamic_slice(acc, start, (tile, tile))
                acc = jax.lax.dynamic_update_slice(acc, cur + pw[i], start)
                curw = jax.lax.dynamic_slice(ws, start, (tile, tile))
                ws = jax.lax.dynamic_update_slice(ws, curw + weights[i], start)
                return acc, ws

            accum, wsum = jax.lax.fori_loop(0, chunk, body, (accum, wsum))
            stats_arr = jnp.stack(
                [stats["p_clip"], stats["dem_min"], stats["dem_max"]], axis=-1
            )
            return (accum, wsum), stats_arr

        init = (
            jnp.zeros(scene_shape, jnp.float32),
            jnp.zeros(scene_shape, jnp.float32),
        )
        (accum, wsum), stats = jax.lax.scan(chunk_step, init, idx["chunks"])
        scene = jnp.where(wsum > 0, accum / jnp.maximum(wsum, 1e-6), 0.0)

        out = jnp.clip(scene[: crop_shape[0], : crop_shape[1]], 0.0, max_depth)
        if post_resample is not None:
            dst_shape, src_transform, dst_transform = post_resample
            if post_separable:
                # HIGHEST precision: the TPU default multiplies in bf16, which
                # costs ~1e-2 m on meter-domain depths.
                out = jnp.dot(
                    idx["post_ry"], out,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                out = jnp.dot(
                    out, idx["post_rx"].T,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
            else:
                out = reproject_bilinear_jax(out, src_transform, dst_shape, dst_transform)
            out = jnp.clip(out, 0.0, max_depth)
        out = jnp.where(out < low_depth_mask_m, 0.0, out)
        if transfer_dtype == "uint16":
            # Fixed-point transfer encoding: halves device→host bytes on
            # tunnel-limited hosts; quantization step max_depth/65535
            # (~7.6e-5 m at the default 5 m) is two orders below the 1e-3 m
            # parity gate. The host dequantizes and re-applies the mask.
            out = jnp.round(out * (65535.0 / max_depth)).astype(jnp.uint16)
            return out, stats.reshape(-1, 3)
        return out.astype(jnp.float32), stats.reshape(-1, 3)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        repl = NamedSharding(mesh, PartitionSpec())
        chunk_sharded = NamedSharding(mesh, PartitionSpec(None, batch_axis))
        idx_shardings: dict[str, Any] = {
            "chunks": {k: chunk_sharded for k in idx["chunks"]}
        }
        if "post_ry" in idx:
            idx_shardings["post_ry"] = repl
            idx_shardings["post_rx"] = repl
        fn = jax.jit(
            scene_fn,
            in_shardings=(repl, repl, repl, repl, idx_shardings),
            out_shardings=(repl, repl),
        )
    else:
        fn = jax.jit(scene_fn)
    return fn, idx
