"""Whole-scene fused executor: one jit region from padded scene to mosaic.

Motivation (measured on the axon-tunneled v5e): per-tile batching with host
round-trips spends ~16 s shipping 121 tile predictions back over a ~35 MB/s
device→host link and ~7 s re-uploading them for the mosaic, while the actual
forward compute is ~0.5 s. This executor keeps everything on device:

    H2D once (bucket-padded LR depth + HR DEM) →
      scan over tile chunks:
        gather tiles (dynamic_slice) → normalize (per-tile percentile) →
        ResUNet forward → invert to meters → feather-weight →
        accumulate into the scene mosaic (dynamic-slice adds)
      → weight-normalize → clip → optional uint16 quantize
    → D2H once (full bucket scene).

Scene-geometry bucketing: the executor is compiled per BUCKET shape (scene
extents rounded up to a quantum by the engine), not per raw scene shape —
crop, post-resample, and the low-depth mask run on host
(``EngineJAX.run_scene``), so one XLA executable serves every scene that
lands in the same bucket. Tile counts are padded to a chunk multiple with
zero-weight dummies.
"""

from __future__ import annotations

from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from floodsr_tpu.nn.resunet import ResUNetConfig, resunet_apply
from floodsr_tpu.ops.normalize import (
    invert_depth_log1p,
    normalize_dem_batch,
    normalize_dem_with_stats,
    scale_depth_log1p,
)
from floodsr_tpu.tiling.windows import build_feather_ramp


def _gather_tiles(scene: jnp.ndarray, y0: jnp.ndarray, x0: jnp.ndarray, tile: int):
    """Vmapped dynamic-slice gather of [C, tile, tile] from a 2-D scene."""

    def one(y, x):
        return jax.lax.dynamic_slice(scene, (y, x), (tile, tile))

    return jax.vmap(one)(y0, x0)


def _axis_feather_weights(
    tile: int, overlap: int, first: jnp.ndarray, last: jnp.ndarray
) -> jnp.ndarray:
    """Edge-flattened 1-D feather ramps for one chunk's tiles, ``[chunk, tile]``.

    Scene-edge tiles keep weight 1.0 over their outward overlap (edge
    flattening); membership arrives as per-tile boolean flags (dynamic
    inputs), so the compiled executor is independent of the scene's
    tile-grid dimensions — a requirement for scene-geometry bucketing.
    """
    ramp = jnp.asarray(build_feather_ramp(tile, overlap))
    w = jnp.broadcast_to(ramp, (first.shape[0], tile))
    if overlap > 0:
        pos = jnp.arange(tile)
        w = jnp.where(first[:, None] & (pos < overlap)[None, :], 1.0, w)
        w = jnp.where(last[:, None] & (pos >= tile - overlap)[None, :], 1.0, w)
    return w


def _feather_weights_chunk(
    tile: int,
    overlap: int,
    y_first: jnp.ndarray,
    y_last: jnp.ndarray,
    x_first: jnp.ndarray,
    x_last: jnp.ndarray,
    valid: jnp.ndarray,
) -> jnp.ndarray:
    """Edge-flattened separable feather weights for one tile chunk."""
    wy = _axis_feather_weights(tile, overlap, y_first, y_last)
    wx = _axis_feather_weights(tile, overlap, x_first, x_last)
    w = wy[:, :, None] * wx[:, None, :]
    return (w * valid[:, None, None]).astype(jnp.float32)


#: Measured per-tile forward cost vs tail-chunk width (ms/tile on v5e,
#: mersch-shaped scene, f32/HIGH two-phase executor — round-3 chunk sweep,
#: docs/perf/structure_study.json). Wider steps amortize per-step overhead;
#: the curve is what :func:`choose_scene_chunk` trades against dummy-tile
#: padding.
_CHUNK_COST_MS_PER_TILE = {8: 0.894, 16: 0.839, 32: 0.766, 64: 0.728, 128: 0.674}


def choose_scene_chunk(grid_n: int, max_chunk: int = 128, tile_hr: int = 512) -> int:
    """Tail-chunk width minimizing ``capacity × per-tile cost``.

    ``capacity = ceil(grid_n / chunk) · chunk`` pads the tile budget with
    computed dummies, so a wide chunk on a small grid can cost more than it
    saves (an 81-tile grid at chunk 128 computes 47 dummies — 58% waste).
    Ties prefer the wider chunk.

    The measured cost curve is for 512²-HR tiles; with a LARGER inference
    window (tile-size override) each candidate chunk width shrinks by the
    area ratio so a scan step covers roughly the same output area (and the
    same activation footprint). Tiles at or below 512 keep the table as-is
    (existing behavior; small-tile grids are small anyway).
    """
    grid_n = max(1, int(grid_n))
    max_chunk = max(1, int(max_chunk))
    area_ratio = max(1.0, (int(tile_hr) / 512.0) ** 2)
    best = None
    for c, wt in _CHUNK_COST_MS_PER_TILE.items():
        # The caller's cap is a hard budget (peak tail activations scale
        # with chunk width) — clamp EVERY candidate, including the first
        # table entry, instead of admitting 8 when e.g. max_chunk=4.
        cw = max(1, min(int(round(c / area_ratio)), max_chunk))
        cap = -(-grid_n // cw) * cw
        cost = cap * wt * area_ratio
        if best is None or cost < best[0] - 1e-9 or (
            abs(cost - best[0]) < 1e-9 and cw > best[1]
        ):
            best = (cost, cw)
    return best[1]


def select_mosaic_mode(overlap_hr: int) -> str:
    """Mosaic accumulator formulation for ``overlap_hr`` (env-overridable).

    Part of the executor's compile identity: callers that cache compiled
    scene functions (``EngineJAX._jit_cache``, the AOT executable cache)
    must include this in their cache key, since
    ``FLOODSR_SCENE_GENERAL_MOSAIC`` is read at trace time.
    """
    import os

    if os.environ.get("FLOODSR_SCENE_GENERAL_MOSAIC"):
        return "general"
    return "hard" if int(overlap_hr) == 0 else "separable"


def validate_hard_grid(grid: dict[str, np.ndarray | int], tile: int) -> None:
    """Require a disjoint tile grid (the ``hard`` mosaic's invariant).

    The hard fast path skips the weight-sum normalization because disjoint
    full-weight tiles always sum to weight 1.0 under covered pixels. A grid
    with a clamped trailing start (content not a stride multiple) overlaps
    its last two tiles, which would silently DOUBLE depths in the seam band
    — callers must pad content to tile multiples first (``run_scene`` does).
    """
    for axis in ("y0", "x0"):
        starts = np.unique(np.asarray(grid[axis], np.int64))
        if starts.size > 1 and np.min(np.diff(starts)) < tile:
            raise ValueError(
                f"hard (overlap-0) mosaic requires disjoint tiles; {axis} "
                f"starts {starts.tolist()} overlap at tile={tile}. Pad the "
                f"content extent to a tile multiple before building the grid."
            )


def resolve_chunk(chunk: int, mesh=None, batch_axis: str = "dp") -> int:
    """The executor's actual per-step tile chunk (mesh-divisible when sharded)."""
    chunk = int(chunk)
    if mesh is not None:
        dp = int(mesh.shape[batch_axis])
        chunk = max(chunk, dp)
        chunk = -(-chunk // dp) * dp
    return chunk


def pack_scene_indices(
    grid: dict[str, np.ndarray | int], capacity: int, chunk: int
) -> dict[str, np.ndarray]:
    """Chunked per-tile index/flag arrays for a scene's content grid.

    ``capacity`` is the executor's static tile budget (the bucket's grid
    size, chunk-rounded); the content grid is padded up to it with
    zero-weight dummies so one executable serves every grid that fits.
    """
    n = len(grid["y0"])
    assert capacity % chunk == 0, (capacity, chunk)
    assert n <= capacity, f"grid has {n} tiles; executor capacity is {capacity}"
    ny, nx = int(grid["ny"]), int(grid["nx"])
    yi = np.asarray(grid["yi"], np.int64)
    xi = np.asarray(grid["xi"], np.int64)

    def pad_i32(a):
        return np.concatenate(
            [np.asarray(a, np.int32), np.zeros(capacity - n, np.int32)]
        ).reshape(-1, chunk)

    def pad_flag(a):
        return np.concatenate(
            [np.asarray(a, bool), np.zeros(capacity - n, bool)]
        ).reshape(-1, chunk)

    return {
        "y0": pad_i32(grid["y0"]),
        "x0": pad_i32(grid["x0"]),
        "yf": pad_flag(yi == 0),
        "yl": pad_flag(yi == ny - 1),
        "xf": pad_flag(xi == 0),
        "xl": pad_flag(xi == nx - 1),
        "valid": np.concatenate(
            [np.ones(n, np.float32), np.zeros(capacity - n, np.float32)]
        ).reshape(-1, chunk),
    }


def build_scene_executor(
    cfg: ResUNetConfig,
    *,
    scene_shape: tuple[int, int],
    capacity: int,
    overlap_hr: int,
    chunk: int,
    max_depth: float,
    dem_pct_clip: float,
    compute_dtype=jnp.float32,
    forward_fn=None,
    transfer_dtype: str = "float32",
    mesh=None,
    batch_axis: str = "dp",
    split_forward=None,
    trunk_chunk: int = 32,
):
    """Build ``(jitted_fn, chunk_size)`` for one scene bucket.

    ``jitted_fn(params, state, depth_pad, dem_pad, idx)`` takes inputs
    ALREADY padded to the bucket (`scene_shape` HR / `scene_shape/scale` LR)
    plus the per-scene tile index arrays from :func:`pack_scene_indices`
    (``capacity`` tiles in chunks of ``chunk``), and returns
    ``(scene_out, stats)``: the full bucket-shaped meter-domain mosaic
    (clipped to [0, max_depth], uint16-quantized when configured) and
    per-tile DEM normalization stats ``[capacity, 3]``.

    ``split_forward``: optional ``(trunk_fn, tail_fn)`` pair (the halves of
    :func:`floodsr_tpu.nn.resunet.resunet_apply`). When given (and no mesh),
    the executor runs TWO scans: the trunk over ``trunk_chunk``-tile batches
    (its tiny spatial dims leave the MXU latency-bound at tail-sized chunks
    — measured ~1 TF/s effective at chunk 8), then the HR tail + mosaic at
    ``chunk``. The LR-resolution feature buffer between phases is
    ``capacity × lr_tile² × base_filters`` (~17 MB for the flagship bucket).
    Per-tile DEM stats computed in phase 1 are REUSED in phase 2
    (``normalize_dem_with_stats`` is bitwise-identical to the fused
    ``normalize_dem_batch`` given the same stats).

    With a ``mesh``, each scan step's tile chunk is sharded over ``batch_axis``
    (data-parallel forward over ICI); scene buffers and inputs stay replicated
    and the partitioner inserts the gathers feeding the mosaic accumulation.
    The sharded path keeps the single-scan formulation (ADR-0006).
    """
    tile = cfg.hr_tile
    lr_tile = cfg.lr_tile
    scale = cfg.scale
    chunk = resolve_chunk(chunk, mesh, batch_axis)
    assert capacity % chunk == 0, (capacity, chunk)
    two_phase = split_forward is not None and mesh is None
    if two_phase:
        trunk_chunk = max(1, min(int(trunk_chunk), capacity))
        while capacity % trunk_chunk:
            trunk_chunk -= 1

    # Mosaic accumulator formulation (fastest applicable wins; A/B in
    # docs/perf/structure_study.json "hard_mosaic"/"separable_mosaic"):
    #
    # - ``hard`` (overlap 0): every weight is exactly ``1.0 * valid`` and
    #   tiles never overlap, so the weight-sum under any covered pixel is
    #   exactly 1.0 — ``accum / wsum`` is bitwise ``accum``. Skip the second
    #   accumulator entirely (tests/test_scene_hard.py pins bitwise equality).
    # - ``separable`` (feathered): the content grid is a full cross product
    #   of row-starts × col-starts and each tile's weight is a separable
    #   outer product ``wy_i ⊗ wx_j``, so the scene weight-sum factors:
    #   ``wsum(y,x) = (Σ_i wy_i(y)) · (Σ_j wx_j(x))``. Accumulate two 1-D
    #   profiles (fed once per grid row/col by the x-first/y-first tiles)
    #   instead of a second scene-sized buffer — this halves the mosaic's
    #   dynamic-slice HBM traffic. Equal to the general form up to f32
    #   summation order (~1e-7 relative; pipeline gates are at 1e-3 m).
    # - ``general``: the direct 2-D weight-sum accumulation.
    #   FLOODSR_SCENE_GENERAL_MOSAIC=1 forces it (A/B studies + the
    #   equality tests rely on the override).
    #
    # The hard path additionally requires a DISJOINT tile grid — callers
    # validate their content grids with :func:`validate_hard_grid`.
    mosaic_mode = select_mosaic_mode(overlap_hr)

    def _mosaic_accumulate(carry, chunk_idx, pred_m):
        y0c = chunk_idx["y0"]
        x0c = chunk_idx["x0"]
        valid = chunk_idx["valid"]
        if mosaic_mode == "hard":
            pw = pred_m * valid[:, None, None]

            def body_hard(i, acc):
                start = (y0c[i], x0c[i])
                cur = jax.lax.dynamic_slice(acc, start, (tile, tile))
                return jax.lax.dynamic_update_slice(acc, cur + pw[i], start)

            return jax.lax.fori_loop(0, chunk, body_hard, carry)

        weights = _feather_weights_chunk(
            tile, overlap_hr,
            chunk_idx["yf"], chunk_idx["yl"],
            chunk_idx["xf"], chunk_idx["xl"],
            valid,
        )
        pw = pred_m * weights

        if mosaic_mode == "separable":
            wy = _axis_feather_weights(
                tile, overlap_hr, chunk_idx["yf"], chunk_idx["yl"]
            )
            wx = _axis_feather_weights(
                tile, overlap_hr, chunk_idx["xf"], chunk_idx["xl"]
            )
            # One representative tile per grid row (x-first) / col (y-first)
            # feeds the 1-D profiles; dummies have all flags False.
            row_contrib = wy * (valid * chunk_idx["xf"])[:, None]
            col_contrib = wx * (valid * chunk_idx["yf"])[:, None]

            def body_sep(i, acc_py_px):
                acc, py, px = acc_py_px
                start = (y0c[i], x0c[i])
                cur = jax.lax.dynamic_slice(acc, start, (tile, tile))
                acc = jax.lax.dynamic_update_slice(acc, cur + pw[i], start)
                cy = jax.lax.dynamic_slice(py, (y0c[i],), (tile,))
                py = jax.lax.dynamic_update_slice(py, cy + row_contrib[i], (y0c[i],))
                cx = jax.lax.dynamic_slice(px, (x0c[i],), (tile,))
                px = jax.lax.dynamic_update_slice(px, cx + col_contrib[i], (x0c[i],))
                return acc, py, px

            return jax.lax.fori_loop(0, chunk, body_sep, carry)

        def body(i, acc_ws):
            acc, ws = acc_ws
            start = (y0c[i], x0c[i])
            cur = jax.lax.dynamic_slice(acc, start, (tile, tile))
            acc = jax.lax.dynamic_update_slice(acc, cur + pw[i], start)
            curw = jax.lax.dynamic_slice(ws, start, (tile, tile))
            ws = jax.lax.dynamic_update_slice(ws, curw + weights[i], start)
            return acc, ws

        return jax.lax.fori_loop(0, chunk, body, carry)

    def _mosaic_init():
        accum = jnp.zeros(scene_shape, jnp.float32)
        if mosaic_mode == "hard":
            return accum
        if mosaic_mode == "separable":
            return (
                accum,
                jnp.zeros(scene_shape[0], jnp.float32),
                jnp.zeros(scene_shape[1], jnp.float32),
            )
        return accum, jnp.zeros(scene_shape, jnp.float32)

    def _finish(carry, stats_flat):
        if mosaic_mode == "hard":
            scene = carry
        elif mosaic_mode == "separable":
            accum, wy_sum, wx_sum = carry
            wsum = wy_sum[:, None] * wx_sum[None, :]
            scene = jnp.where(wsum > 0, accum / jnp.maximum(wsum, 1e-6), 0.0)
        else:
            accum, wsum = carry
            scene = jnp.where(wsum > 0, accum / jnp.maximum(wsum, 1e-6), 0.0)
        out = jnp.clip(scene, 0.0, max_depth)
        if transfer_dtype == "uint16":
            # Fixed-point transfer encoding: halves device→host bytes on
            # tunnel-limited hosts; quantization step max_depth/65535
            # (~7.6e-5 m at the default 5 m) is two orders below the 1e-3 m
            # parity gate. The host dequantizes, then crops/post-resamples/
            # masks.
            out = jnp.round(out * (65535.0 / max_depth)).astype(jnp.uint16)
            return out, stats_flat
        return out.astype(jnp.float32), stats_flat

    def scene_fn_two_phase(params, state, depth_pad, dem_pad, idx):
        assert dem_pad.shape == tuple(scene_shape), (
            f"DEM must be bucket-padded to {scene_shape}; got {dem_pad.shape}"
        )
        trunk_fn, tail_fn = split_forward
        # Phase 1 — trunk over wide batches: gather + normalize + encoder/
        # decoder; stack LR features and per-tile stats for phase 2.
        t_idx = {
            k: idx[k].reshape(-1, trunk_chunk) for k in ("y0", "x0")
        }

        def trunk_step(_, ti):
            depth_tiles = _gather_tiles(
                depth_pad, ti["y0"] // scale, ti["x0"] // scale, lr_tile
            )
            dem_tiles = _gather_tiles(dem_pad, ti["y0"], ti["x0"], tile)
            depth_norm = scale_depth_log1p(depth_tiles, max_depth)
            dem_norm, stats = normalize_dem_batch(dem_tiles, dem_pct_clip)
            feat = trunk_fn(
                params, state, depth_norm[..., None], dem_norm[..., None]
            )
            stats_arr = jnp.stack(
                [stats["p_clip"], stats["dem_min"], stats["dem_max"]], axis=-1
            )
            return None, (feat, stats_arr)

        _, (feats, stats) = jax.lax.scan(trunk_step, None, t_idx)
        feats = feats.reshape(capacity, *feats.shape[2:])
        stats_flat = stats.reshape(capacity, 3)

        # Phase 2 — HR tail + mosaic at the tail chunk, reusing phase-1 stats.
        feat_chunks = feats.reshape(-1, chunk, *feats.shape[1:])
        stat_chunks = stats_flat.reshape(-1, chunk, 3)

        def tail_step(carry, inp):
            chunk_idx, feat_c, st = inp
            dem_tiles = _gather_tiles(
                dem_pad, chunk_idx["y0"], chunk_idx["x0"], tile
            )
            dem_norm = normalize_dem_with_stats(
                dem_tiles, st[:, 0], st[:, 1], st[:, 2]
            )
            pred_norm = tail_fn(params, state, feat_c, dem_norm[..., None])
            pred_m = invert_depth_log1p(pred_norm[..., 0], max_depth)
            return _mosaic_accumulate(carry, chunk_idx, pred_m), None

        carry, _ = jax.lax.scan(
            tail_step, _mosaic_init(), (idx, feat_chunks, stat_chunks)
        )
        return _finish(carry, stats_flat)

    def scene_fn(params, state, depth_pad, dem_pad, idx):
        assert dem_pad.shape == tuple(scene_shape), (
            f"DEM must be bucket-padded to {scene_shape}; got {dem_pad.shape}"
        )

        def chunk_step(carry, chunk_idx):
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
            carry = _mosaic_accumulate(carry, chunk_idx, pred_m)
            stats_arr = jnp.stack(
                [stats["p_clip"], stats["dem_min"], stats["dem_max"]], axis=-1
            )
            return carry, stats_arr

        carry, stats = jax.lax.scan(chunk_step, _mosaic_init(), idx)
        return _finish(carry, stats.reshape(-1, 3))

    if two_phase:
        scene_fn = scene_fn_two_phase

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        repl = NamedSharding(mesh, PartitionSpec())
        chunk_sharded = NamedSharding(mesh, PartitionSpec(None, batch_axis))
        idx_keys = ("y0", "x0", "yf", "yl", "xf", "xl", "valid")
        idx_shardings: dict[str, Any] = {k: chunk_sharded for k in idx_keys}
        fn = jax.jit(
            scene_fn,
            in_shardings=(repl, repl, repl, repl, idx_shardings),
            out_shardings=(repl, repl),
        )
    else:
        fn = jax.jit(scene_fn)
    return fn, chunk
