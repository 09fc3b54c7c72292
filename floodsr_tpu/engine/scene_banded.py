"""Banded (row-sharded) scene executor: large scenes beyond one chip's HBM.

ADR-0006's default sharded formulation replicates the scene accumulator and
weight sum on every device — right for scenes that fit, but a country-scale
mosaic (e.g. 32k² f32 ≈ 4 GB × two accumulators × every input) cannot be
replicated. This variant shards the SCENE by row bands over the ``dp`` axis
(SURVEY §2's "optional spatial sharding of one tile batch"):

- the host pre-slices depth/DEM into per-band inputs with a one-tile bottom
  halo (a tile whose origin lies in band *d* extends at most ``tile-1`` rows
  past the band edge), stacked ``[dp, band+tile, W]``;
- each device runs the normalize→forward→feather→accumulate pipeline for
  ONLY its own band's tiles into a local ``[band+tile, W]`` accumulator pair
  (per-band tile lists are dummy-padded to a common count so the program is
  SPMD);
- one ``ppermute`` per buffer sends the bottom-halo rows to the next band,
  which adds them into its top rows — the only cross-device communication
  (``tile × W × 4 B`` per seam, vs. the replicated variant's per-chunk
  all-gather of predictions);
- weight-normalize/clip/quantize run band-locally; the caller reassembles
  ``[dp, band, W]`` bands.

Built on ``shard_map`` so the communication pattern is explicit and
auditable. Numerics are identical to the unsharded executor (same gather,
normalization, forward, feather math); dp=1 ≡ dp=N equality is pinned in
``tests/test_scene_banded.py``.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from floodsr_tpu.engine.scene import _feather_weights_chunk, _gather_tiles
from floodsr_tpu.nn.resunet import ResUNetConfig, resunet_apply
from floodsr_tpu.ops.normalize import (
    invert_depth_log1p,
    normalize_dem_batch,
    scale_depth_log1p,
)

try:  # jax>=0.4.30 moved shard_map out of experimental
    from jax.sharding import shard_map  # type: ignore[attr-defined]
except ImportError:  # pragma: no cover - version-dependent import
    from jax.experimental.shard_map import shard_map


def band_plan(
    scene_shape: tuple[int, int], n_bands: int, tile: int
) -> dict[str, int]:
    """Row-band geometry; raises when the bucket cannot band evenly."""
    h, w = int(scene_shape[0]), int(scene_shape[1])
    assert h % n_bands == 0, (
        f"bucket height {h} must divide into {n_bands} bands "
        f"(pick a bucket quantum divisible by dp)"
    )
    band = h // n_bands
    if not (band % tile == 0 or band >= tile):
        raise ValueError(f"band height {band} must be at least one tile ({tile})")
    return {"band": band, "halo": tile, "width": w, "n_bands": n_bands}


def pack_banded_scene(
    depth_pad: np.ndarray,
    dem_pad: np.ndarray,
    grid: dict[str, np.ndarray | int],
    *,
    n_bands: int,
    tile: int,
    scale: int,
    chunk: int,
    cap: "int | None" = None,
) -> dict[str, np.ndarray]:
    """Host-side banding: overlapping input bands + per-band tile indices.

    Returns arrays stacked on a leading ``dp`` axis:
    ``depth [dp, (band+halo)/scale, W/scale]``, ``dem [dp, band+halo, W]``,
    and chunked per-band index arrays ``[dp, n_chunks, chunk]`` with tile
    origins RELATIVE to the band start. Bands own tiles by origin row; every
    band is dummy-padded to the same chunk-rounded tile count.
    """
    h, w = dem_pad.shape
    plan = band_plan((h, w), n_bands, tile)
    band, halo = plan["band"], plan["halo"]
    if band % scale != 0:
        # Not an assert: under python -O a stripped assert would re-enable
        # exactly the silent LR-band misalignment this guards against.
        raise ValueError(
            f"band height {band} must be a multiple of scale {scale}: band-"
            f"relative tile origins are divided by scale to index the LR band, "
            f"which silently misaligns otherwise"
        )

    dem_bands = np.zeros((n_bands, band + halo, w), np.float32)
    lr_band = (band + halo) // scale
    depth_bands = np.zeros((n_bands, lr_band, w // scale), np.float32)
    for d in range(n_bands):
        lo = d * band
        hi = min(h, lo + band + halo)
        dem_bands[d, : hi - lo] = dem_pad[lo:hi]
        lr_lo, lr_hi = lo // scale, hi // scale
        depth_bands[d, : lr_hi - lr_lo] = depth_pad[lr_lo:lr_hi]

    y0 = np.asarray(grid["y0"], np.int64)
    x0 = np.asarray(grid["x0"], np.int64)
    yi = np.asarray(grid["yi"], np.int64)
    xi = np.asarray(grid["xi"], np.int64)
    ny, nx = int(grid["ny"]), int(grid["nx"])
    owner = np.minimum(y0 // band, n_bands - 1)

    counts = [(owner == d).sum() for d in range(n_bands)]
    needed = -(-max(1, int(max(counts))) // chunk) * chunk
    if cap is None:
        cap = needed
    else:
        # Caller-fixed capacity (the executor's bucket-level cap): every
        # content grid within a bucket packs to the SAME shapes so one
        # compiled executable serves them all — a per-scene cap would give
        # each distinct crop shape its own jit signature (minutes-long
        # recompiles warmup cannot cover).
        assert cap % chunk == 0 and cap >= needed, (
            f"cap={cap} cannot hold {needed} tiles (chunk={chunk})"
        )

    def field(default, dtype):
        return np.full((n_bands, cap), default, dtype)

    fy0 = field(0, np.int32)
    fx0 = field(0, np.int32)
    fyf = field(False, bool)
    fyl = field(False, bool)
    fxf = field(False, bool)
    fxl = field(False, bool)
    fvalid = field(0.0, np.float32)
    for d in range(n_bands):
        sel = np.nonzero(owner == d)[0]
        n = len(sel)
        fy0[d, :n] = (y0[sel] - d * band).astype(np.int32)  # band-relative
        fx0[d, :n] = x0[sel].astype(np.int32)
        fyf[d, :n] = yi[sel] == 0
        fyl[d, :n] = yi[sel] == ny - 1
        fxf[d, :n] = xi[sel] == 0
        fxl[d, :n] = xi[sel] == nx - 1
        fvalid[d, :n] = 1.0

    slot = np.full((n_bands, cap), -1, np.int64)
    for d in range(n_bands):
        sel = np.nonzero(owner == d)[0]
        slot[d, : len(sel)] = sel

    n_chunks = cap // chunk
    return {
        "depth": depth_bands,
        "dem": dem_bands,
        "y0": fy0.reshape(n_bands, n_chunks, chunk),
        "x0": fx0.reshape(n_bands, n_chunks, chunk),
        "yf": fyf.reshape(n_bands, n_chunks, chunk),
        "yl": fyl.reshape(n_bands, n_chunks, chunk),
        "xf": fxf.reshape(n_bands, n_chunks, chunk),
        "xl": fxl.reshape(n_bands, n_chunks, chunk),
        "valid": fvalid.reshape(n_bands, n_chunks, chunk),
        # host-only: grid index served by each band slot (-1 = dummy), for
        # reassembling per-tile stats into grid order.
        "grid_slot": slot,
    }


def build_banded_scene_executor(
    cfg: ResUNetConfig,
    *,
    scene_shape: tuple[int, int],
    overlap_hr: int,
    chunk: int,
    max_depth: float,
    dem_pct_clip: float,
    mesh: Mesh,
    batch_axis: str = "dp",
    compute_dtype=jnp.float32,
    forward_fn=None,
    transfer_dtype: str = "float32",
    transposed: bool = False,
):
    """Compile the banded executor for one bucket over ``mesh[batch_axis]``.

    Returns ``(fn, n_bands)``. ``fn(params, state, banded)`` takes the
    :func:`pack_banded_scene` dict (device-put with the matching shardings —
    see :func:`banded_in_shardings`) and returns ``(bands, stats)`` where
    ``bands`` is ``[dp, band, W]`` (caller concatenates) and ``stats`` is
    ``[dp, cap, 3]`` per-band tile stats (dummy slots zero).

    ``transposed=True`` is the COLUMN-banding mode for wide scenes (W >> H):
    the caller feeds the TRANSPOSED scene (and a grid built on it), so "row"
    bands shard the original scene's columns. Each gathered tile is a
    transposed view of an original tile; it is swapped back to the original
    orientation before the forward (convs are not transpose-equivariant) and
    the prediction swapped again before the scatter, so per-tile numerics are
    bit-identical to the unsharded executor and the caller's final
    transpose-back reproduces it exactly. The feather weights need no
    special-casing: the separable ramp construction is symmetric, so weights
    built from the transposed grid's edge flags ARE the transposed weights.
    """
    tile = cfg.hr_tile
    lr_tile = cfg.lr_tile
    scale = cfg.scale
    n_bands = int(mesh.shape[batch_axis])
    plan = band_plan(scene_shape, n_bands, tile)
    band, halo, width = plan["band"], plan["halo"], plan["width"]

    def band_fn(params, state, depth_b, dem_b, idx):
        # Inside shard_map: leading dp axis is local (size 1); drop it.
        depth_local = depth_b[0]
        dem_local = dem_b[0]
        idx_local = jax.tree.map(lambda a: a[0], idx)

        def chunk_step(carry, ci):
            accum, wsum = carry
            y0c, x0c = ci["y0"], ci["x0"]
            depth_tiles = _gather_tiles(
                depth_local, y0c // scale, x0c // scale, lr_tile
            )
            dem_tiles = _gather_tiles(dem_local, y0c, x0c, tile)
            if transposed:
                # Column-banding: the scene is transposed, so gathered tiles
                # are transposed views of the original tiles — restore the
                # original orientation for the forward.
                depth_tiles = jnp.swapaxes(depth_tiles, -2, -1)
                dem_tiles = jnp.swapaxes(dem_tiles, -2, -1)
            depth_norm = scale_depth_log1p(depth_tiles, max_depth)
            dem_norm, stats = normalize_dem_batch(dem_tiles, dem_pct_clip)
            if forward_fn is not None:
                pred_norm = forward_fn(
                    params, state, depth_norm[..., None], dem_norm[..., None],
                    compute_dtype,
                )
            else:
                pred_norm, _ = resunet_apply(
                    params, state, depth_norm[..., None], dem_norm[..., None],
                    cfg, train=False, compute_dtype=compute_dtype,
                )
            pred_m = invert_depth_log1p(pred_norm[..., 0], max_depth)
            if transposed:
                # Back to transposed-scene orientation for the scatter.
                pred_m = jnp.swapaxes(pred_m, -2, -1)
            weights = _feather_weights_chunk(
                tile, overlap_hr, ci["yf"], ci["yl"], ci["xf"], ci["xl"],
                ci["valid"],
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
            jnp.zeros((band + halo, width), jnp.float32),
            jnp.zeros((band + halo, width), jnp.float32),
        )
        (accum, wsum), stats = jax.lax.scan(chunk_step, init, idx_local)

        # Halo exchange: my bottom-halo rows belong to the NEXT band's top.
        perm = [(d, d + 1) for d in range(n_bands - 1)]

        def send_down(buf):
            halo_rows = buf[band:]
            received = jax.lax.ppermute(halo_rows, batch_axis, perm)
            return buf[:band].at[:halo].add(received)

        accum = send_down(accum)
        wsum = send_down(wsum)

        scene = jnp.where(wsum > 0, accum / jnp.maximum(wsum, 1e-6), 0.0)
        out = jnp.clip(scene, 0.0, max_depth)
        if transfer_dtype == "uint16":
            out = jnp.round(out * (65535.0 / max_depth)).astype(jnp.uint16)
        else:
            out = out.astype(jnp.float32)
        return out[None], stats.reshape(1, -1, 3)

    spec_b = P(batch_axis)
    idx_keys = ("y0", "x0", "yf", "yl", "xf", "xl", "valid")
    in_specs = (P(), P(), spec_b, spec_b, {k: spec_b for k in idx_keys})
    fn = jax.jit(
        shard_map(
            band_fn,
            mesh=mesh,
            in_specs=in_specs,
            out_specs=(spec_b, spec_b),
            check_rep=False,
        )
    )

    def run(params, state, banded):
        idx = {k: banded[k] for k in idx_keys}
        return fn(params, state, banded["depth"], banded["dem"], idx)

    return run, n_bands


def banded_in_shardings(mesh: Mesh, batch_axis: str = "dp"):
    """NamedShardings to device_put a :func:`pack_banded_scene` dict with."""
    band = NamedSharding(mesh, P(batch_axis))
    keys = ("depth", "dem", "y0", "x0", "yf", "yl", "xf", "xl", "valid")
    return {k: band for k in keys}
