"""Segment-level TPU profile of the fused scene pipeline (flagship config).

Times each stage of the production computation independently so optimization
effort lands where the milliseconds are:

- full scene executable (normalize + forward + invert + feather mosaic)
- forward-only scan (no mosaic accumulation)
- mosaic-only scan (no forward)
- standalone forward at several batch sizes, Pallas tail on/off
- standalone HR tail (Pallas vs XLA formulation)

Run on the TPU host: ``python bin/profile_scene.py [--chunk 8]``.
Results print as one JSON line per segment (stderr carries progress).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _force(out) -> float:
    # block_until_ready is not a reliable barrier on the axon tunnel
    # platform; a scalar readback is (same trick as bench.py).
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def best_of(fn, *args, reps: int = 3, iters: int = 8) -> float:
    """Best per-call wall time over ``reps`` trials of ``iters`` queued calls.

    The tunnel's scalar-readback round trip is ~25-30 ms — longer than many
    of the segments measured here — so each trial queues ``iters`` async
    dispatches and pays ONE readback at the end (1/iters of an RTT per call).
    """
    _force(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        _force(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--scene-hr", type=int, default=4096, help="bucket edge (HR px)")
    ap.add_argument("--content-hr", type=int, default=3840)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from floodsr_tpu.engine.scene import (
        build_scene_executor,
        pack_scene_indices,
    )
    from floodsr_tpu.nn import ResUNetConfig, init_resunet
    from floodsr_tpu.nn.resunet import resunet_apply
    from floodsr_tpu.tiling import build_window_grid

    print(f"backend: {jax.default_backend()} {jax.devices()}", file=sys.stderr)

    # Tunnel round-trip reference: scalar readback of a tiny resident array.
    tiny = jnp.zeros((8, 128), jnp.float32) + 1.0
    _force(tiny)
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _force(tiny + 1.0)
        rtts.append(time.perf_counter() - t0)
    print(json.dumps({"segment": "readback_rtt", "ms": round(min(rtts) * 1e3, 1)}))
    cfg = ResUNetConfig()
    params, state = init_resunet(0, cfg)
    params = jax.device_put(params)
    state = jax.device_put(state)

    tile, scale = cfg.hr_tile, cfg.scale
    chunk = args.chunk
    overlap = 8 * scale  # reference default lr_tile//4 in HR px
    stride = tile - overlap
    bucket = (args.scene_hr, args.scene_hr)
    grid_full = build_window_grid(bucket[0], bucket[1], tile, stride)
    capacity = -(-len(grid_full["y0"]) // chunk) * chunk
    grid = build_window_grid(args.content_hr, args.content_hr, tile, stride)
    n_tiles = len(grid["y0"])
    idx = jax.tree.map(jnp.asarray, pack_scene_indices(grid, capacity, chunk))

    rng = np.random.default_rng(0)
    dem = jnp.asarray(rng.normal(300, 20, bucket).astype(np.float32))
    depth = jnp.asarray(
        rng.uniform(0, 3, (bucket[0] // scale, bucket[1] // scale)).astype(np.float32)
    )
    out_mp = args.content_hr**2 / 1e6
    computed_mp = n_tiles * tile * tile / 1e6
    results = {}

    def report(name, dt, mp=None):
        results[name] = dt
        line = {"segment": name, "ms": round(dt * 1e3, 1)}
        if mp is not None:
            line["mp_per_s"] = round(mp / dt, 1)
        print(json.dumps(line))
        sys.stdout.flush()

    # -- full scene executable (production path, f32 + Pallas tail) --------
    for label, fwd_kwargs in [
        ("scene_full_default", {}),
        ("scene_full_pallas_tail", {"pallas_tail": True}),
    ]:
        def fwd(p, s, d, m, dtype, _kw=fwd_kwargs):
            out, _ = resunet_apply(
                p, s, d, m, cfg, train=False, compute_dtype=dtype, **_kw
            )
            return out

        fn, _ = build_scene_executor(
            cfg,
            scene_shape=bucket,
            capacity=capacity,
            overlap_hr=overlap,
            chunk=chunk,
            max_depth=5.0,
            dem_pct_clip=95.0,
            forward_fn=fwd,
            transfer_dtype="uint16",
        )
        print(f"# compiling {label}...", file=sys.stderr)
        dt = best_of(fn, params, state, depth, dem, idx, reps=args.reps)
        report(label, dt, out_mp)

    # -- forward-only scan (gather+normalize+forward+invert, no mosaic) ----
    from floodsr_tpu.engine.scene import _gather_tiles
    from floodsr_tpu.ops.normalize import (
        invert_depth_log1p,
        normalize_dem_batch,
        scale_depth_log1p,
    )

    def forward_only(p, s, depth_pad, dem_pad, idx):
        def step(acc, ci):
            dt_ = _gather_tiles(depth_pad, ci["y0"] // scale, ci["x0"] // scale, cfg.lr_tile)
            mt = _gather_tiles(dem_pad, ci["y0"], ci["x0"], tile)
            dn = scale_depth_log1p(dt_, 5.0)
            mn, _stats = normalize_dem_batch(mt, 95.0)
            pred, _ = resunet_apply(
                p, s, dn[..., None], mn[..., None], cfg, train=False,
                compute_dtype=jnp.float32,
            )
            pm = invert_depth_log1p(pred[..., 0], 5.0)
            return acc + jnp.sum(pm), None

        total, _ = jax.lax.scan(step, jnp.float32(0), idx)
        return total

    fn = jax.jit(forward_only)
    print("# compiling forward_only...", file=sys.stderr)
    dt = best_of(fn, params, state, depth, dem, idx, reps=args.reps)
    report("forward_only_scan", dt, out_mp)

    # -- normalize/stats-only scan -----------------------------------------
    def stats_only(depth_pad, dem_pad, idx):
        def step(acc, ci):
            dt_ = _gather_tiles(depth_pad, ci["y0"] // scale, ci["x0"] // scale, cfg.lr_tile)
            mt = _gather_tiles(dem_pad, ci["y0"], ci["x0"], tile)
            dn = scale_depth_log1p(dt_, 5.0)
            mn, _stats = normalize_dem_batch(mt, 95.0)
            return acc + jnp.sum(dn) + jnp.sum(mn), None

        total, _ = jax.lax.scan(step, jnp.float32(0), idx)
        return total

    fn = jax.jit(stats_only)
    print("# compiling stats_only...", file=sys.stderr)
    dt = best_of(fn, depth, dem, idx, reps=args.reps)
    report("gather_normalize_scan", dt)

    # -- mosaic-only scan ---------------------------------------------------
    from floodsr_tpu.engine.scene import _feather_weights_chunk

    def mosaic_only(dem_pad, idx):
        def step(carry, ci):
            accum, wsum = carry
            pred = _gather_tiles(dem_pad, ci["y0"], ci["x0"], tile)  # stand-in
            w = _feather_weights_chunk(
                tile, overlap, ci["yf"], ci["yl"], ci["xf"], ci["xl"], ci["valid"]
            )
            pw = pred * w

            def body(i, acc_ws):
                acc, ws = acc_ws
                start = (ci["y0"][i], ci["x0"][i])
                cur = jax.lax.dynamic_slice(acc, start, (tile, tile))
                acc = jax.lax.dynamic_update_slice(acc, cur + pw[i], start)
                curw = jax.lax.dynamic_slice(ws, start, (tile, tile))
                ws = jax.lax.dynamic_update_slice(ws, curw + w[i], start)
                return acc, ws

            return jax.lax.fori_loop(0, chunk, body, (accum, wsum)), None

        init = (jnp.zeros(bucket, jnp.float32), jnp.zeros(bucket, jnp.float32))
        (accum, wsum), _ = jax.lax.scan(step, init, idx)
        return jnp.sum(accum) + jnp.sum(wsum)

    fn = jax.jit(mosaic_only)
    print("# compiling mosaic_only...", file=sys.stderr)
    dt = best_of(fn, dem, idx, reps=args.reps)
    report("mosaic_only_scan", dt)

    # -- standalone forward, batch sweep, Pallas on/off ---------------------
    for batch in (4, 8, 16):
        d = jnp.asarray(rng.uniform(0, 1, (batch, cfg.lr_tile, cfg.lr_tile, 1)).astype(np.float32))
        m = jnp.asarray(rng.uniform(0, 1, (batch, tile, tile, 1)).astype(np.float32))
        # Explicit pallas_tail=True: resunet_apply defaults the Pallas tail
        # OFF, so relying on the default would measure the XLA path twice.
        for label, kw in [("pallas", {"pallas_tail": True}), ("xla", {"pallas_tail": False})]:
            f = jax.jit(
                lambda p, s, d_, m_, _kw=kw: resunet_apply(
                    p, s, d_, m_, cfg, train=False, compute_dtype=jnp.float32, **_kw
                )[0]
            )
            print(f"# compiling forward b={batch} {label}...", file=sys.stderr)
            dt = best_of(f, params, state, d, m, reps=args.reps)
            report(f"forward_b{batch}_{label}", dt, batch * tile * tile / 1e6)

    # bf16 forward for reference
    d = jnp.asarray(rng.uniform(0, 1, (chunk, cfg.lr_tile, cfg.lr_tile, 1)).astype(np.float32))
    m = jnp.asarray(rng.uniform(0, 1, (chunk, tile, tile, 1)).astype(np.float32))
    f = jax.jit(
        lambda p, s, d_, m_: resunet_apply(
            p, s, d_, m_, cfg, train=False, compute_dtype=jnp.bfloat16
        )[0]
    )
    print("# compiling forward bf16...", file=sys.stderr)
    dt = best_of(f, params, state, d, m, reps=args.reps)
    report(f"forward_b{chunk}_bf16", dt, chunk * tile * tile / 1e6)

    # -- standalone HR tail --------------------------------------------------
    from floodsr_tpu.ops.pallas.hr_tail import hr_tail_pallas, pack_hr_tail_weights
    from floodsr_tpu.nn.resunet import _res_block, _conv

    s2d = cfg.hr_s2d
    th = tile // s2d
    hrw = cfg.base_filters * s2d
    sr_feat = jnp.asarray(rng.normal(0, 1, (chunk, th, th, hrw)).astype(np.float32))
    dem_feat = jnp.asarray(
        rng.normal(0, 1, (chunk, th, th, cfg.fuse_filters)).astype(np.float32)
    )
    weights = pack_hr_tail_weights(
        {"params": params["fuse"][0], "state": state["fuse"][0]},
        {"params": params["fuse"][1], "state": state["fuse"][1]},
        params["head"],
        bn_eps=cfg.bn_eps,
    )

    f = jax.jit(lambda a, b: hr_tail_pallas(a, b, *weights, band=32))
    print("# compiling tail pallas...", file=sys.stderr)
    dt = best_of(f, sr_feat, dem_feat, reps=args.reps)
    report("tail_pallas", dt, chunk * tile * tile / 1e6)

    def tail_xla(a, b):
        x = jnp.concatenate([a, b], axis=-1)
        for bp, bs in zip(params["fuse"], state["fuse"]):
            x, _ = _res_block(bp, bs, x, cfg, train=False)
        return _conv(params["head"], x.astype(jnp.float32))

    f = jax.jit(tail_xla)
    print("# compiling tail xla...", file=sys.stderr)
    dt = best_of(f, sr_feat, dem_feat, reps=args.reps)
    report("tail_xla", dt, chunk * tile * tile / 1e6)

    # numeric agreement between the fused and XLA tails on hardware
    a = np.asarray(hr_tail_pallas(sr_feat, dem_feat, *weights, band=32))
    b = np.asarray(f(sr_feat, dem_feat))
    print(
        json.dumps(
            {
                "tail_pallas_vs_xla": {
                    "max_abs": float(np.max(np.abs(a - b))),
                    "rmse": float(np.sqrt(np.mean((a - b) ** 2))),
                }
            }
        )
    )

    # -- derived summary -----------------------------------------------------
    scene = results["scene_full_default"]
    print(
        json.dumps(
            {
                "summary": {
                    "tiles": n_tiles,
                    "computed_mp": round(computed_mp, 1),
                    "output_mp": round(out_mp, 1),
                    "overlap_redundancy": round(computed_mp / out_mp, 2),
                    "scene_mp_per_s": round(out_mp / scene, 1),
                    "mosaic_share": round(results["mosaic_only_scan"] / scene, 3),
                    "normalize_share": round(
                        results["gather_normalize_scan"] / scene, 3
                    ),
                    "forward_share": round(results["forward_only_scan"] / scene, 3),
                }
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
