"""Segment isolation for the hard-window flagship scene (where are the ms?).

The hard/feather scene walls imply a ~9 ms fixed per-scene cost beyond the
per-computed-pixel rate (47.6 ms for 16.8 computed MP vs 86.0 ms for 33.6).
This profile decomposes the hard executor: trunk-only, trunk+tail (no
mosaic), full, plus a tail-chunk variant — all compiled up front and timed
interleaved in one contention window.

Run on the TPU host: ``python bin/hard_segment_profile.py``. Appends a
``hard_segments`` entry to ``docs/perf/structure_study.json``.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

ARTIFACT = REPO / "tests/data/_artifacts/model_infer_flagship.fsrz"
OUT_JSON = REPO / "docs/perf/structure_study.json"


def main() -> int:
    import jax
    import jax.numpy as jnp

    from floodsr_tpu.engine.scene import build_scene_executor, pack_scene_indices
    from floodsr_tpu.nn.checkpoint import load_artifact
    from floodsr_tpu.nn.resunet import resunet_tail_apply, resunet_trunk_apply
    from floodsr_tpu.ops.normalize import (
        normalize_dem_batch,
        normalize_dem_with_stats,
        scale_depth_log1p,
    )
    from floodsr_tpu.tiling import build_window_grid

    print(f"backend: {jax.default_backend()} {jax.devices()}", file=sys.stderr)
    artifact = load_artifact(ARTIFACT)
    cfg = artifact["config"]
    params = jax.device_put(artifact["params"])
    state = jax.device_put(artifact["state"])

    tile, lr_tile, scale = cfg.hr_tile, cfg.lr_tile, cfg.scale
    bucket = (4096, 4096)
    content = 3840
    out_mp = content * content / 1e6
    stride = tile  # hard windows
    grid_full = build_window_grid(bucket[0], bucket[1], tile, stride)
    capacity = len(grid_full["y0"])  # 64 — chunk == capacity, zero dummies
    chunk = capacity
    pad = -(-content // tile) * tile  # disjoint grid: pad like run_scene
    grid = build_window_grid(min(bucket[0], pad), min(bucket[1], pad), tile, stride)
    idx = jax.tree.map(jnp.asarray, pack_scene_indices(grid, capacity, chunk))

    rng = np.random.default_rng(0)
    dem = jnp.asarray(rng.normal(300, 20, bucket).astype(np.float32))
    depth = jnp.asarray(
        rng.uniform(0, 3, (bucket[0] // scale, bucket[1] // scale)).astype(np.float32)
    )

    def fwd_trunk(p, s, d, m):
        feat, _ = resunet_trunk_apply(p, s, d, m, cfg, train=False, precision="f32")
        return feat

    def fwd_tail(p, s, f, m):
        out, _ = resunet_tail_apply(p, s, f, m, cfg, train=False, precision="f32")
        return out

    def gather(scene, y0, x0, t):
        def one(y, x):
            return jax.lax.dynamic_slice(scene, (y, x), (t, t))

        return jax.vmap(one)(y0, x0)

    y0f = idx["y0"].reshape(-1)
    x0f = idx["x0"].reshape(-1)

    @jax.jit
    def trunk_only(p, s, depth_pad, dem_pad):
        depth_tiles = gather(depth_pad, y0f // scale, x0f // scale, lr_tile)
        dem_tiles = gather(dem_pad, y0f, x0f, tile)
        depth_norm = scale_depth_log1p(depth_tiles, max_depth=5.0)
        dem_norm, stats = normalize_dem_batch(dem_tiles, 95.0)
        feat = fwd_trunk(p, s, depth_norm[..., None], dem_norm[..., None])
        return jnp.sum(feat.astype(jnp.float32)), stats["p_clip"]

    @jax.jit
    def trunk_tail_no_mosaic(p, s, depth_pad, dem_pad):
        depth_tiles = gather(depth_pad, y0f // scale, x0f // scale, lr_tile)
        dem_tiles = gather(dem_pad, y0f, x0f, tile)
        depth_norm = scale_depth_log1p(depth_tiles, max_depth=5.0)
        dem_norm, stats = normalize_dem_batch(dem_tiles, 95.0)
        feat = fwd_trunk(p, s, depth_norm[..., None], dem_norm[..., None])
        dem_tiles2 = gather(dem_pad, y0f, x0f, tile)
        dem_norm2 = normalize_dem_with_stats(
            dem_tiles2, stats["p_clip"], stats["dem_min"], stats["dem_max"]
        )
        pred = fwd_tail(p, s, feat, dem_norm2[..., None])
        # Cheap per-tile reduce stands in for the mosaic so XLA cannot DCE
        # the tail; adds one pass over the predictions.
        return jnp.sum(pred.astype(jnp.float32))

    def full(chunk_w: int):
        cap = -(-capacity // chunk_w) * chunk_w
        g = build_window_grid(min(bucket[0], pad), min(bucket[1], pad), tile, stride)
        ix = jax.tree.map(jnp.asarray, pack_scene_indices(g, cap, chunk_w))
        fn, _ = build_scene_executor(
            cfg, scene_shape=bucket, capacity=cap, overlap_hr=0,
            chunk=chunk_w, max_depth=5.0, dem_pct_clip=95.0,
            transfer_dtype="uint16",
            split_forward=(fwd_trunk, fwd_tail), trunk_chunk=cap,
        )
        return lambda p, s, d, m: fn(p, s, d, m, ix)

    variants: dict = {}
    for label, fn, args in [
        ("trunk_only", trunk_only, (params, state, depth, dem)),
        ("trunk_tail", trunk_tail_no_mosaic, (params, state, depth, dem)),
        ("full_c64", full(64), (params, state, depth, dem)),
        ("full_c32", full(32), (params, state, depth, dem)),
        ("full_f32_transfer", None, None),
    ]:
        if label == "full_f32_transfer":
            fn2, _ = build_scene_executor(
                cfg, scene_shape=bucket, capacity=capacity, overlap_hr=0,
                chunk=chunk, max_depth=5.0, dem_pct_clip=95.0,
                transfer_dtype="float32",
                split_forward=(fwd_trunk, fwd_tail), trunk_chunk=capacity,
            )
            fn, args = (lambda p, s, d, m: fn2(p, s, d, m, idx)), (
                params, state, depth, dem,
            )
        print(f"# compiling {label}...", file=sys.stderr)
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        print(f"# {label} warm in {time.perf_counter() - t0:.0f}s", file=sys.stderr)
        variants[label] = (fn, args)

    reps, iters = 6, 4
    best = {k: float("inf") for k in variants}
    for _ in range(reps):
        for label, (fn, args) in variants.items():
            t0 = time.perf_counter()
            out = None
            for _ in range(iters):
                out = fn(*args)
            float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
            best[label] = min(best[label], (time.perf_counter() - t0) / iters)

    entry = {
        "date": time.strftime("%Y-%m-%d"),
        "hardware": str(jax.devices()[0]),
        "note": (
            "hard-window flagship scene (64 tiles, 4096^2 bucket) segment "
            "isolation; trunk_tail adds a stand-in reduce; mosaic+finish = "
            "full_c64 - trunk_tail (approx)."
        ),
        "segment_ms": {k: round(v * 1e3, 2) for k, v in best.items()},
        "mp_per_s_full_c64": round(out_mp / best["full_c64"], 1),
    }
    print(json.dumps(entry, indent=1))
    data = json.loads(OUT_JSON.read_text()) if OUT_JSON.exists() else {}
    data["hard_segments"] = entry
    OUT_JSON.write_text(json.dumps(data, indent=1) + "\n")
    print(f"# wrote {OUT_JSON}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
