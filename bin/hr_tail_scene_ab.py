"""Clean paired A/B of the feather scene composition: XLA vs Pallas tail.

The full hr_tail_study measured scene_feather_xla at 106 ms in a process
that had previously compiled ~10 tail executables, while the engine's own
compiled feather scene reads 79 ms — a process-state artifact. This script
measures the SAME executor construction in a fresh process, interleaved
A-B-A, to get trustworthy composition numbers.

Usage: python bin/hr_tail_scene_ab.py [--variants xla,im2col32,im2col64,xla]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _force(out) -> float:
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def best_of(fn, *args, reps: int = 5, iters: int = 16) -> float:
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
    ap.add_argument(
        "--variants", default="xla,im2col32,preshift64,xla",
        help="comma list: xla | {im2col,preshift}{band}",
    )
    ap.add_argument("--mode", default="feather", choices=("feather", "hard"))
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument(
        "--chunk", type=int, default=0,
        help="tail-chunk override (0 = production choose_scene_chunk); "
        "e.g. 121 makes capacity exactly the feather grid (no dummy tiles)",
    )
    ap.add_argument(
        "--bucket", type=int, default=4096,
        help="square scene bucket edge in HR px (default 4096 = the bench "
        "scene; larger buckets measure scene-size throughput scaling)",
    )
    args = ap.parse_args()

    from floodsr_tpu.engine.scene import (
        build_scene_executor,
        choose_scene_chunk,
        pack_scene_indices,
    )
    from floodsr_tpu.nn import ResUNetConfig, init_resunet
    from floodsr_tpu.nn.resunet import resunet_tail_apply, resunet_trunk_apply
    from floodsr_tpu.tiling import build_window_grid

    print(f"backend: {jax.default_backend()} {jax.devices()}", file=sys.stderr)
    cfg = ResUNetConfig()
    params, state = init_resunet(0, cfg)
    params = jax.device_put(params)
    state = jax.device_put(state)

    tile, scale = cfg.hr_tile, cfg.scale
    bucket = (args.bucket, args.bucket)
    overlap = 8 * scale if args.mode == "feather" else 0
    stride = tile - overlap
    grid = build_window_grid(bucket[0], bucket[1], tile, stride)
    n_tiles = len(grid["y0"])
    chunk = args.chunk or choose_scene_chunk(n_tiles, 128)
    capacity = -(-n_tiles // chunk) * chunk
    idx = jax.tree.map(jnp.asarray, pack_scene_indices(grid, capacity, chunk))

    rng = np.random.default_rng(0)
    dem = jnp.asarray(rng.normal(300, 20, bucket).astype(np.float32))
    depth = jnp.asarray(
        rng.uniform(0, 3, (bucket[0] // scale, bucket[1] // scale)).astype(np.float32)
    )
    # bench convention: 3840 content in the 4096 bucket; other sizes keep
    # the same 256-px margin (never exceeding the bucket).
    content = 3840 if args.bucket == 4096 else max(tile, args.bucket - 256)
    out_mp = content * content / 1e6

    def trunk(p, s, d, m):
        feat, _ = resunet_trunk_apply(
            p, s, d, m, cfg, train=False, compute_dtype=jnp.float32
        )
        return feat

    def make_tail(pallas: bool):
        def tail(p, s, feat, m):
            out, _ = resunet_tail_apply(
                p, s, feat, m, cfg, train=False, compute_dtype=jnp.float32,
                pallas_tail=pallas,
            )
            return out

        return tail

    for i, v in enumerate(args.variants.split(",")):
        if v == "xla":
            pallas = False
        else:
            form = next(f for f in ("im2col", "preshift", "winograd")
                        if v.startswith(f))
            band = v[len(form):]
            os.environ["FLOODSR_HR_TAIL_FORMULATION"] = form
            os.environ["FLOODSR_HR_TAIL_BAND"] = band
            pallas = True
        fn, _ = build_scene_executor(
            cfg,
            scene_shape=bucket,
            capacity=capacity,
            overlap_hr=overlap,
            chunk=chunk,
            max_depth=5.0,
            dem_pct_clip=95.0,
            split_forward=(trunk, make_tail(pallas)),
            trunk_chunk=capacity,
            transfer_dtype="uint16",
        )
        print(f"# compiling {args.mode} #{i} {v}...", file=sys.stderr)
        dt = best_of(fn, params, state, depth, dem, idx, reps=args.reps)
        print(
            json.dumps(
                {
                    "segment": f"scene_{args.mode}_{args.bucket}px_{n_tiles}t_{v}#{i}",
                    "ms": round(dt * 1e3, 2),
                    "mp_per_s": round(out_mp / dt, 1),
                }
            )
        )
        sys.stdout.flush()
        os.environ.pop("FLOODSR_HR_TAIL_FORMULATION", None)
        os.environ.pop("FLOODSR_HR_TAIL_BAND", None)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
