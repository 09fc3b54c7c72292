"""Structural throughput study at gate-passing (f32/HIGH) numerics.

The round-3 precision sweep (docs/perf/precision_study.json) showed the
≤1e-3 m parity gate demands f32/HIGH in BOTH trunk and tail (bf16 trunk
alone: rmse 2.4e-3 m), so throughput on the parity config must come from
structure, not dtype. This study times, on the mersch-shaped scene:

- the single-phase scene executor (round-2 formulation)
- the two-phase executor (wide trunk batches) at several trunk chunks
- the trunk and tail halves in isolation per batch size (where the ms are)

Run on the TPU host: ``python bin/structure_study.py``. Appends results to
``docs/perf/structure_study.json``. Timing via queued async dispatch + one
scalar readback (axon-tunnel methodology, see bin/profile_scene.py).
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


def best_of(fn, *args, reps: int = 4, iters: int = 4) -> float:
    import jax
    import jax.numpy as jnp

    def force(out):
        leaf = jax.tree.leaves(out)[0]
        return float(jnp.sum(leaf.astype(jnp.float32)))

    force(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        force(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main() -> int:
    import jax
    import jax.numpy as jnp

    from floodsr_tpu.engine.scene import build_scene_executor, pack_scene_indices
    from floodsr_tpu.nn.checkpoint import load_artifact
    from floodsr_tpu.nn.resunet import (
        resunet_tail_apply,
        resunet_trunk_apply,
    )
    from floodsr_tpu.tiling import build_window_grid

    print(f"backend: {jax.default_backend()} {jax.devices()}", file=sys.stderr)
    artifact = load_artifact(ARTIFACT)
    cfg = artifact["config"]
    params = jax.device_put(artifact["params"])
    state = jax.device_put(artifact["state"])

    tile = cfg.hr_tile
    overlap = (cfg.lr_tile // 4) * cfg.scale
    stride = tile - overlap
    bucket = (4096, 4096)
    content = 3840
    chunk = 8
    grid_full = build_window_grid(bucket[0], bucket[1], tile, stride)
    capacity = -(-len(grid_full["y0"]) // chunk) * chunk
    grid = build_window_grid(content, content, tile, stride)
    idx = jax.tree.map(jnp.asarray, pack_scene_indices(grid, capacity, chunk))
    out_mp = content * content / 1e6

    rng = np.random.default_rng(0)
    dem = jnp.asarray(rng.normal(300, 20, bucket).astype(np.float32))
    depth = jnp.asarray(
        rng.uniform(0, 3, (bucket[0] // cfg.scale, bucket[1] // cfg.scale)).astype(
            np.float32
        )
    )

    results: dict = {
        "hardware": str(jax.devices()[0]),
        "date": time.strftime("%Y-%m-%d"),
        "artifact": ARTIFACT.name,
        "note": (
            "f32/HIGH structural A/B: single-phase vs two-phase scene "
            "executor (trunk chunk sweep) + trunk/tail isolation on the "
            "mersch-shaped 121-tile scene (bucket 4096^2, content 3840^2)."
        ),
        "scene_ms": {},
        "isolation_ms": {},
    }

    def fwd_trunk(p, s, d, m):
        feat, _ = resunet_trunk_apply(p, s, d, m, cfg, train=False, precision="f32")
        return feat

    def fwd_tail(p, s, f, m):
        out, _ = resunet_tail_apply(p, s, f, m, cfg, train=False, precision="f32")
        return out

    # -- scene executors -----------------------------------------------------
    variants = [("single_phase", None, 0)] + [
        (f"two_phase_tc{tc}", (fwd_trunk, fwd_tail), tc) for tc in (16, 32, 64, capacity)
    ]
    for label, split, tc in variants:
        fn, _ = build_scene_executor(
            cfg,
            scene_shape=bucket,
            capacity=capacity,
            overlap_hr=overlap,
            chunk=chunk,
            max_depth=5.0,
            dem_pct_clip=95.0,
            transfer_dtype="uint16",
            split_forward=split,
            trunk_chunk=tc,
        )
        print(f"# compiling scene[{label}]...", file=sys.stderr)
        dt = best_of(fn, params, state, depth, dem, idx)
        results["scene_ms"][label] = round(dt * 1e3, 1)
        results["scene_ms"][f"{label}_mp_per_s"] = round(out_mp / dt, 1)
        print(f"# scene[{label}]: {dt * 1e3:.1f} ms", file=sys.stderr)

    # -- isolation: trunk / tail per batch -----------------------------------
    for b in (8, 32, 128):
        d = jnp.asarray(
            rng.uniform(0, 1, (b, cfg.lr_tile, cfg.lr_tile, 1)).astype(np.float32)
        )
        m = jnp.asarray(rng.uniform(0, 1, (b, tile, tile, 1)).astype(np.float32))
        f = jax.jit(lambda p, s, d_, m_: fwd_trunk(p, s, d_, m_))
        print(f"# compiling trunk b={b}...", file=sys.stderr)
        dt = best_of(f, params, state, d, m)
        results["isolation_ms"][f"trunk_b{b}"] = round(dt * 1e3, 2)
        results["isolation_ms"][f"trunk_b{b}_us_per_tile"] = round(dt / b * 1e6, 1)
    for b in (8, 16):
        feat = jnp.asarray(
            rng.normal(0, 1, (b, cfg.lr_tile, cfg.lr_tile, cfg.base_filters)).astype(
                np.float32
            )
        )
        m = jnp.asarray(rng.uniform(0, 1, (b, tile, tile, 1)).astype(np.float32))
        f = jax.jit(lambda p, s, f_, m_: fwd_tail(p, s, f_, m_))
        print(f"# compiling tail b={b}...", file=sys.stderr)
        dt = best_of(f, params, state, feat, m)
        results["isolation_ms"][f"tail_b{b}"] = round(dt * 1e3, 2)
        results["isolation_ms"][f"tail_b{b}_us_per_tile"] = round(dt / b * 1e6, 1)

    OUT_JSON.parent.mkdir(parents=True, exist_ok=True)
    OUT_JSON.write_text(json.dumps(results, indent=1) + "\n")
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
