"""XLA flag sweep on the hard-window flagship scene executable.

``XLA_FLAGS`` binds at process start, so each variant runs in a child
process that compiles the hard-window scene executor and prints its
best-of wall. The baseline runs first AND last — the drift between the two
baseline runs bounds the window noise; a flag win smaller than that drift
is noise, not signal.

Run on the TPU host: ``python bin/flag_sweep.py``. Appends a
``flag_sweep`` entry to ``docs/perf/structure_study.json``.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
OUT_JSON = REPO / "docs/perf/structure_study.json"

VARIANTS: dict[str, str] = {
    "baseline": "",
    "vmem_64m": "--xla_tpu_scoped_vmem_limit_kib=65536",
    "vmem_96m": "--xla_tpu_scoped_vmem_limit_kib=98304",
    "no_lhs": "--xla_tpu_enable_latency_hiding_scheduler=false",
    "baseline_again": "",
}


def child() -> int:
    sys.path.insert(0, str(REPO))
    import numpy as np

    import jax
    import jax.numpy as jnp

    from floodsr_tpu.engine.scene import build_scene_executor, pack_scene_indices
    from floodsr_tpu.nn.checkpoint import load_artifact
    from floodsr_tpu.nn.resunet import resunet_tail_apply, resunet_trunk_apply
    from floodsr_tpu.tiling import build_window_grid

    artifact = load_artifact(REPO / "tests/data/_artifacts/model_infer_flagship.fsrz")
    cfg = artifact["config"]
    params = jax.device_put(artifact["params"])
    state = jax.device_put(artifact["state"])
    tile, scale = cfg.hr_tile, cfg.scale
    bucket, content = (4096, 4096), 3840
    grid_full = build_window_grid(bucket[0], bucket[1], tile, tile)
    capacity = len(grid_full["y0"])
    pad = -(-content // tile) * tile  # disjoint grid: pad like run_scene
    grid = build_window_grid(min(bucket[0], pad), min(bucket[1], pad), tile, tile)
    idx = jax.tree.map(jnp.asarray, pack_scene_indices(grid, capacity, capacity))
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

    fn, _ = build_scene_executor(
        cfg, scene_shape=bucket, capacity=capacity, overlap_hr=0,
        chunk=capacity, max_depth=5.0, dem_pct_clip=95.0,
        transfer_dtype="uint16",
        split_forward=(fwd_trunk, fwd_tail), trunk_chunk=capacity,
    )
    t0 = time.perf_counter()
    out, _ = fn(params, state, depth, dem, idx)
    float(jnp.sum(out.astype(jnp.float32)))
    compile_s = time.perf_counter() - t0

    reps, iters = 5, 4
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out, _ = fn(params, state, depth, dem, idx)
        float(jnp.sum(out.astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / iters)
    print(json.dumps({"scene_ms": round(best * 1e3, 2),
                      "compile_s": round(compile_s, 1)}))
    return 0


def main() -> int:
    if "--child" in sys.argv:
        return child()

    results: dict = {}
    for label, flags in VARIANTS.items():
        env = dict(os.environ)
        if flags:
            env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
        print(f"# running {label}: XLA_FLAGS={flags!r}", file=sys.stderr)
        try:
            proc = subprocess.run(
                [sys.executable, __file__, "--child"],
                env=env, capture_output=True, text=True, timeout=900,
            )
            line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
            results[label] = json.loads(line) if line.startswith("{") else {
                "error": (proc.stderr[-400:] or f"rc={proc.returncode}")
            }
        except subprocess.TimeoutExpired:
            results[label] = {"error": "timeout 900s"}
        print(f"#   -> {results[label]}", file=sys.stderr)

    entry = {
        "date": time.strftime("%Y-%m-%d"),
        "note": (
            "per-process XLA_FLAGS sweep on the hard-window flagship scene; "
            "baseline vs baseline_again bounds window drift"
        ),
        "variants": {k: v for k, v in VARIANTS.items()},
        "results": results,
    }
    print(json.dumps(entry, indent=1))
    data = json.loads(OUT_JSON.read_text()) if OUT_JSON.exists() else {}
    data["flag_sweep"] = entry
    OUT_JSON.write_text(json.dumps(data, indent=1) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
