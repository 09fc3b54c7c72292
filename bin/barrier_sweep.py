"""Separate true device scene time from the harness timing barrier.

``bench.py::_measure_pipeline`` times N queued scene dispatches per scalar
readback and divides by N — so every reported per-scene time still carries
~RTT/N of tunnel round trip (harness artifact, not pipeline work; in
steady-state serving scenes stream back to back with no per-scene barrier).
``bin/trunk_profile.py`` showed the same effect at segment scale (~5 ms
dispatch floor swamping sub-floor segments).

This script measures the SAME compiled scene executables bench.py uses
(feather + hard on the rss_mersch_A-shaped scene) at iters ∈ {2,4,8,16,32}
back-to-back in one contention window, and fits T_meas(i) = T_dev + C / i by
least squares. T_dev is the sustained per-scene device time; C is the
per-group barrier cost (readback RTT + dispatch residue).

Run on the TPU host: ``python bin/barrier_sweep.py``. Appends a
``barrier_sweep`` entry to docs/perf/structure_study.json.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench  # noqa: E402  (the bench harness: scene/model builders)


def _sweep(engine, scene, out_mp, scene_key_index, reps=5):
    import jax
    import jax.numpy as jnp

    from floodsr_tpu.engine.scene import choose_scene_chunk, pack_scene_indices
    from floodsr_tpu.io.geotiff import read_raster
    from floodsr_tpu.tiling import build_window_grid

    scene_keys = [k for k in engine._jit_cache if k[0] == "scene"]
    key = scene_keys[scene_key_index]
    fn = engine._jit_cache[key]
    _, bucket, capacity, stride_hr = key[0], key[1], key[2], key[3]

    lr_arr, _, _ = read_raster(scene["lr"])
    cfg = engine.config
    crop = (lr_arr.shape[0] * cfg.scale, lr_arr.shape[1] * cfg.scale)
    grid_n = len(build_window_grid(bucket[0], bucket[1], cfg.hr_tile, stride_hr)["y0"])
    chunk = choose_scene_chunk(grid_n, engine.scene_chunk)
    content = (-(-crop[0] // cfg.hr_tile) * cfg.hr_tile,
               -(-crop[1] // cfg.hr_tile) * cfg.hr_tile)
    grid = build_window_grid(
        min(bucket[0], content[0]), min(bucket[1], content[1]),
        cfg.hr_tile, stride_hr,
    )
    idx = jax.tree.map(jnp.asarray, pack_scene_indices(grid, capacity, chunk))
    depth_dev = engine._put_padded(lr_arr, (bucket[0] // cfg.scale, bucket[1] // cfg.scale))
    dem_dev = engine._put_padded(
        np.ascontiguousarray(
            np.random.default_rng(0).normal(300, 20, crop).astype(np.float32)
        ),
        bucket,
    )
    out, _ = fn(engine.params, engine.state, depth_dev, dem_dev, idx)
    float(jnp.sum(out.astype(jnp.float32)))  # warm

    points = {}
    for iters in (2, 4, 8, 16, 32):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(iters):
                out, _ = fn(engine.params, engine.state, depth_dev, dem_dev, idx)
            float(jnp.sum(out.astype(jnp.float32)))
            best = min(best, (time.perf_counter() - t0) / iters)
        points[iters] = best * 1e3
        print(f"#   iters={iters}: {best * 1e3:.2f} ms/scene", file=sys.stderr)

    # least-squares fit T(i) = T_dev + C / i
    xs = np.array([1.0 / i for i in points])
    ys = np.array(list(points.values()))
    A = np.stack([np.ones_like(xs), xs], axis=1)
    (t_dev, c_barrier), *_ = np.linalg.lstsq(A, ys, rcond=None)
    return {
        "ms_per_scene_by_iters": {str(k): round(v, 2) for k, v in points.items()},
        "fit_t_dev_ms": round(float(t_dev), 2),
        "fit_barrier_ms_per_group": round(float(c_barrier), 1),
        "mp_per_s_at_t_dev": round(out_mp / (t_dev / 1e3), 1),
    }


def main() -> int:
    import jax

    print(f"backend: {jax.default_backend()} {jax.devices()}", file=sys.stderr)
    from floodsr_tpu.model_registry import resolve_model_worker_class

    out_mp = bench.HR_SHAPE[0] * bench.HR_SHAPE[1] / 1e6
    results = {}
    with tempfile.TemporaryDirectory(prefix="floodsr-sweep-") as tmp:
        root = Path(tmp)
        scene = bench._make_scene(root)
        model_fp = bench._make_model(root)
        worker_cls = resolve_model_worker_class("ResUNet_16x_DEM")
        worker = worker_cls(model_fp=model_fp, compute_dtype="float32", max_batch=8)
        with worker:
            for method, key_idx in (("feather", 0), ("hard", -1)):
                print(f"# compiling {method} scene...", file=sys.stderr)
                worker.run(
                    depth_lr_fp=scene["lr"],
                    dem_hr_fp=scene["dem"],
                    output_fp=root / f"pred_{method}.tif",
                    window_method=method,
                )
                results[method] = _sweep(worker.engine, scene, out_mp, key_idx)
                print(f"# {method}: {json.dumps(results[method])}", file=sys.stderr)

    out_fp = REPO / "docs/perf/structure_study.json"
    payload = json.loads(out_fp.read_text()) if out_fp.exists() else {}
    payload["barrier_sweep"] = {
        "date": "2026-08-17",
        "hardware": str(jax.devices()[0]),
        "note": (
            "queued-iters sweep on the production scene executables; "
            "T_meas(i) = T_dev + C/i least-squares fit separates sustained "
            "device scene time from the readback-barrier share (harness "
            "artifact). bench.py's iters=4 numbers carry ~C/4 of barrier."
        ),
        "results": results,
    }
    out_fp.write_text(json.dumps(payload, indent=1) + "\n")
    print(json.dumps(payload["barrier_sweep"]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
