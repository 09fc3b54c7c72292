"""Inference window-size economics: quality + throughput vs ``--tile-size``.

The native JAX ResUNet is fully convolutional, so the SAME trained weights
run at any LR window divisible by 2^levels — a degree of freedom the
reference's fixed-shape tf2onnx graph does not have. Larger windows shrink
the feather overlap-recompute factor (at the mersch geometry: 121 tiles /
2.15x at the trained 32-LR tile, 25 tiles / 1.56x at 64, ONE window / 1.0x
whole-scene) and give the HR tail bigger, more MXU-friendly conv shapes.

The catch this study measures: per-window DEM percentile normalization
follows the window, so windows larger than the trained 512² see DIFFERENT
(wider-range) DEM statistics — off the training distribution. For
tile_lr ∈ {32, 64, 128, 240(whole-scene)} on held-out scenes from the
flagship's own training family (train_flagship.make_terrain/make_truth,
seeds 772000+):

- held-out quality vs truth (rmse/rmse_wet/mase/ssim) + bilinear anchor,
- output divergence vs the trained-tile (32) feather reference output,
- seam-discontinuity ratio,
- scene wall / MP/s (queued dispatch, best-of; the ~27 ms readback barrier
  is amortized over the queued group as in structure_study.barrier_sweep).

Run on the TPU host: ``python bin/tile_size_study.py``. Writes
``docs/perf/tile_size_study.json``.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "bin"))

ARTIFACT = REPO / "tests/data/_artifacts/model_infer_flagship.fsrz"
OUT_JSON = REPO / "docs/perf/tile_size_study.json"
N_SCENES = 5
CONTENT = 3840
MAX_DEPTH = 5.0
DEM_PCT = 95.0
SEED0 = 772000  # disjoint from training/golden/overlap-study seed ranges
TILE_SIZES = (32, 64, 128, 240)  # LR px; 240 = whole 3840^2 scene
ITERS = 8  # queued dispatches per timing readback


def _box_mean(arr, k):
    h, w = arr.shape
    return arr.reshape(h // k, k, w // k, k).mean(axis=(1, 3)).astype(np.float32)


def main() -> int:
    import dataclasses

    import jax
    import jax.numpy as jnp

    from floodsr_tpu.engine.scene import (
        build_scene_executor,
        choose_scene_chunk,
        pack_scene_indices,
    )
    from floodsr_tpu.eval import compute_depth_error_metrics
    from floodsr_tpu.nn.checkpoint import load_artifact
    from floodsr_tpu.nn.resunet import resunet_tail_apply, resunet_trunk_apply
    from floodsr_tpu.tiling import build_window_grid
    from overlap_study import _seam_ratio
    from train_flagship import make_terrain, make_truth

    print(f"backend: {jax.default_backend()} {jax.devices()}", file=sys.stderr)
    art = load_artifact(ARTIFACT)
    base_cfg = art["config"]
    params = jax.device_put(art["params"])
    state = jax.device_put(art["state"])
    scale = base_cfg.scale

    scenes = []
    for i in range(N_SCENES):
        dem = make_terrain((CONTENT, CONTENT), SEED0 + i)
        truth = make_truth(dem, SEED0 + i)
        scenes.append((dem, truth, _box_mean(truth, scale)))
        print(f"# scene {i} generated", file=sys.stderr)

    def force(o):
        return float(jnp.sum(jax.tree.leaves(o)[0].astype(jnp.float32)))

    results: dict = {
        "hardware": str(jax.devices()[0]),
        "date": time.strftime("%Y-%m-%d"),
        "artifact": ARTIFACT.name,
        "note": (
            f"Fully-convolutional window-size sweep on {N_SCENES} held-out "
            f"{CONTENT}^2 scenes from the flagship's training family (seeds "
            f"{SEED0}+), f32 two-phase executor, feather overlap tile//4 "
            "(240 = whole-scene single window, no mosaic). Per-window DEM "
            "normalization follows the window — quality at non-trained "
            "window sizes is the question. Timing: queued dispatch "
            f"(iters={ITERS}), ~27/{ITERS} ms residual barrier per scene."
        ),
        "configs": {},
    }

    # Bilinear quality anchor (torch CPU; accelerator only runs executors).
    import torch

    bl = []
    for dem, truth, depth_lr in scenes:
        up = torch.nn.functional.interpolate(
            torch.from_numpy(depth_lr)[None, None], size=(CONTENT, CONTENT),
            mode="bilinear", align_corners=False,
        )[0, 0].numpy()
        bl.append(compute_depth_error_metrics(
            reference_depth_m=truth, estimate_depth_m=up, max_depth=MAX_DEPTH))
    results["bilinear_baseline"] = {
        k: round(float(np.mean([m[k] for m in bl])), 5)
        for k in ("rmse_m", "rmse_wet_m", "mase_m", "ssim")
    }

    ref_outputs: list[np.ndarray] = []
    for tile_lr in TILE_SIZES:
        cfg = dataclasses.replace(base_cfg, lr_tile=tile_lr)
        tile = cfg.hr_tile

        def fwd_trunk(p, s, d, m, _cfg=cfg):
            f, _ = resunet_trunk_apply(p, s, d, m, _cfg, train=False, precision="f32")
            return f

        def fwd_tail(p, s, f, m, _cfg=cfg):
            o, _ = resunet_tail_apply(p, s, f, m, _cfg, train=False, precision="f32")
            return o

        content_pad = -(-CONTENT // tile) * tile
        bucket = (content_pad, content_pad)
        overlap_lr = tile_lr // 4
        whole = content_pad == tile
        overlap = 0 if whole else overlap_lr * scale
        stride = tile if whole else tile - overlap
        grid = build_window_grid(content_pad, content_pad, tile, stride)
        n_tiles = len(grid["y0"])
        chunk = choose_scene_chunk(n_tiles, 128, tile_hr=tile)
        capacity = -(-n_tiles // chunk) * chunk
        idx = jax.tree.map(jnp.asarray, pack_scene_indices(grid, capacity, chunk))
        recompute = n_tiles * tile * tile / (CONTENT * CONTENT)
        print(
            f"# tile_lr={tile_lr}: {n_tiles} tiles of {tile}^2 "
            f"(recompute {recompute:.3f}x, chunk {chunk}, bucket {bucket}) "
            "compiling...",
            file=sys.stderr,
        )
        entry: dict = {
            "tiles": n_tiles,
            "tile_hr": tile,
            "overlap_lr": 0 if whole else overlap_lr,
            "chunk": chunk,
            "recompute_factor": round(recompute, 3),
        }
        try:
            fn, _ = build_scene_executor(
                cfg, scene_shape=bucket, capacity=capacity, overlap_hr=overlap,
                chunk=chunk, max_depth=MAX_DEPTH, dem_pct_clip=DEM_PCT,
                transfer_dtype="float32",
                split_forward=(fwd_trunk, fwd_tail), trunk_chunk=capacity,
            )
            t_c0 = time.perf_counter()
            metrics, divergences, seam_ratios = [], [], []
            wall = float("inf")
            for si, (dem, truth, depth_lr) in enumerate(scenes):
                pad = content_pad - CONTENT
                dem_pad = jnp.asarray(np.pad(dem, ((0, pad),) * 2))
                lr_pad = jnp.asarray(np.pad(depth_lr, ((0, pad // scale),) * 2))
                out, _ = fn(params, state, lr_pad, dem_pad, idx)
                force(out)
                if si == 0:
                    entry["first_scene_s"] = round(time.perf_counter() - t_c0, 1)
                    for _ in range(3):
                        t0 = time.perf_counter()
                        for _ in range(ITERS):
                            out, _ = fn(params, state, lr_pad, dem_pad, idx)
                        force(out)
                        wall = min(wall, (time.perf_counter() - t0) / ITERS)
                pred = np.asarray(out)[:CONTENT, :CONTENT]
                pred = np.where(pred < 1e-3, 0.0, pred)
                metrics.append(compute_depth_error_metrics(
                    reference_depth_m=truth, estimate_depth_m=pred,
                    max_depth=MAX_DEPTH))
                if not whole:
                    seam_ratios.append(_seam_ratio(pred, tile, stride))
                if tile_lr == TILE_SIZES[0]:
                    ref_outputs.append(pred)
                else:
                    d = pred - ref_outputs[si]
                    divergences.append(
                        (float(np.sqrt(np.mean(d**2))), float(np.max(np.abs(d))))
                    )
        except Exception as err:  # noqa: BLE001 - record OOM/compile failures
            entry["error"] = f"{type(err).__name__}: {str(err)[:400]}"
            results["configs"][f"tile_{tile_lr}"] = entry
            print(f"# tile_lr={tile_lr} FAILED: {entry['error']}", file=sys.stderr)
            continue

        entry.update({
            "scene_ms": round(wall * 1e3, 1),
            "out_mp_per_s": round(CONTENT * CONTENT / 1e6 / wall, 1),
            "quality_vs_truth": {
                k: round(float(np.mean([m[k] for m in metrics])), 5)
                for k in ("rmse_m", "rmse_wet_m", "mase_m", "ssim")
            },
        })
        if seam_ratios:
            entry["seam_grad_ratio"] = round(float(np.nanmean(seam_ratios)), 3)
        if divergences:
            entry["vs_tile32_rmse_m"] = round(
                float(np.mean([d[0] for d in divergences])), 5)
            entry["vs_tile32_max_abs_m"] = round(
                float(np.max([d[1] for d in divergences])), 5)
        results["configs"][f"tile_{tile_lr}"] = entry
        print(f"# tile_lr={tile_lr}: {json.dumps(entry)}", file=sys.stderr)

    OUT_JSON.parent.mkdir(parents=True, exist_ok=True)
    OUT_JSON.write_text(json.dumps(results, indent=1) + "\n")
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
