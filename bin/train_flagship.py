"""Flagship-scale training study + artifact trainer (TPU).

Two jobs (VERDICT r1 items 2/7/10):

``--study``: train the flagship ResUNet (f=32, 32→512 tiles) at
``hr_s2d=2`` and ``hr_s2d=4`` on synthetic hydraulic scenes, record loss
curves, and evaluate meter-domain quality on a held-out split — against the
bilinear baseline and against each other — plus a bfloat16-vs-float32
inference delta per trained model. Results land in
``docs/perf/flagship_study.json`` (+ printed table) and drive the default
``hr_s2d``/dtype choices with data instead of guesses.

``--golden``: train a smaller (f=16) artifact at FLAGSHIP GEOMETRY
(scale=16, lr_tile=32) and emit it + a 64²→1024² regression case for the
default CPU CI suite (reference pattern:
``tests/data/rss_mersch_A/case_spec.json``).

Run on the TPU host from the repo root:
``python bin/train_flagship.py --study``
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

import os  # noqa: E402

# Golden-case pinning must run on the CPU backend even when a TPU plugin is
# registered (the plugin wins over JAX_PLATFORMS alone on this host).
if "--golden-case" in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

if "--golden-case" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

SEED = 20260816


# ---------------------------------------------------------------------------
# synthetic hydraulic scenes at 2 m statistics
# ---------------------------------------------------------------------------


# The scene-family generator moved into the package so the bench and golden
# cases draw from the same distribution; re-exported here for the studies.
from floodsr_tpu.train.synth import box_mean, make_terrain, make_truth  # noqa: E402,F401


def build_dataset(n_scenes, hr, scale, seed0):
    from floodsr_tpu.train import PatchDataset

    dems, truths, lrs = [], [], []
    for i in range(n_scenes):
        dem = make_terrain((hr, hr), seed0 + i)
        truth = make_truth(dem, seed0 + i)
        dems.append(dem)
        truths.append(truth)
        lrs.append(box_mean(truth, scale))
    return PatchDataset(
        depth_lr=np.stack(lrs), dem_hr=np.stack(dems), target_hr=np.stack(truths)
    )


def bilinear_up(lr, scale):
    """Separable bilinear upsample (pixel-center convention)."""
    from floodsr_tpu.io.affine import from_origin
    from floodsr_tpu.ops.resample import separable_resample_np

    h, w = lr.shape
    src_t = from_origin(0.0, 0.0, float(scale), float(scale))
    dst_t = from_origin(0.0, 0.0, 1.0, 1.0)
    return separable_resample_np(lr, src_t, (h * scale, w * scale), dst_t)


# ---------------------------------------------------------------------------
# study
# ---------------------------------------------------------------------------


def eval_model(cfg, params, state, dataset, idxs, compute_dtype):
    """Meter-domain metrics over a patch set (batched forward on device)."""
    from floodsr_tpu.eval.metrics import compute_depth_error_metrics
    from floodsr_tpu.nn import resunet_apply
    from floodsr_tpu.ops.normalize import (
        invert_depth_log1p,
        normalize_dem_batch,
        scale_depth_log1p,
    )

    fwd = jax.jit(
        lambda p, s, d, m: invert_depth_log1p(
            resunet_apply(
                p, s,
                scale_depth_log1p(d, 5.0)[..., None],
                normalize_dem_batch(m, 95.0)[0][..., None],
                cfg, compute_dtype=compute_dtype,
            )[0][..., 0],
            5.0,
        )
    )
    preds, truths = [], []
    bs = 8
    for i in range(0, len(idxs) - bs + 1, bs):
        take = idxs[i : i + bs]
        pred = np.asarray(
            fwd(params, state, jnp.asarray(dataset.depth_lr[take]), jnp.asarray(dataset.dem_hr[take]))
        )
        preds.append(pred)
        truths.append(dataset.target_hr[take])
    pred = np.concatenate(preds)
    truth = np.concatenate(truths)
    m = compute_depth_error_metrics(
        reference_depth_m=truth.reshape(-1, truth.shape[-1]),
        estimate_depth_m=pred.reshape(-1, pred.shape[-1]),
        max_depth=5.0,
    )
    return {k: float(m[k]) for k in ("mase_m", "rmse_m", "rmse_wet_m", "bias_m")}, pred


def run_study(steps: int, out_fp: Path) -> None:
    from floodsr_tpu.eval.metrics import compute_depth_error_metrics
    from floodsr_tpu.nn import ResUNetConfig
    from floodsr_tpu.train import TrainConfig, init_train_state, make_train_step, split_indices

    scale, hr = 16, 512
    dataset = build_dataset(288, hr, scale, seed0=31000)
    train_idx, val_idx = split_indices(len(dataset), val_fraction=0.11, seed=SEED)
    print(f"dataset: {len(train_idx)} train / {len(val_idx)} val patches of {hr}^2")

    # Bilinear baseline on the val split.
    bl_pred = np.stack([bilinear_up(dataset.depth_lr[i], scale) for i in val_idx])
    bl_truth = dataset.target_hr[val_idx]
    bl = compute_depth_error_metrics(
        reference_depth_m=bl_truth.reshape(-1, bl_truth.shape[-1]),
        estimate_depth_m=np.clip(bl_pred, 0, 5).reshape(-1, bl_pred.shape[-1]),
        max_depth=5.0,
    )
    baseline = {k: float(bl[k]) for k in ("mase_m", "rmse_m", "rmse_wet_m", "bias_m")}
    print("bilinear baseline:", {k: round(v, 4) for k, v in baseline.items()})

    results = {"baseline_bilinear": baseline, "steps": steps, "configs": {}}
    for s2d in (2, 4):
        cfg = ResUNetConfig(hr_s2d=s2d)
        tcfg = TrainConfig(total_steps=steps, base_lr=4e-4, second_lr=1e-4)
        state = init_train_state(SEED, cfg, tcfg)
        step_fn = make_train_step(cfg, tcfg, donate=True)
        losses = []
        t0 = time.perf_counter()
        for bi, batch in enumerate(
            dataset.batches(train_idx, batch_size=8, seed=SEED, augment=True, steps=steps)
        ):
            state, metrics = step_fn(state, batch)
            if bi % 50 == 0 or bi == steps - 1:
                loss = float(metrics["loss"])
                losses.append({"step": bi, "loss": loss})
                print(f"s2d={s2d} step {bi}: loss {loss:.5f}", flush=True)
        train_s = time.perf_counter() - t0

        entry = {"train_seconds": round(train_s, 1), "loss_curve": losses, "eval": {}}
        preds = {}
        for dtype_name, dtype in (("float32", jnp.float32), ("bfloat16", jnp.bfloat16)):
            m, pred = eval_model(cfg, state.params, state.model_state, dataset, val_idx, dtype)
            entry["eval"][dtype_name] = m
            preds[dtype_name] = pred
            print(f"s2d={s2d} {dtype_name}: " + str({k: round(v, 4) for k, v in m.items()}))
        delta = preds["bfloat16"] - preds["float32"]
        entry["bf16_vs_f32"] = {
            "rmse_m": float(np.sqrt(np.mean(delta**2))),
            "max_abs_m": float(np.abs(delta).max()),
        }
        print(f"s2d={s2d} bf16-vs-f32 delta:", entry["bf16_vs_f32"])
        results["configs"][f"s2d{s2d}"] = entry

    out_fp.parent.mkdir(parents=True, exist_ok=True)
    out_fp.write_text(json.dumps(results, indent=2))
    print(f"wrote {out_fp}")


def _cropped_patch_dataset(n_scenes: int, hr: int, patch: int, scale: int, seed0: int):
    """512² HR patches cropped (stride patch/2) from larger synthetic scenes.

    The truth's water surface is resolved per SCENE (quantile of the full
    DEM), then patches are cut afterwards — so a patch's depth field is not
    explainable from its own DEM statistics alone, matching what the tiled
    pipeline feeds the model on real multi-tile rasters.
    """
    from floodsr_tpu.train import PatchDataset

    lr_patch = patch // scale
    stride = patch // 2
    d_p, t_p, l_p = [], [], []
    for i in range(n_scenes):
        dem = make_terrain((hr, hr), seed0 + i)
        truth = make_truth(dem, seed0 + i)
        lr = box_mean(truth, scale)
        for y in range(0, hr - patch + 1, stride):
            for x in range(0, hr - patch + 1, stride):
                d_p.append(dem[y : y + patch, x : x + patch])
                t_p.append(truth[y : y + patch, x : x + patch])
                ly, lx = y // scale, x // scale
                l_p.append(lr[ly : ly + lr_patch, lx : lx + lr_patch])
    return PatchDataset(
        depth_lr=np.stack(l_p), dem_hr=np.stack(d_p), target_hr=np.stack(t_p)
    )


def run_golden(steps: int) -> None:
    """Train the flagship-geometry CI artifact + build its regression case.

    Full flagship config (f=32, 16×, 32→512 tiles, hr_s2d=2), trained on the
    synthetic hydraulic generator, stored float16 (VERDICT r1 item 7). The
    case pins metrics through the tohr pipeline at 64² LR → 1024² HR
    (9 feather tiles) plus the bilinear baseline — runnable in the default
    CPU suite.
    """
    from floodsr_tpu.nn import ResUNetConfig
    from floodsr_tpu.train import TrainConfig, init_train_state, make_train_step, split_indices
    from floodsr_tpu.train.trainer import export_inference_artifact

    # Train on 512² HR patches CROPPED FROM 1024² scenes so each patch sees
    # partial-scene DEM statistics — exactly what per-tile normalization
    # produces when the pipeline tiles a multi-tile scene. (Training on
    # whole single-tile scenes generalized badly to the 9-tile case: tiles
    # fully wet / fully dry / mid-slope never occur in that distribution.)
    scale, hr, patch = 16, 1024, 512
    dataset = _cropped_patch_dataset(
        n_scenes=80, hr=hr, patch=patch, scale=scale, seed0=31000
    )
    train_idx, _ = split_indices(len(dataset), val_fraction=0.1, seed=SEED)

    cfg = ResUNetConfig()  # flagship
    tcfg = TrainConfig(total_steps=steps, base_lr=4e-4, second_lr=1e-4)
    state = init_train_state(SEED, cfg, tcfg)
    step_fn = make_train_step(cfg, tcfg, donate=True)
    t0 = time.perf_counter()
    curve = []
    for bi, batch in enumerate(
        dataset.batches(train_idx, batch_size=8, seed=SEED + 1, augment=True, steps=steps)
    ):
        state, metrics = step_fn(state, batch)
        if bi % 100 == 0 or bi == steps - 1:
            curve.append({"step": bi, "loss": float(metrics["loss"])})
            print(f"golden step {bi}: loss {curve[-1]['loss']:.5f}", flush=True)
    print(f"trained flagship golden in {time.perf_counter() - t0:.0f}s")

    art_dir = REPO / "tests" / "data" / "_artifacts"
    art_dir.mkdir(parents=True, exist_ok=True)
    fp = export_inference_artifact(
        art_dir / "model_infer_flagship.fsrz",
        state,
        cfg,
        {"seed": SEED, "purpose": "flagship-geometry regression golden",
         "train_steps": steps, "loss_curve": curve},
        store_dtype="float16",
    )
    print(f"wrote {fp} ({fp.stat().st_size/1e6:.1f} MB)")


def build_golden_case(case_name: str = "synth_flagship") -> None:
    """Pin the flagship-geometry regression case (CPU backend required).

    64² LR @30 m → 1024² HR (9 feather tiles of the real 32→512 contract),
    generated from the same hydraulic-scene family the artifact was trained
    on (held-out seed), metrics + bilinear baseline pinned at precision 3 —
    the pattern of the reference's ``rss_mersch_A`` case.
    """
    assert jax.default_backend() == "cpu", "golden cases must be pinned on CPU"
    import json

    from floodsr_tpu.eval import compute_depth_error_metrics
    from floodsr_tpu.io import from_origin, read_raster, write_raster
    from floodsr_tpu.tohr import tohr

    scale, lr_res = 16, 30.0
    hr_res = lr_res / scale
    dem = make_terrain((1024, 1024), seed=77001)
    truth = make_truth(dem, seed=77001)
    depth_lr = box_mean(truth, scale)

    case_dir = REPO / "tests" / "data" / case_name
    case_dir.mkdir(parents=True, exist_ok=True)
    x0, y0 = 500000.0, 4000000.0

    def write(fp, arr, res):
        write_raster(
            fp, np.asarray(arr, np.float32),
            {
                "height": arr.shape[0], "width": arr.shape[1], "count": 1,
                "dtype": "float32", "crs": "EPSG:32633",
                "transform": from_origin(x0, y0 + arr.shape[0] * res, res, res),
                "nodata": -9999.0, "compress": "LZW",
            },
        )

    lowres_fp = case_dir / "lowres030.tif"
    dem_fp = case_dir / "hires002_dem.tif"
    truth_fp = case_dir / "hires002.tif"
    write(lowres_fp, depth_lr, lr_res)
    write(dem_fp, dem, hr_res)
    write(truth_fp, truth, hr_res)

    model_fp = REPO / "tests" / "data" / "_artifacts" / "model_infer_flagship.fsrz"
    assert model_fp.exists(), "train the artifact first (--golden on the TPU host)"
    out_fp = case_dir / "_golden_pred.tif"
    tohr(
        model_version="ResUNet_16x_DEM",
        model_fp=model_fp,
        depth_lr_fp=lowres_fp,
        dem_hr_fp=dem_fp,
        output_fp=out_fp,
    )
    pred, _, _ = read_raster(out_fp)
    out_fp.unlink()
    metrics = compute_depth_error_metrics(truth, pred, max_depth=5.0)
    bl = compute_depth_error_metrics(
        truth, np.clip(bilinear_up(depth_lr, scale), 0, 5).astype(np.float32), max_depth=5.0
    )
    spec = {
        "inputs": {
            "lowres_fp": lowres_fp.name,
            "dem_fp": dem_fp.name,
            "truth_fp": truth_fp.name,
        },
        "expected": {
            "ResUNet_16x_DEM_default": {
                "params": {"model_version": "ResUNet_16x_DEM"},
                "metrics": {
                    "precision": 3,
                    "mase_m": metrics["mase_m"],
                    "rmse_m": metrics["rmse_m"],
                    "ssim": metrics["ssim"],
                },
            }
        },
        "flags": {"in_hrdem": False, "non_native_scale": False, "allow_zero_border": True},
        "model_artifact": "_artifacts/model_infer_flagship.fsrz",
        "baseline_bilinear": {
            "rmse_m": bl["rmse_m"], "ssim": bl["ssim"], "mase_m": bl["mase_m"],
        },
    }
    (case_dir / "case_spec.json").write_text(json.dumps(spec, indent=2))
    (case_dir / "readme.md").write_text(
        f"# {case_name}\n\nFlagship-geometry regression case: 64x64 LR @30 m -> "
        "1024x1024 HR @1.875 m through the real 32->512 tile contract "
        "(9 feather tiles). Model: tests/data/_artifacts/"
        "model_infer_flagship.fsrz (f=32, hr_s2d=2, trained by "
        "bin/train_flagship.py --golden on synthetic hydraulic scenes; "
        "float16-stored). Truth is deterministic in the DEM, so the "
        "DEM-conditioned model must beat plain bilinear upsampling "
        "(baseline pinned in case_spec.json).\n"
    )
    print(
        f"{case_name}: SR rmse={metrics['rmse_m']:.4f} ssim={metrics['ssim']:.4f} "
        f"vs bilinear rmse={bl['rmse_m']:.4f} ssim={bl['ssim']:.4f}"
    )
    assert metrics["rmse_m"] < bl["rmse_m"], "flagship golden must beat bilinear"


def run_full(steps: int, out_fp: Path) -> None:
    """Full-budget flagship training (VERDICT r2 item 10).

    Device-resident data pipeline (``stage_dataset_to_device`` /
    ``make_resident_train_step``): the whole normalized patch set lives in
    HBM and every step samples + augments + trains on device — on this
    tunnel-fed host that is the difference between 0.56 s/step (host feed)
    and compute-bound stepping, which is what makes a 50k-step budget
    tractable at all. Publishes the full reference metric set
    (psnr/ssim/rmse/rmse_wet/mase/csi — reference ``misc/eval.py:6-72``)
    vs bilinear on a held-out split into ``flagship_study.json:
    configs.s2d4_full``, and exports the artifact as the committed flagship
    golden (regenerate the case with ``--golden-case`` afterwards).
    """
    from floodsr_tpu.eval.metrics import compute_depth_error_metrics
    from floodsr_tpu.nn import ResUNetConfig
    from floodsr_tpu.train import TrainConfig, init_train_state, split_indices
    from floodsr_tpu.train.trainer import (
        export_inference_artifact,
        make_resident_train_loop,
        stage_dataset_to_device,
    )

    scale = 16
    dataset = _cropped_patch_dataset(
        n_scenes=160, hr=1024, patch=512, scale=scale, seed0=31000
    )
    train_idx, val_idx = split_indices(len(dataset), val_fraction=0.08, seed=SEED)
    print(f"dataset: {len(train_idx)} train / {len(val_idx)} val patches of 512^2")

    cfg = ResUNetConfig()  # flagship s2d4
    tcfg = TrainConfig(total_steps=steps, base_lr=4e-4, second_lr=1e-4)
    state = init_train_state(SEED, cfg, tcfg)
    data_dev = stage_dataset_to_device(dataset, train_idx)
    staged_gb = sum(v.nbytes for v in data_dev.values()) / 1e9
    print(f"staged {staged_gb:.2f} GB of normalized patches to device")
    # 100 steps per dispatch: the tunnel's ~25 ms RTT otherwise caps
    # training at ~4 steps/s (measured) against ~15 ms of step compute.
    steps_per_call = 100
    loop_fn = make_resident_train_loop(
        cfg, tcfg, batch_size=8, steps_per_call=steps_per_call
    )

    root_key = jax.random.key(SEED)
    curve = []
    t0 = time.perf_counter()
    done = 0
    while done < steps:
        key = jax.random.fold_in(root_key, done)
        state, losses = loop_fn(state, data_dev, key)
        done += steps_per_call
        if done % 2000 == 0 or done >= steps:
            loss = float(losses[-1])  # host sync only at log points
            curve.append({"step": done, "loss": loss})
            rate = done / (time.perf_counter() - t0)
            print(f"full step {done}: loss {loss:.5f} ({rate:.1f} steps/s)", flush=True)
    train_s = time.perf_counter() - t0
    print(f"trained s2d4_full {done} steps in {train_s:.0f}s")

    # Held-out eval: full reference metric set, bilinear baseline alongside.
    m_f32, pred = eval_model(cfg, state.params, state.model_state, dataset, val_idx, jnp.float32)
    take = val_idx[: (len(val_idx) // 8) * 8]
    truth = dataset.target_hr[take]
    full = compute_depth_error_metrics(
        reference_depth_m=truth.reshape(-1, truth.shape[-1]),
        estimate_depth_m=pred.reshape(-1, pred.shape[-1]),
        max_depth=5.0,
    )
    bl_pred = np.stack([bilinear_up(dataset.depth_lr[i], scale) for i in take])
    bl = compute_depth_error_metrics(
        reference_depth_m=truth.reshape(-1, truth.shape[-1]),
        estimate_depth_m=np.clip(bl_pred, 0, 5).reshape(-1, bl_pred.shape[-1]),
        max_depth=5.0,
    )

    def csi(ref, est, thresh=1e-3):
        wet_r = ref >= thresh
        wet_e = est >= thresh
        hits = np.sum(wet_r & wet_e)
        den = hits + np.sum(wet_r & ~wet_e) + np.sum(~wet_r & wet_e)
        return float(hits / den) if den else float("nan")

    keys = ("psnr", "ssim", "rmse_m", "rmse_wet_m", "mase_m", "bias_m")
    model_metrics = {k: float(full[k]) for k in keys}
    model_metrics["csi"] = csi(truth, pred)
    bl_metrics = {k: float(bl[k]) for k in keys}
    bl_metrics["csi"] = csi(truth, np.clip(bl_pred, 0, 5))
    print("s2d4_full:", {k: round(v, 4) for k, v in model_metrics.items()})
    print("bilinear :", {k: round(v, 4) for k, v in bl_metrics.items()})

    payload = json.loads(out_fp.read_text()) if out_fp.exists() else {"configs": {}}
    payload["configs"]["s2d4_full"] = {
        "steps": steps,
        "train_seconds": round(train_s, 1),
        "loss_curve": curve[:: max(1, len(curve) // 40)],
        "eval_heldout": model_metrics,
        "baseline_bilinear_heldout": bl_metrics,
        "note": (
            "device-resident pipeline (data staged to HBM, on-device "
            "sample+augment); 160-scene cropped-patch distribution"
        ),
    }
    out_fp.write_text(json.dumps(payload, indent=2))
    print(f"wrote {out_fp}")

    art_dir = REPO / "tests" / "data" / "_artifacts"
    fp = export_inference_artifact(
        art_dir / "model_infer_flagship.fsrz",
        state,
        cfg,
        {"seed": SEED, "purpose": "flagship full-budget golden",
         "train_steps": steps},
        store_dtype="float16",
    )
    print(f"wrote {fp} ({fp.stat().st_size / 1e6:.1f} MB)")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--study", action="store_true")
    ap.add_argument("--golden", action="store_true")
    ap.add_argument("--golden-case", action="store_true")
    ap.add_argument("--full", action="store_true")
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--out", type=Path, default=REPO / "docs" / "perf" / "flagship_study.json")
    args = ap.parse_args()
    print("backend:", jax.default_backend(), jax.devices())
    if args.study:
        run_study(args.steps, args.out)
        return 0
    if args.golden:
        run_golden(args.steps)
        return 0
    if args.golden_case:
        build_golden_case()
        return 0
    if args.full:
        run_full(args.steps, args.out)
        return 0
    ap.print_help()
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
