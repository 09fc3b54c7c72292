"""Generate deterministic data-driven regression cases into tests/data/.

Reference pattern (reference: ``tests/data/*/case_spec.json`` +
``tests/conftest.py:16-46``): each case directory carries input rasters, a
truth raster, and a ``case_spec.json`` with expected metrics at precision 3.
The reference pins metrics produced by its released ONNX artifact; that
artifact is unreachable offline, so these cases pin the outputs of a
committed deterministic test artifact (seeded init) — same harness, same
gate: any numerical drift in the pipeline flips the rounded metrics.

Run from the repo root: ``JAX_PLATFORMS=cpu python bin/make_test_cases.py``
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import os

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# Goldens must be generated on the CPU backend (the environment may register
# a TPU plugin that overrides JAX_PLATFORMS).
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu"

from floodsr_tpu.eval import compute_depth_error_metrics  # noqa: E402
from floodsr_tpu.io import from_origin, read_raster, write_raster  # noqa: E402
from floodsr_tpu.nn import ResUNetConfig, init_resunet  # noqa: E402
from floodsr_tpu.nn.checkpoint import save_artifact  # noqa: E402
from floodsr_tpu.ops.normalize import replace_nodata_with_zero  # noqa: E402
from floodsr_tpu.tohr import tohr  # noqa: E402

DATA_DIR = REPO / "tests" / "data"
ARTIFACT_DIR = DATA_DIR / "_artifacts"
MODEL_SEED = 20260816
CRS = "EPSG:32633"
X0, Y0 = 500000.0, 4000000.0

TEST_MODEL_CFG = ResUNetConfig(
    base_filters=16,
    levels=2,
    enc_blocks=1,
    dec_blocks=1,
    fuse_filters=16,
    fuse_blocks=1,
    scale=4,
    lr_tile=8,
    # Pinned explicitly: the committed goldens were trained at hr_s2d=2;
    # regeneration must not drift with the flagship default.
    hr_s2d=2,
)


def _write(fp: Path, arr: np.ndarray, res: float, nodata=-9999.0) -> None:
    top = Y0 + arr.shape[0] * res
    write_raster(
        fp,
        np.asarray(arr, np.float32),
        {
            "height": arr.shape[0],
            "width": arr.shape[1],
            "count": 1,
            "dtype": "float32",
            "crs": CRS,
            "transform": from_origin(X0, top, res, res),
            "nodata": nodata,
            "compress": "LZW",
        },
    )


def _terrain(shape: tuple[int, int], seed: int) -> np.ndarray:
    rng = np.random.default_rng(np.random.Philox(seed))
    yy = np.linspace(0, 30, shape[0], dtype=np.float32)[:, None]
    xx = np.linspace(0, 20, shape[1], dtype=np.float32)[None, :]
    rough = np.cumsum(rng.normal(0, 0.3, shape).astype(np.float32), axis=1)
    rough -= rough.mean(axis=1, keepdims=True)
    return 250.0 + yy + xx + rough


def _truth_depth(dem: np.ndarray, seed: int, wse_offset: float = 6.0) -> np.ndarray:
    """Plausible truth: a sloping water surface minus terrain, clipped to [0, 5].

    Deterministic in the DEM (hydraulics-style): the HR truth is recoverable
    from the HR DEM + the coarse water surface, so a DEM-conditioned model can
    beat plain bilinear upsampling — the reference's headline quality claim.
    """
    del seed  # deterministic given the DEM
    wse = dem.mean() + wse_offset + np.linspace(-2, 2, dem.shape[1], dtype=np.float32)[None, :]
    depth = np.clip(wse - dem, 0.0, 5.0)
    return depth.astype(np.float32)


def _box_mean(arr: np.ndarray, k: int) -> np.ndarray:
    h, w = arr.shape
    return arr.reshape(h // k, k, w // k, k).mean(axis=(1, 3)).astype(np.float32)


def _make_model(train_steps: int = 6000) -> Path:
    """Train the committed test artifact on synthetic patches.

    Exercises the full training subsystem (deterministic split, augmentation,
    Adam+clipnorm train step, inference export) so the pinned goldens reflect
    a model that actually learned the task rather than random init.
    """
    from floodsr_tpu.train import PatchDataset, TrainConfig, init_train_state, make_train_step, split_indices
    from floodsr_tpu.train.trainer import export_inference_artifact

    ARTIFACT_DIR.mkdir(parents=True, exist_ok=True)

    # Build a synthetic patch set with the same statistics as the cases.
    n_scenes, k = 96, 4
    dems, truths, lrs = [], [], []
    for i in range(n_scenes):
        dem = _terrain((64, 64), seed=9000 + i)
        truth = _truth_depth(dem, seed=9000 + i)
        dems.append(dem)
        truths.append(truth)
        lrs.append(_box_mean(truth, k))
    # Cut each 64² scene into four 32² HR patches (8² LR).
    d_p, t_p, l_p = [], [], []
    for dem, truth, lr in zip(dems, truths, lrs):
        for y in (0, 32):
            for x in (0, 32):
                d_p.append(dem[y : y + 32, x : x + 32])
                t_p.append(truth[y : y + 32, x : x + 32])
                l_p.append(lr[y // k : y // k + 8, x // k : x // k + 8])
    dataset = PatchDataset(
        depth_lr=np.stack(l_p),
        dem_hr=np.stack(d_p),
        target_hr=np.stack(t_p),
    )
    train_idx, _ = split_indices(len(dataset), val_fraction=0.1, seed=MODEL_SEED)

    train_cfg = TrainConfig(total_steps=train_steps, base_lr=2e-3, second_lr=3e-4)
    state = init_train_state(MODEL_SEED, TEST_MODEL_CFG, train_cfg)
    step_fn = make_train_step(TEST_MODEL_CFG, train_cfg, donate=False)
    losses = []
    for batch in dataset.batches(
        train_idx, batch_size=16, seed=MODEL_SEED, augment=True, steps=train_steps
    ):
        state, metrics = step_fn(state, batch)
        losses.append(float(metrics["loss"]))
    print(f"trained test model: loss {losses[0]:.4f} -> {losses[-1]:.4f} ({len(losses)} steps)")

    fp = ARTIFACT_DIR / "model_infer_test.fsrz"
    export_inference_artifact(
        fp,
        state,
        TEST_MODEL_CFG,
        {"seed": MODEL_SEED, "purpose": "regression goldens", "train_steps": train_steps},
    )
    return fp


def _build_case(
    name: str,
    model_fp: Path,
    *,
    lr_shape: tuple[int, int],
    lr_res: float,
    dem_scale_px: int,
    seed: int,
    flags: dict,
    readme: str,
) -> None:
    case_dir = DATA_DIR / name
    case_dir.mkdir(parents=True, exist_ok=True)

    # DEM grid covers the LR bounds exactly at lr_res / dem_scale_px.
    dem_res = lr_res / dem_scale_px
    hr_shape = (lr_shape[0] * dem_scale_px, lr_shape[1] * dem_scale_px)
    dem = _terrain(hr_shape, seed)
    truth = _truth_depth(dem, seed)
    depth_lr = _box_mean(truth, dem_scale_px)

    lowres_fp = case_dir / f"lowres{int(lr_res):03d}.tif"
    dem_fp = case_dir / f"hires{int(round(dem_res)):03d}_dem.tif"
    truth_fp = case_dir / f"hires{int(round(dem_res)):03d}.tif"
    _write(lowres_fp, depth_lr, lr_res)
    _write(dem_fp, dem, dem_res)
    _write(truth_fp, truth, dem_res)

    # Run the pipeline once to pin golden metrics.
    out_fp = case_dir / "_golden_pred.tif"
    tohr(
        model_version="ResUNet_16x_DEM",
        model_fp=model_fp,
        depth_lr_fp=lowres_fp,
        dem_hr_fp=dem_fp,
        output_fp=out_fp,
    )
    pred, _, _ = read_raster(out_fp)
    truth_read, truth_nodata, _ = read_raster(truth_fp)
    truth_clean = replace_nodata_with_zero(truth_read, truth_nodata)
    metrics = compute_depth_error_metrics(truth_clean, pred, max_depth=5.0)
    out_fp.unlink()

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
        "flags": flags,
        "model_artifact": f"_artifacts/{model_fp.name}",
    }
    (case_dir / "case_spec.json").write_text(json.dumps(spec, indent=2))
    (case_dir / "readme.md").write_text(readme)
    print(
        f"{name}: mase={metrics['mase_m']:.4f} rmse={metrics['rmse_m']:.4f} "
        f"ssim={metrics['ssim']:.4f}"
    )


def main() -> int:
    model_fp = _make_model()
    # Single exact tile (analog of the reference's 2407_FHIMP_tile case).
    _build_case(
        "synth_single_tile",
        model_fp,
        lr_shape=(8, 8),
        lr_res=30.0,
        dem_scale_px=4,
        seed=101,
        flags={"in_hrdem": True, "non_native_scale": False, "allow_zero_border": False},
        readme=(
            "# synth_single_tile\n\nDeterministic single-tile regression case "
            "(8x8 LR -> 32x32 HR, exactly one model tile). Analog of the "
            "reference's 2407_FHIMP_tile. Generated by bin/make_test_cases.py "
            "with seed 101; model artifact tests/data/_artifacts.\n"
        ),
    )
    # Tiled + feathered scene (analog of rss_mersch_A).
    _build_case(
        "synth_mersch",
        model_fp,
        lr_shape=(32, 32),
        lr_res=30.0,
        dem_scale_px=4,
        seed=202,
        flags={"in_hrdem": False, "non_native_scale": False, "allow_zero_border": True},
        readme=(
            "# synth_mersch\n\nDeterministic tiled regression case (32x32 LR -> "
            "128x128 HR, feather windowing across a 4x4+overlap grid). Analog "
            "of the reference's rss_mersch_A. Seed 202.\n"
        ),
    )
    # Non-native scale: DEM finer than lr_res/scale -> post-resample path.
    _build_case(
        "synth_dudelange",
        model_fp,
        lr_shape=(16, 16),
        lr_res=30.0,
        dem_scale_px=5,  # raw DEM grid 80x80 (6 m) vs model space 64x64
        seed=303,
        flags={"in_hrdem": False, "non_native_scale": True, "allow_zero_border": True},
        readme=(
            "# synth_dudelange\n\nDeterministic non-native-scale regression "
            "case (16x16 LR at 30 m, DEM at 6 m -> raw 80x80 vs model-space "
            "64x64, exercising the post-resample path). Analog of the "
            "reference's rss_dudelange_A. Seed 303.\n"
        ),
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
