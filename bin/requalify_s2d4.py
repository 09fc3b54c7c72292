"""Long-budget hr_s2d quality study on the production patch distribution.

Trains a chosen ``--s2d`` config (default 4) on 512² crops of 1024²
synthetic hydraulic scenes — the same dataset the flagship golden trains
on — and evaluates meter-domain quality on a held-out split against
(a) bilinear and (b) the committed flagship golden artifact. Written to
requalify s2d4 after round-1's undertrained 1500-step rejection; also used
for the equal-budget s2d2 rematch (both entries live in
``docs/perf/flagship_study.json`` as ``configs.s2d{N}_long``; outcome
recorded in ADR-0007).

Run on the TPU host: ``python bin/requalify_s2d4.py --steps 5000 [--s2d 2]``.
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
sys.path.insert(0, str(REPO / "bin"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from train_flagship import (  # noqa: E402
    SEED,
    _cropped_patch_dataset,
    bilinear_up,
    eval_model,
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5000)
    ap.add_argument("--s2d", type=int, default=4)
    ap.add_argument("--save-artifact", action="store_true",
                    help="also export the trained s2d4 model to tests/data/_artifacts")
    args = ap.parse_args()

    from floodsr_tpu.eval.metrics import compute_depth_error_metrics
    from floodsr_tpu.nn import ResUNetConfig
    from floodsr_tpu.nn.checkpoint import load_artifact
    from floodsr_tpu.train import (
        TrainConfig,
        init_train_state,
        make_train_step,
        split_indices,
    )

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    scale = 16
    dataset = _cropped_patch_dataset(n_scenes=80, hr=1024, patch=512, scale=scale, seed0=31000)
    train_idx, val_idx = split_indices(len(dataset), val_fraction=0.1, seed=SEED)
    print(f"dataset: {len(train_idx)} train / {len(val_idx)} val patches", flush=True)

    bl_pred = np.stack([bilinear_up(dataset.depth_lr[i], scale) for i in val_idx])
    bl_truth = dataset.target_hr[val_idx]
    bl = compute_depth_error_metrics(
        reference_depth_m=bl_truth.reshape(-1, bl_truth.shape[-1]),
        estimate_depth_m=np.clip(bl_pred, 0, 5).reshape(-1, bl_pred.shape[-1]),
        max_depth=5.0,
    )
    baseline = {k: float(bl[k]) for k in ("mase_m", "rmse_m", "rmse_wet_m", "bias_m")}
    print("bilinear baseline:", {k: round(v, 4) for k, v in baseline.items()}, flush=True)

    # Committed flagship golden on the same val split (no retraining).
    golden_fp = REPO / "tests" / "data" / "_artifacts" / "model_infer_flagship.fsrz"
    golden_metrics = None
    if golden_fp.exists():
        art = load_artifact(golden_fp)
        golden_metrics, _ = eval_model(
            art["config"], jax.device_put(art["params"]), jax.device_put(art["state"]),
            dataset, val_idx, jnp.float32,
        )
        print("committed flagship golden:", {k: round(v, 4) for k, v in golden_metrics.items()}, flush=True)

    cfg = ResUNetConfig(hr_s2d=args.s2d)
    tcfg = TrainConfig(total_steps=args.steps, base_lr=4e-4, second_lr=8e-5)
    state = init_train_state(SEED, cfg, tcfg)
    step_fn = make_train_step(cfg, tcfg, donate=True)
    losses = []
    t0 = time.perf_counter()
    for bi, batch in enumerate(
        dataset.batches(train_idx, batch_size=8, seed=SEED + 2, augment=True, steps=args.steps)
    ):
        state, metrics = step_fn(state, batch)
        if bi % 200 == 0 or bi == args.steps - 1:
            loss = float(metrics["loss"])
            losses.append({"step": bi, "loss": loss})
            print(f"s2d{args.s2d} step {bi}: loss {loss:.5f}", flush=True)
    train_s = time.perf_counter() - t0
    print(f"trained s2d{args.s2d} in {train_s:.0f}s", flush=True)

    entry = {
        "steps": args.steps,
        "train_seconds": round(train_s, 1),
        "dataset": "cropped_1024_scenes",
        "loss_curve": losses,
        "eval": {},
        "baseline_bilinear": baseline,
        "committed_golden_same_split": golden_metrics,
    }
    for dtype_name, dtype in (("float32", jnp.float32), ("bfloat16", jnp.bfloat16)):
        m, _ = eval_model(cfg, state.params, state.model_state, dataset, val_idx, dtype)
        entry["eval"][dtype_name] = m
        print(f"s2d{args.s2d} {dtype_name}:", {k: round(v, 4) for k, v in m.items()}, flush=True)

    out_fp = REPO / "docs" / "perf" / "flagship_study.json"
    study = json.loads(out_fp.read_text()) if out_fp.exists() else {"configs": {}}
    study.setdefault("configs", {})[f"s2d{args.s2d}_long"] = entry
    out_fp.write_text(json.dumps(study, indent=1))
    print(f"wrote {out_fp}", flush=True)

    if args.save_artifact:
        from floodsr_tpu.train.trainer import export_inference_artifact

        fp = export_inference_artifact(
            REPO / "tests" / "data" / "_artifacts" / f"model_infer_s2d{args.s2d}.fsrz",
            state, cfg,
            {"seed": SEED, "purpose": f"s2d{args.s2d} requalification", "train_steps": args.steps},
            store_dtype="float16",
        )
        print(f"wrote {fp}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
