"""Training example: fit the DEM-conditioned ResUNet on synthetic patches.

The reference ships no training code (only a run summary in its worker
docstring); this demonstrates the full floodsr-tpu training loop — dataset,
deterministic split, augmentation, sharded train/eval steps, checkpointing,
and inference-artifact export.

Run: ``python examples/train_model.py [steps]``
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from floodsr_tpu.nn import ResUNetConfig
from floodsr_tpu.train import (
    PatchDataset,
    TrainConfig,
    init_train_state,
    make_eval_step,
    make_train_step,
    split_indices,
)
from floodsr_tpu.train.trainer import export_inference_artifact, save_train_state


def synthetic_patches(n: int, lr_tile: int, scale: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    hr = lr_tile * scale
    dem = 250 + np.cumsum(rng.normal(0, 0.3, (n, hr, hr)).astype(np.float32), axis=2)
    wse = dem.mean(axis=(1, 2), keepdims=True) + 4.0
    truth = np.clip(wse - dem, 0, 5).astype(np.float32)
    depth_lr = truth.reshape(n, lr_tile, scale, lr_tile, scale).mean(axis=(2, 4))
    return depth_lr, dem, truth


def main() -> int:
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    model_cfg = ResUNetConfig(
        base_filters=8, levels=2, enc_blocks=1, dec_blocks=1,
        fuse_filters=8, fuse_blocks=1, scale=4, lr_tile=8,
    )
    train_cfg = TrainConfig(total_steps=steps, base_lr=1e-3)

    depth_lr, dem, truth = synthetic_patches(64, model_cfg.lr_tile, model_cfg.scale)
    dataset = PatchDataset(depth_lr=depth_lr, dem_hr=dem, target_hr=truth)
    train_idx, val_idx = split_indices(len(dataset), val_fraction=0.15, seed=0)

    state = init_train_state(0, model_cfg, train_cfg)
    train_step = make_train_step(model_cfg, train_cfg, donate=False)
    eval_step = make_eval_step(model_cfg, train_cfg)

    for i, batch in enumerate(
        dataset.batches(train_idx, batch_size=8, seed=0, augment=True, steps=steps)
    ):
        state, metrics = train_step(state, batch)
        if i % max(1, steps // 10) == 0:
            print(f"step {int(state.step):4d} loss={float(metrics['loss']):.4f} "
                  f"grad_norm={float(metrics['grad_norm']):.3f}")

    val_batch = next(iter(dataset.batches(val_idx, batch_size=len(val_idx), steps=1)))
    val_metrics = eval_step(state, val_batch)
    print("validation:", {k: round(float(v), 4) for k, v in val_metrics.items()})

    out_dir = Path(tempfile.mkdtemp())
    ckpt_fp = save_train_state(out_dir / "train_ckpt.fsrz", state, model_cfg)
    infer_fp = export_inference_artifact(out_dir / "model_infer.fsrz", state, model_cfg)
    print(f"checkpoint: {ckpt_fp}\ninference artifact: {infer_fp}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
