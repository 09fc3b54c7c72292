"""Training subsystem for the DEM-conditioned ResUNet.

The reference ships no training code — only a training-run summary in the
worker docstring (reference: ``floodsr/models/ResUNet_16x_DEM.py:28-34``):
Adam with ``clipnorm=1.0``, a piecewise-constant LR schedule (1e-4 → 5e-5 at
the halfway point), MAE loss, and PSNR/SSIM/RMSE/RMSE_wet/CSI metrics. This
module implements that recipe TPU-natively:

- one jitted train step (loss + grads + optax update + BN-state update);
- mesh-sharded execution: batch over ``dp``, parameters over ``tp`` via
  :mod:`floodsr_tpu.parallel.mesh` — XLA inserts the gradient reductions;
- checkpoint save/restore built on the ``.fsrz`` artifact container.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from pathlib import Path
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
import optax

from floodsr_tpu.eval.metrics import depth_metrics_jax
from floodsr_tpu.nn.checkpoint import load_artifact, save_artifact
from floodsr_tpu.nn.resunet import ResUNetConfig, init_resunet, resunet_apply
from floodsr_tpu.ops.normalize import invert_depth_log1p


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization hyperparameters (reference training-run summary)."""

    total_steps: int = 100_000
    base_lr: float = 1e-4
    second_lr: float = 5e-5
    clipnorm: float = 1.0
    max_depth: float = 5.0
    weight_decay: float = 0.0


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class TrainState:
    """Carried training state: step, params, BN state, optimizer state."""

    step: jnp.ndarray
    params: Any
    model_state: Any
    opt_state: Any

    def tree_flatten(self):
        return (self.step, self.params, self.model_state, self.opt_state), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """Adam + global-norm clipping + piecewise LR (1e-4 → 5e-5 halfway)."""
    schedule = optax.piecewise_constant_schedule(
        init_value=cfg.base_lr,
        boundaries_and_scales={cfg.total_steps // 2: cfg.second_lr / cfg.base_lr},
    )
    transforms = [
        optax.clip_by_global_norm(cfg.clipnorm),
        optax.adam(learning_rate=schedule),
    ]
    if cfg.weight_decay > 0:
        transforms.insert(1, optax.add_decayed_weights(cfg.weight_decay))
    return optax.chain(*transforms)


def init_train_state(
    seed: int, model_cfg: ResUNetConfig, train_cfg: TrainConfig
) -> TrainState:
    params, state = init_resunet(seed, model_cfg)
    optimizer = make_optimizer(train_cfg)
    opt_state = optimizer.init(params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        model_state=state,
        opt_state=opt_state,
    )


def mae_loss(
    params: Any,
    model_state: Any,
    depth_lr_norm: jnp.ndarray,
    dem_hr_norm: jnp.ndarray,
    target_hr_norm: jnp.ndarray,
    model_cfg: ResUNetConfig,
    compute_dtype=jnp.float32,
) -> tuple[jnp.ndarray, Any]:
    """MAE in normalized depth space (the reference's training loss)."""
    pred, new_state = resunet_apply(
        params,
        model_state,
        depth_lr_norm[..., None],
        dem_hr_norm[..., None],
        model_cfg,
        train=True,
        compute_dtype=compute_dtype,
    )
    loss = jnp.mean(jnp.abs(pred[..., 0] - target_hr_norm))
    return loss, new_state


def make_train_step(
    model_cfg: ResUNetConfig,
    train_cfg: TrainConfig,
    *,
    mesh=None,
    compute_dtype=jnp.float32,
    donate: bool = True,
):
    """Build the jitted train step ``(state, batch) -> (state, metrics)``.

    ``batch`` is ``{"depth_lr": [B,h,w], "dem_hr": [B,H,W], "target_hr":
    [B,H,W]}`` in normalized [0,1] space. With a mesh, the batch shards over
    ``dp`` and parameters follow :func:`param_sharding_rules`.
    """
    optimizer = make_optimizer(train_cfg)

    def step_fn(state: TrainState, batch: dict[str, jnp.ndarray]):
        (loss, new_model_state), grads = jax.value_and_grad(mae_loss, has_aux=True)(
            state.params,
            state.model_state,
            batch["depth_lr"],
            batch["dem_hr"],
            batch["target_hr"],
            model_cfg,
            compute_dtype,
        )
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            model_state=new_model_state,
            opt_state=new_opt_state,
        )
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
        }
        return new_state, metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    from jax.sharding import NamedSharding, PartitionSpec

    data = NamedSharding(mesh, PartitionSpec("dp"))
    repl = NamedSharding(mesh, PartitionSpec())
    batch_shardings = {"depth_lr": data, "dem_hr": data, "target_hr": data}
    return jax.jit(
        step_fn,
        in_shardings=(None, batch_shardings),
        out_shardings=(None, repl),
        donate_argnums=(0,) if donate else (),
    )


def stage_dataset_to_device(dataset, indices) -> dict[str, jnp.ndarray]:
    """Pre-normalize a patch set and upload it ONCE (HBM-resident data).

    On hosts where the device link is slow (this harness's axon tunnel moves
    4–35 MB/s, so a 16 MB batch costs ~0.5–4 s — 25× the train-step
    compute), per-step host feeding caps training throughput. Staging the
    normalized dataset device-side turns the feed into an on-device gather:
    measured 0.56 s/step → compute-bound. Per-patch DEM normalization (the
    tile-local stats the inference pipeline applies) commutes with the
    flip/rot augmentation, so normalizing once up front is exact.
    """
    d, m, t = [], [], []
    for i in np.asarray(indices):
        depth, dem, target = dataset._normalized_example(int(i))
        d.append(depth)
        m.append(dem)
        t.append(target)
    return {
        "depth_lr": jnp.asarray(np.stack(d)),
        "dem_hr": jnp.asarray(np.stack(m)),
        "target_hr": jnp.asarray(np.stack(t)),
    }


def _resident_step_body(model_cfg: ResUNetConfig, train_cfg: TrainConfig,
                        batch_size: int, compute_dtype):
    """Un-jitted resident step: sample + augment + train, all on device."""
    optimizer = make_optimizer(train_cfg)

    def rot_k(a, k):
        return jax.lax.switch(
            k,
            [lambda x, kk=kk: jnp.rot90(x, kk, axes=(1, 2)) for kk in range(4)],
            a,
        )

    def step_fn(state: TrainState, data: dict[str, jnp.ndarray], key):
        ki, kr, kf = jax.random.split(key, 3)
        n = data["depth_lr"].shape[0]
        idx = jax.random.randint(ki, (batch_size,), 0, n)
        k_rot = jax.random.randint(kr, (), 0, 4)
        flip = jax.random.bernoulli(kf)

        def tf(a):
            a = rot_k(a, k_rot)
            return jax.lax.cond(flip, lambda x: x[:, :, ::-1], lambda x: x, a)

        batch = {k: tf(v[idx]) for k, v in data.items()}
        (loss, new_model_state), grads = jax.value_and_grad(mae_loss, has_aux=True)(
            state.params,
            state.model_state,
            batch["depth_lr"],
            batch["dem_hr"],
            batch["target_hr"],
            model_cfg,
            compute_dtype,
        )
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            model_state=new_model_state,
            opt_state=new_opt_state,
        )
        return new_state, {"loss": loss, "grad_norm": optax.global_norm(grads)}

    return step_fn


def make_resident_train_step(
    model_cfg: ResUNetConfig,
    train_cfg: TrainConfig,
    *,
    batch_size: int,
    compute_dtype=jnp.float32,
):
    """Train step over a device-resident dataset: ``(state, data, key)``.

    Samples the batch, applies rot90/flip augmentation, and runs the
    standard step — all inside one jit region, no host↔device traffic per
    step beyond the PRNG key. ``data`` is :func:`stage_dataset_to_device`'s
    dict (passed as an argument, not a baked-in constant, so one executable
    serves any staged set of the same shape).
    """
    step_fn = _resident_step_body(model_cfg, train_cfg, batch_size, compute_dtype)
    return jax.jit(step_fn, donate_argnums=(0,))


def make_resident_train_loop(
    model_cfg: ResUNetConfig,
    train_cfg: TrainConfig,
    *,
    batch_size: int,
    steps_per_call: int,
    compute_dtype=jnp.float32,
):
    """``steps_per_call`` resident steps per dispatch: ``(state, data, key)``.

    On remote-tunnel hosts each dispatch costs a ~25 ms round trip, which
    caps single-step training at ~4 steps/s regardless of compute; scanning
    N steps inside one jit call amortizes the RTT to 1/N per step. Returns
    ``(new_state, losses[steps_per_call])``.
    """
    step_fn = _resident_step_body(model_cfg, train_cfg, batch_size, compute_dtype)

    def loop(state: TrainState, data: dict[str, jnp.ndarray], key):
        keys = jax.random.split(key, steps_per_call)

        def body(st, k):
            st, metrics = step_fn(st, data, k)
            return st, metrics["loss"]

        state, losses = jax.lax.scan(body, state, keys)
        return state, losses

    return jax.jit(loop, donate_argnums=(0,))


def make_eval_step(model_cfg: ResUNetConfig, train_cfg: TrainConfig, *, mesh=None):
    """Jitted eval step returning meter-domain quality metrics per batch."""

    def eval_fn(state: TrainState, batch: dict[str, jnp.ndarray]):
        pred, _ = resunet_apply(
            state.params,
            state.model_state,
            batch["depth_lr"][..., None],
            batch["dem_hr"][..., None],
            model_cfg,
            train=False,
        )
        pred_m = invert_depth_log1p(pred[..., 0], train_cfg.max_depth)
        target_m = invert_depth_log1p(batch["target_hr"], train_cfg.max_depth)
        metrics = depth_metrics_jax(target_m, pred_m, train_cfg.max_depth)
        return {k: jnp.mean(v) for k, v in metrics.items()}

    if mesh is None:
        return jax.jit(eval_fn)

    from jax.sharding import NamedSharding, PartitionSpec

    data = NamedSharding(mesh, PartitionSpec("dp"))
    batch_shardings = {"depth_lr": data, "dem_hr": data, "target_hr": data}
    return jax.jit(eval_fn, in_shardings=(None, batch_shardings))


# ---------------------------------------------------------------------------
# checkpointing
# ---------------------------------------------------------------------------


def save_train_state(
    fp: str | Path,
    state: TrainState,
    model_cfg: ResUNetConfig,
    metadata: dict | None = None,
) -> Path:
    """Persist a full training checkpoint (params + BN state + opt state)."""
    meta = dict(metadata or {})
    meta["train_step"] = int(state.step)
    host_state = jax.tree.map(np.asarray, state)
    return save_artifact(
        fp,
        model_cfg,
        {"params": host_state.params, "opt_state": host_state.opt_state},
        host_state.model_state,
        meta,
    )


def restore_train_state(fp: str | Path, train_cfg: TrainConfig) -> tuple[TrainState, ResUNetConfig]:
    """Restore a training checkpoint saved by :func:`save_train_state`."""
    artifact = load_artifact(fp)
    payload = artifact["params"]
    step = int(artifact["manifest"]["metadata"].get("train_step", 0))
    state = TrainState(
        step=jnp.asarray(step, jnp.int32),
        params=payload["params"],
        model_state=artifact["state"],
        opt_state=payload["opt_state"],
    )
    return state, artifact["config"]


def export_inference_artifact(
    fp: str | Path,
    state: TrainState,
    model_cfg: ResUNetConfig,
    metadata: dict | None = None,
    *,
    store_dtype: str | None = None,
) -> Path:
    """Export an inference-only ``.fsrz`` (params + BN state, no opt state)."""
    host = jax.tree.map(np.asarray, state)
    return save_artifact(
        fp, model_cfg, host.params, host.model_state, metadata or {},
        store_dtype=store_dtype,
    )
