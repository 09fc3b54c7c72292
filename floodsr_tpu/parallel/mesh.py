"""Device-mesh construction and sharding rules.

The reference is strictly sequential (SURVEY.md §2: no parallelism of any
kind); this module is the TPU-native scale-out layer. Two mesh axes:

- ``dp`` (data): shards the tile batch / training batch. Collectives ride ICI
  (gradient psum under ``jax.jit`` with sharded inputs).
- ``tp`` (tensor): shards convolution output channels (and the matching BN
  parameters), giving a model-parallel option for wide configs.

Everything is expressed with ``jax.sharding.NamedSharding`` + ``jax.jit`` so
XLA inserts the collectives; no hand-written NCCL-style plumbing.
"""

from __future__ import annotations

from typing import Any

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def make_mesh(
    n_devices: int | None = None,
    *,
    dp: int | None = None,
    tp: int = 1,
    devices=None,
) -> Mesh:
    """Build a ``(dp, tp)`` mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    assert n_devices <= len(devices), (
        f"requested {n_devices} devices but only {len(devices)} available"
    )
    if dp is None:
        assert n_devices % tp == 0, f"n_devices={n_devices} not divisible by tp={tp}"
        dp = n_devices // tp
    assert dp * tp == n_devices, f"dp*tp={dp * tp} != n_devices={n_devices}"
    grid = np.asarray(devices[:n_devices]).reshape(dp, tp)
    return Mesh(grid, axis_names=("dp", "tp"))


def parse_mesh_spec(spec: str) -> Mesh:
    """Build a mesh from a CLI-style spec string.

    Accepted forms (user-facing via ``--mesh``):

    - ``"auto"``  — all visible devices, pure data parallel (tp=1)
    - ``"4"``     — first 4 devices, pure data parallel
    - ``"dp=4"`` / ``"dp=4,tp=2"`` — explicit axis sizes

    Raises ``ValueError`` with the accepted grammar on anything else (a CLI
    flag must not surface an assertion).
    """
    text = str(spec).strip().lower()
    if not text:
        raise ValueError("empty --mesh spec")
    available = len(jax.devices())
    if text == "auto":
        return make_mesh()
    if text.isdigit():
        dp, tp = int(text), 1
    else:
        dp = None
        tp = 1
        for part in text.split(","):
            key, _, value = part.partition("=")
            key = key.strip()
            if key not in ("dp", "tp") or not value.strip().isdigit():
                raise ValueError(
                    f"bad --mesh spec '{spec}'; expected 'auto', a device "
                    "count, or axis sizes like 'dp=4' / 'dp=4,tp=2'"
                )
            if key == "dp":
                dp = int(value)
            else:
                tp = int(value)
        if dp is None:
            if tp < 1 or available % tp != 0:
                raise ValueError(
                    f"--mesh '{spec}': {available} visible devices not "
                    f"divisible by tp={tp}"
                )
            dp = available // tp
    if dp < 1 or tp < 1:
        raise ValueError(f"--mesh '{spec}': axis sizes must be >= 1")
    n_devices = dp * tp
    if n_devices > available:
        raise ValueError(
            f"--mesh '{spec}' needs {n_devices} devices but only "
            f"{available} are visible"
        )
    return make_mesh(n_devices, dp=dp, tp=tp)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dimension over ``dp``."""
    return NamedSharding(mesh, PartitionSpec("dp"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def param_sharding_rules(mesh: Mesh, params: Any) -> Any:
    """Per-leaf NamedSharding tree: conv kernels shard out-channels over ``tp``.

    A leaf's last dimension is sharded over ``tp`` when divisible by the axis
    size (conv ``w``/``b``, BN vectors); anything else is replicated. With
    ``tp=1`` this is full replication (pure data parallelism).
    """
    tp = mesh.shape["tp"]

    def rule(leaf):
        shape = np.shape(leaf)
        if tp > 1 and len(shape) >= 1 and shape[-1] % tp == 0 and shape[-1] >= tp:
            spec = (None,) * (len(shape) - 1) + ("tp",)
            return NamedSharding(mesh, PartitionSpec(*spec))
        return NamedSharding(mesh, PartitionSpec())

    return jax.tree.map(rule, params)


def shard_pytree(mesh: Mesh, tree: Any, shardings: Any | None = None) -> Any:
    """Place a pytree on the mesh with the given (or rule-derived) shardings."""
    if shardings is None:
        shardings = param_sharding_rules(mesh, tree)
    return jax.tree.map(lambda x, s: jax.device_put(x, s), tree, shardings)
