"""DEM-conditioned 16× ResUNet in functional JAX (flax-free pytree params).

Architecture family per the reference worker docstring
(reference: ``floodsr/models/ResUNet_16x_DEM.py:5-34``):

- inputs ``depth_lr [N,h,w,1]`` and ``dem_hr [N,h*s,w*s,1]``, NHWC float;
- ``dem_hr`` average-pooled to LR and concatenated with ``depth_lr`` as the
  encoder input;
- a 4-level UNet encoder/decoder with residual blocks per scale and channel
  widths ``f,2f,4f,8f,16f``;
- transposed-conv ``scale``× upsample back to HR;
- the HR feature map re-fused with ``dem_hr`` before a 1-channel linear head.

The exact residual-block layout of the released reference model exists only
inside its ONNX graph (12,045,568 parameters; not recoverable from the repo).
This implementation uses pre-activation residual blocks with 2 blocks per
stage at ``base_filters=32`` (≈16.1M parameters — a capacity superset with
MXU-friendly channel counts). The per-artifact ``manifest.json`` records the
config, so checkpoints converted from other graphs carry their own shape.

Design notes (TPU):
- all convs are NHWC/HWIO ``lax.conv_general_dilated`` — XLA lowers these onto
  the MXU and fuses the BN-affine/ReLU chains between them;
- batch norm is functional: trainable ``scale``/``offset`` live in ``params``,
  moving ``mean``/``var`` in a separate ``state`` tree (haiku-style), so the
  whole model stays a pytree and shards trivially under ``pjit``;
- compute dtype is configurable (bf16 inference path keeps the head in f32).
"""

from __future__ import annotations

import dataclasses
import math
import os
from functools import partial
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ResUNetConfig:
    """Architecture hyperparameters, serialized into model artifacts."""

    base_filters: int = 32
    levels: int = 4              # downsampling stages after stage 0
    enc_blocks: int = 2          # residual blocks per encoder stage
    dec_blocks: int = 2          # residual blocks per decoder stage
    fuse_filters: int = 32       # channels of the DEM feature conv at HR
    fuse_blocks: int = 2         # residual blocks after DEM re-fusion
    scale: int = 16              # HR/LR ratio
    lr_tile: int = 32            # LR tile edge the artifact was trained for
    bn_eps: float = 1e-3         # Keras default, matching reference training
    bn_momentum: float = 0.99
    # HR-stage space-to-depth factor. 97% of this network's MACs sit in the
    # HR fuse/upsample stages, which at 32 channels use ~25% of the MXU's
    # 128 lanes. With hr_s2d=s those stages run at (H/s)² with s·f channels
    # (DEM fused via space-to-depth, head emits s² channels reshaped back
    # up) — same function family, far better MXU utilization. s2d=4 (128
    # channels — full lanes) is the default: measured v5e scene throughput
    # 91 MP/s f32-strict vs 48 at s2d=2 (docs/perf/), and held-out quality
    # BEATS the s2d=2 config when trained to its budget
    # (docs/perf/flagship_study.json `s2d4_long`: rmse 0.368 vs 0.637 for
    # s2d2@1500 and 0.684 bilinear; round-1's s2d4 rejection was an
    # undertrained 1500-step run). Set 1 for the reference-prose layout
    # (full-resolution HR fusion).
    hr_s2d: int = 4

    @property
    def hr_tile(self) -> int:
        return self.lr_tile * self.scale

    @property
    def widths(self) -> tuple[int, ...]:
        f = self.base_filters
        return tuple(f * (2**i) for i in range(self.levels + 1))

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @staticmethod
    def from_dict(payload: dict) -> "ResUNetConfig":
        fields = {f.name for f in dataclasses.fields(ResUNetConfig)}
        return ResUNetConfig(**{k: v for k, v in payload.items() if k in fields})


# ---------------------------------------------------------------------------
# initialization
# ---------------------------------------------------------------------------


def _he_conv(rng: np.random.Generator, kh, kw, cin, cout) -> Params:
    # Numpy-side init: deterministic, and avoids per-op JAX dispatch during
    # construction (costly on slow-compile hosts).
    fan_in = kh * kw * cin
    std = math.sqrt(2.0 / fan_in)
    w = (rng.standard_normal((kh, kw, cin, cout)) * std).astype(np.float32)
    return {"w": w, "b": np.zeros((cout,), np.float32)}


def _bn_init(c: int) -> tuple[Params, Params]:
    params = {"scale": np.ones((c,), np.float32), "offset": np.zeros((c,), np.float32)}
    state = {"mean": np.zeros((c,), np.float32), "var": np.ones((c,), np.float32)}
    return params, state


def _res_block_init(rng: np.random.Generator, cin: int, cout: int) -> tuple[Params, Params]:
    bn1_p, bn1_s = _bn_init(cin)
    bn2_p, bn2_s = _bn_init(cout)
    params: Params = {
        "bn1": bn1_p,
        "conv1": _he_conv(rng, 3, 3, cin, cout),
        "bn2": bn2_p,
        "conv2": _he_conv(rng, 3, 3, cout, cout),
    }
    state: Params = {"bn1": bn1_s, "bn2": bn2_s}
    if cin != cout:
        params["proj"] = _he_conv(rng, 1, 1, cin, cout)
    return params, state


def init_resunet(seed, cfg: ResUNetConfig) -> tuple[Params, Params]:
    """Initialize ``(params, state)`` pytrees (numpy leaves) for the network.

    ``seed`` may be an int or a ``jax.random`` key (its data is hashed to an
    int), so both styles of call sites work.
    """
    if hasattr(seed, "dtype") and not isinstance(seed, int):
        seed = int(np.asarray(jax.random.key_data(seed)).ravel()[-1])
    rng = np.random.default_rng(np.random.Philox(int(seed)))
    params: Params = {}
    state: Params = {}

    params["stem"] = _he_conv(rng, 3, 3, 2, cfg.base_filters)

    enc_p, enc_s = [], []
    cin = cfg.base_filters
    for w in cfg.widths:
        blocks_p, blocks_s = [], []
        for _ in range(cfg.enc_blocks):
            bp, bs = _res_block_init(rng, cin, w)
            blocks_p.append(bp)
            blocks_s.append(bs)
            cin = w
        enc_p.append(blocks_p)
        enc_s.append(blocks_s)
    params["enc"], state["enc"] = enc_p, enc_s

    dec_p, dec_s = [], []
    for w in reversed(cfg.widths[:-1]):
        stage_p: Params = {"up": _he_conv(rng, 2, 2, cin, w)}
        stage_s: Params = {}
        cin = 2 * w  # skip concat
        blocks_p, blocks_s = [], []
        for _ in range(cfg.dec_blocks):
            bp, bs = _res_block_init(rng, cin, w)
            blocks_p.append(bp)
            blocks_s.append(bs)
            cin = w
        stage_p["blocks"], stage_s["blocks"] = blocks_p, blocks_s
        dec_p.append(stage_p)
        dec_s.append(stage_s)
    params["dec"], state["dec"] = dec_p, dec_s

    # scale× SR upsample as two transposed convs of stride sqrt(scale). With
    # hr_s2d > 1 the second stage stops s2d× short of HR and the HR stages run
    # at reduced resolution with proportionally more channels.
    s2d = int(cfg.hr_s2d)
    assert cfg.scale % s2d == 0, f"hr_s2d={s2d} must divide scale={cfg.scale}"
    s0, s1 = _split_scale(cfg.scale // s2d)
    hr_width = cfg.base_filters * s2d
    params["sr_up1"] = _he_conv(rng, s0, s0, cin, cfg.base_filters)
    params["sr_up2"] = _he_conv(rng, s1, s1, cfg.base_filters, hr_width)

    params["dem_feat"] = _he_conv(rng, 3, 3, s2d * s2d, cfg.fuse_filters)
    fuse_p, fuse_s = [], []
    cin = hr_width + cfg.fuse_filters
    for _ in range(cfg.fuse_blocks):
        bp, bs = _res_block_init(rng, cin, hr_width)
        fuse_p.append(bp)
        fuse_s.append(bs)
        cin = hr_width
    params["fuse"], state["fuse"] = fuse_p, fuse_s

    params["head"] = _he_conv(rng, 1, 1, hr_width, s2d * s2d)
    return params, state


def _split_scale(scale: int) -> tuple[int, int]:
    """Split an integer upsampling factor into two transposed-conv strides."""
    root = int(round(math.sqrt(scale)))
    if root * root == scale:
        return root, root
    for a in range(root + 1, scale + 1):
        if scale % a == 0:
            return a, scale // a
    return scale, 1


def count_params(params: Params) -> int:
    return int(sum(np.prod(x.shape) for x in jax.tree.leaves(params)))


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _precision_for(dtype) -> lax.Precision:
    # On TPU the DEFAULT matmul/conv precision multiplies in bfloat16 even for
    # float32 operands (measured 0.047 m TPU-vs-CPU output RMSE through this
    # network — 47× the ≤1e-3 m parity gate). The float32 path pins HIGH
    # (bf16x3 passes, ~1e-5 relative; measured TPU-vs-CPU RMSE well inside the
    # gate at ~2× the speed of HIGHEST); the explicit bfloat16 path keeps the
    # fast single-pass default.
    return lax.Precision.HIGH if dtype == jnp.float32 else lax.Precision.DEFAULT


# -- per-stage precision policies -------------------------------------------
#
# The parity gate (≤1e-3 m RMSE vs the CPU float32 reference) applies to the
# PIPELINE OUTPUT, not to per-layer numerics — and the measured error budget
# is spread across stages (docs/perf/precision_study.json: bf16 tail alone
# 4.4e-3 m, bf16 trunk alone 2.4e-3, sr_up alone 9.5e-4 — only the full-f32
# policy passes). A policy assigns each stage an operand dtype;
# matmul/conv precision follows the dtype (_precision_for: f32 → bf16x3
# "HIGH" MXU passes, bf16 → one pass). Stage boundaries cast activations.

PRECISION_STAGES = ("trunk", "sr_up", "tail", "head")

#: named policies (head stays f32 in every one — it is ~0.3% of MACs and
#: anchors the meter-domain output). Measured pipeline parity vs the CPU f32
#: reference (docs/perf/precision_study.json):
#:   f32    — every stage f32/HIGH: 3.3e-5 m, the ONLY gate-passing policy
#:            and therefore the default
#:   bf16   — body single-pass bf16 (fast; FAILS the 1e-3 m gate: 5.2e-3)
#:   mixed  — trunk+sr_up bf16, tail f32/HIGH: FAILS the gate at 2.4e-3 —
#:            the bf16 trunk alone costs 2.36e-3, refuting the hypothesis
#:            that the error budget was tail-dominated; kept as an opt-in
#:            (it buys almost nothing: 111 vs 114 ms/scene)
PRECISION_POLICIES: dict[str, dict[str, str]] = {
    "f32": {"trunk": "f32", "sr_up": "f32", "tail": "f32", "head": "f32"},
    "bf16": {"trunk": "bf16", "sr_up": "bf16", "tail": "bf16", "head": "f32"},
    "mixed": {"trunk": "bf16", "sr_up": "bf16", "tail": "f32", "head": "f32"},
}


def resolve_precision_policy(
    policy: "str | dict | None" = None,
    compute_dtype=None,
) -> dict[str, Any]:
    """Normalize a policy spec into ``{stage: jnp dtype}``.

    ``policy`` may be a named policy, a ``{stage: "bf16"|"f32"}`` dict
    (missing stages default to the ``f32`` policy), or ``None`` — in which
    case ``compute_dtype`` picks the matching uniform policy (back-compat
    with the single-knob API).
    """
    if policy is None:
        policy = "bf16" if compute_dtype == jnp.bfloat16 else "f32"
    if isinstance(policy, str):
        assert policy in PRECISION_POLICIES, (
            f"unknown precision policy '{policy}'; "
            f"known: {sorted(PRECISION_POLICIES)}"
        )
        spec = PRECISION_POLICIES[policy]
    else:
        unknown = set(policy) - set(PRECISION_STAGES)
        assert not unknown, f"unknown precision stages {sorted(unknown)}"
        spec = {**PRECISION_POLICIES["f32"], **policy}
    lut = {"bf16": jnp.bfloat16, "f32": jnp.float32}
    out = {}
    for stage in PRECISION_STAGES:
        v = spec[stage]
        assert v in lut, f"stage '{stage}': dtype must be bf16|f32, got {v!r}"
        out[stage] = lut[v]
    assert out["head"] == jnp.float32, "head stage must stay float32"
    return out


def _conv(p: Params, x: jnp.ndarray, stride: int = 1) -> jnp.ndarray:
    w = p["w"].astype(x.dtype)
    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
        precision=_precision_for(x.dtype),
    )
    return (out + p["b"]).astype(x.dtype)


def _conv_transpose(p: Params, x: jnp.ndarray, stride: int) -> jnp.ndarray:
    w = p["w"].astype(x.dtype)
    if w.shape[0] == stride and w.shape[1] == stride:
        # kernel == stride: output windows don't overlap, so the transposed
        # conv is exactly one matmul + depth-to-space —
        # out[n, y·s+dy, x·s+dx, co] = Σ_ci x[n,y,x,ci] · w[s-1-dy, s-1-dx, ci, co]
        # (lax.conv_transpose stamps the kernel spatially flipped).
        # XLA lowers lax.conv_transpose as an input-dilated conv whose
        # multiplies are ≥75% zeros at these strides; the matmul form feeds
        # the MXU only real work (measured on the profile's trunk share).
        n, h, wd, ci = x.shape
        co = w.shape[-1]
        wm = w[::-1, ::-1].transpose(2, 0, 1, 3).reshape(ci, stride * stride * co)
        out = lax.dot_general(
            x.reshape(n * h * wd, ci),
            wm,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_precision_for(x.dtype),
        )
        out = (
            out.reshape(n, h, wd, stride, stride, co)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(n, h * stride, wd * stride, co)
        )
    else:
        out = lax.conv_transpose(
            x,
            w,
            strides=(stride, stride),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
            precision=_precision_for(x.dtype),
        )
    return (out + p["b"]).astype(x.dtype)


def _batch_norm(
    p: Params,
    s: Params,
    x: jnp.ndarray,
    *,
    eps: float,
    momentum: float,
    train: bool,
) -> tuple[jnp.ndarray, Params]:
    if train:
        mean = jnp.mean(x, axis=(0, 1, 2))
        var = jnp.var(x, axis=(0, 1, 2))
        new_state = {
            "mean": momentum * s["mean"] + (1 - momentum) * mean.astype(jnp.float32),
            "var": momentum * s["var"] + (1 - momentum) * var.astype(jnp.float32),
        }
    else:
        mean, var = s["mean"], s["var"]
        new_state = s
    inv = lax.rsqrt(var.astype(jnp.float32) + eps)
    scale = (p["scale"] * inv).astype(x.dtype)
    offset = (p["offset"] - p["scale"] * mean * inv).astype(x.dtype)
    return x * scale + offset, new_state


def _res_block(
    p: Params,
    s: Params,
    x: jnp.ndarray,
    cfg: ResUNetConfig,
    *,
    stride: int = 1,
    train: bool = False,
) -> tuple[jnp.ndarray, Params]:
    bn = partial(_batch_norm, eps=cfg.bn_eps, momentum=cfg.bn_momentum, train=train)
    y, bn1_s = bn(p["bn1"], s["bn1"], x)
    y = jax.nn.relu(y)
    y = _conv(p["conv1"], y, stride=stride)
    y, bn2_s = bn(p["bn2"], s["bn2"], y)
    y = jax.nn.relu(y)
    y = _conv(p["conv2"], y)
    if "proj" in p:
        shortcut = _conv(p["proj"], x, stride=stride)
    elif stride != 1:
        shortcut = x[:, ::stride, ::stride, :]
    else:
        shortcut = x
    return y + shortcut, {"bn1": bn1_s, "bn2": bn2_s}


def _pallas_tail_eligible(params: Params, cfg: ResUNetConfig, h: int, train: bool) -> bool:
    """Whether the fused Pallas HR-tail kernel covers this configuration."""
    return (
        not train
        and cfg.fuse_blocks == 2
        and "proj" in params["fuse"][0]
        and "proj" not in params["fuse"][1]
        and h % 8 == 0
        and h >= 16
    )


def resunet_apply(
    params: Params,
    state: Params,
    depth_lr: jnp.ndarray,
    dem_hr: jnp.ndarray,
    cfg: ResUNetConfig,
    *,
    train: bool = False,
    compute_dtype: jnp.dtype = jnp.float32,
    pallas_tail: bool | None = None,
    precision: "str | dict | None" = None,
) -> tuple[jnp.ndarray, Params]:
    """Forward pass: normalized inputs ``[N,h,w,1]``/``[N,H,W,1]`` → ``[N,H,W,1]``.

    Returns ``(prediction, new_state)``; ``new_state`` equals ``state`` in
    inference mode. Head math runs in float32 regardless of ``compute_dtype``.

    ``precision``: per-stage precision policy (see
    :func:`resolve_precision_policy`) — a named policy (``"f32"``/``"bf16"``/
    ``"mixed"``) or a ``{stage: "bf16"|"f32"}`` dict. ``None`` derives the
    uniform policy from ``compute_dtype`` (back-compat single knob).

    ``pallas_tail``: run the DEM-fusion residual blocks + head as the fused
    Pallas VMEM kernel (:mod:`floodsr_tpu.ops.pallas.hr_tail`). ``None`` =
    auto (TPU backend, float32, eligible config); ``True`` forces it (tests
    use interpret mode off-TPU); ``False`` disables.
    """
    out, trunk_state = resunet_trunk_apply(
        params, state, depth_lr, dem_hr, cfg,
        train=train, compute_dtype=compute_dtype, precision=precision,
    )
    out, tail_state = resunet_tail_apply(
        params, state, out, dem_hr, cfg,
        train=train, compute_dtype=compute_dtype, precision=precision,
        pallas_tail=pallas_tail,
    )
    return out, {**trunk_state, **tail_state}


def resunet_trunk_apply(
    params: Params,
    state: Params,
    depth_lr: jnp.ndarray,
    dem_hr: jnp.ndarray,
    cfg: ResUNetConfig,
    *,
    train: bool = False,
    compute_dtype: jnp.dtype = jnp.float32,
    precision: "str | dict | None" = None,
) -> tuple[jnp.ndarray, Params]:
    """Trunk half: stem + UNet encoder/decoder → LR-resolution features.

    Returns ``([N,h,w,base_filters]`` features in the trunk stage dtype,
    ``{"enc","dec"}`` state)``. Split out so the scene executor can batch the
    trunk far wider than the HR tail (the trunk's tiny spatial dims leave the
    MXU latency-bound at tail-sized chunks); ``resunet_apply`` composes the
    halves and is bit-identical to the previous fused formulation.
    """
    if depth_lr.ndim != 4 or dem_hr.ndim != 4:
        raise AssertionError(
            f"inputs must be rank-4 NHWC; got {depth_lr.shape} and {dem_hr.shape}"
        )
    divisor = 2**cfg.levels
    if depth_lr.shape[1] % divisor or depth_lr.shape[2] % divisor:
        raise AssertionError(
            f"LR spatial dims {depth_lr.shape[1:3]} must be divisible by "
            f"2^levels={divisor} for the UNet skip shapes to line up"
        )
    stage_dtype = resolve_precision_policy(precision, compute_dtype)
    x_dtype = stage_dtype["trunk"]
    depth_lr = depth_lr.astype(x_dtype)
    dem_hr = dem_hr.astype(x_dtype)

    # DEM pooled to LR and fused with depth as the encoder input. The s×s
    # box mean runs as reshape + mean, not lax.reduce_window — measured
    # 0.85 ms vs 3.58 ms per 8-tile chunk on v5e for the same result
    # (max diff 5e-7); reduce_window's generic windowed lowering is the
    # wrong tool for an aligned non-overlapping box.
    s = cfg.scale
    n_, hh_, ww_, c_ = dem_hr.shape
    dem_lr = dem_hr.reshape(n_, hh_ // s, s, ww_ // s, s, c_).mean(axis=(2, 4))
    x = jnp.concatenate([depth_lr, dem_lr.astype(x_dtype)], axis=-1)
    x = _conv(params["stem"], x)

    new_state: Params = {"enc": [], "dec": []}
    skips = []
    for stage, (blocks_p, blocks_s) in enumerate(zip(params["enc"], state["enc"])):
        stage_states = []
        for bi, (bp, bs) in enumerate(zip(blocks_p, blocks_s)):
            stride = 2 if (stage > 0 and bi == 0) else 1
            x, ns = _res_block(bp, bs, x, cfg, stride=stride, train=train)
            stage_states.append(ns)
        new_state["enc"].append(stage_states)
        if stage < len(params["enc"]) - 1:
            skips.append(x)

    for stage_p, stage_s, skip in zip(params["dec"], state["dec"], reversed(skips)):
        x = _conv_transpose(stage_p["up"], x, stride=2)
        x = jnp.concatenate([x, skip], axis=-1)
        stage_states = []
        for bp, bs in zip(stage_p["blocks"], stage_s["blocks"]):
            x, ns = _res_block(bp, bs, x, cfg, train=train)
            stage_states.append(ns)
        new_state["dec"].append({"blocks": stage_states})
    return x, new_state


def resunet_tail_apply(
    params: Params,
    state: Params,
    trunk_feat: jnp.ndarray,
    dem_hr: jnp.ndarray,
    cfg: ResUNetConfig,
    *,
    train: bool = False,
    compute_dtype: jnp.dtype = jnp.float32,
    precision: "str | dict | None" = None,
    pallas_tail: bool | None = None,
) -> tuple[jnp.ndarray, Params]:
    """Tail half: SR upsample + DEM re-fusion + head → HR prediction.

    ``trunk_feat`` is :func:`resunet_trunk_apply`'s output; ``dem_hr`` is the
    same normalized HR DEM the trunk saw (it re-enters here at the TAIL's
    precision — taken from the un-rounded input so a bf16 trunk does not
    degrade the tail's DEM conditioning). Returns ``(prediction_f32,
    {"fuse"} state)``.
    """
    stage_dtype = resolve_precision_policy(precision, compute_dtype)
    new_state: Params = {"fuse": []}
    s2d = int(cfg.hr_s2d)
    s0, s1 = _split_scale(cfg.scale // s2d)
    x = trunk_feat.astype(stage_dtype["sr_up"])
    x = _conv_transpose(params["sr_up1"], x, stride=s0)
    x = jax.nn.relu(x)
    x = _conv_transpose(params["sr_up2"], x, stride=s1)
    x = jax.nn.relu(x)

    tail_dtype = stage_dtype["tail"]
    x = x.astype(tail_dtype)
    dem_tail = dem_hr.astype(tail_dtype)
    if s2d > 1:
        # HR stages at (H/s2d)² with s2d²-packed DEM channels (space-to-depth).
        n, hh, ww, _ = dem_tail.shape
        dem_in = (
            dem_tail.reshape(n, hh // s2d, s2d, ww // s2d, s2d, 1)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(n, hh // s2d, ww // s2d, s2d * s2d)
        )
    else:
        dem_in = dem_tail
    dem_feat = jax.nn.relu(_conv(params["dem_feat"], dem_in))

    tail_h = x.shape[1]
    if pallas_tail is None:
        # Default OFF: stock XLA wins the composition A/B on v5e at every
        # measured config (s2d4 b16 f32: 19.96 ms XLA vs 20.53 ms fused;
        # bf16: 11.14 vs 11.90; scene f32: 154.6 vs 161.3 ms — see
        # docs/perf/kernel_study.json). The fused kernel wins the tail in
        # isolation (12.97 vs 13.36 ms) but XLA's fusion across the tail
        # boundary more than makes up the difference. Kept as an explicit
        # opt-in (pallas_tail=True) with exactness pinned in tests.
        pallas_tail = False
    if pallas_tail:
        assert _pallas_tail_eligible(params, cfg, tail_h, train), (
            "pallas_tail requested but config/shape not eligible"
        )
        from floodsr_tpu.ops.pallas.hr_tail import hr_tail_pallas, pack_hr_tail_weights

        weights = pack_hr_tail_weights(
            {"params": params["fuse"][0], "state": state["fuse"][0]},
            {"params": params["fuse"][1], "state": state["fuse"][1]},
            params["head"],
            bn_eps=cfg.bn_eps,
        )
        # Study knob (bin/hr_tail_study.py sweeps it). Validated: a leaked
        # or mistyped value must degrade to the auto band, not crash
        # production inference inside the kernel's divisibility asserts.
        # Read at trace time — like the formulation env, a change after the
        # caller's executor is trace-cached has no effect.
        band = 0
        band_env = os.environ.get("FLOODSR_HR_TAIL_BAND")
        if band_env:
            try:
                band = int(band_env)
            except ValueError:
                band = 0
            if band <= 0 or band % 8 or tail_h % band:
                band = 0
        if not band:
            band = 32 if tail_h % 32 == 0 else (16 if tail_h % 16 == 0 else 8)
        out = hr_tail_pallas(
            x,
            dem_feat,
            *weights,
            band=band,
            interpret=jax.default_backend() != "tpu",
            # bf16 tail → single-pass MXU taps; f32 tail → bf16x3 (HIGH).
            mode="bf16" if tail_dtype == jnp.bfloat16 else None,
        )
        new_state["fuse"] = [bs for bs in state["fuse"]]
    else:
        x = jnp.concatenate([x, dem_feat], axis=-1)
        for bp, bs in zip(params["fuse"], state["fuse"]):
            x, ns = _res_block(bp, bs, x, cfg, train=train)
            new_state["fuse"].append(ns)
        out = _conv(params["head"], x.astype(jnp.float32))
    if s2d > 1:
        # depth-to-space back to full HR resolution, single channel.
        n, hh, ww, _ = out.shape
        out = (
            out.reshape(n, hh, ww, s2d, s2d, 1)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(n, hh * s2d, ww * s2d, 1)
        )
    return out.astype(jnp.float32), new_state
