"""Pallas TPU kernel: the ResUNet HR tail fused into one VMEM pass.

The flagship network spends its HBM bandwidth in the HR stages
(``nn/resunet.py``: DEM re-fusion + 2 pre-activation residual blocks + 1×1
head at (H/s2d)² × 2f channels). Under XLA each conv round-trips its
activations through HBM — ~1.2 GB per 8-tile chunk at the flagship geometry
— while the arithmetic is tiny by MXU standards. This kernel computes

    x   = concat(sr_features, dem_features)            [B, H, W, Ca+Cb]
    y1  = resblock(x)  : conv3x3(relu(bn1 x)) -> conv3x3(relu(bn2 ·)) + proj(x)
    y2  = resblock(y1) : same, identity shortcut
    out = y2 @ w_head + b_head                          [B, H, W, Ch]

entirely in VMEM per row-band: inputs are read once (plus an 8-row halo
band), the only HBM write is the small head output. Convolutions are 9
tap-accumulated MXU matmuls per layer (``[rows·W, Cin] @ [Cin, Cout]``);
column shifts are in-register ``pltpu.roll`` + edge masks (SAME zero
padding), row halos come from extra block views with clamped index maps
(same pattern as :mod:`floodsr_tpu.ops.pallas.costgrow_stencil`).

Numerics match the unfused path at f32 (same BN-affine folding as inference
``_batch_norm``; tap matmuls accumulate in f32). Exactness is pinned by
tests in interpret mode; TPU A/B numbers land in ``docs/perf/``.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO = 8  # rows per halo view above/below (covers the 4-row stencil reach)

# Packed weight order (kernel positional args after the 6 feature views).
WEIGHT_KEYS = (
    "f1_a1", "f1_c1", "f1_w1", "f1_b1", "f1_a2", "f1_c2", "f1_w2", "f1_b2",
    "f1_pw", "f1_pb",
    "f2_a1", "f2_c1", "f2_w1", "f2_b1", "f2_a2", "f2_c2", "f2_w2", "f2_b2",
    "head_w", "head_b",
)


def _shift_cols(arr: jnp.ndarray, s: int) -> jnp.ndarray:
    """out[..., c, :] = arr[..., c+s, :] with zero fill (SAME padding)."""
    if s == 0:
        return arr
    w = arr.shape[-2]
    rolled = pltpu.roll(arr, (-s) % w, axis=arr.ndim - 2)
    col = jax.lax.broadcasted_iota(jnp.int32, arr.shape, arr.ndim - 2)
    mask = (col >= w - s) if s > 0 else (col < -s)
    return jnp.where(mask, 0.0, rolled)


# MXU multiply precision for the f32 tap matmuls. DEFAULT (Mosaic's only
# other option besides full-fp32 HIGHEST) multiplies in single-pass bfloat16
# even for float32 operands — the exact TPU behavior the unfused path pins
# against in ``nn/resunet.py::_precision_for`` (measured 0.047 m output
# divergence through this network). Mosaic does not lower Precision.HIGH, so
# the bf16x3 error-compensated product (what HIGH means on TPU:
# hi·hi + hi·lo + lo·hi) is built here explicitly from three DEFAULT-precision
# MXU passes. ``FLOODSR_HR_TAIL_PRECISION=highest`` switches to Mosaic's
# native fp32 contract for A/B runs.
def _dot(a: jnp.ndarray, b: jnp.ndarray, mode: str) -> jnp.ndarray:
    if mode == "f32":
        # Exact float32 (interpret mode / CPU correctness tests).
        return jnp.dot(a, b, preferred_element_type=jnp.float32)
    if mode == "highest":
        return jnp.dot(
            a, b,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    if mode == "bf16":
        return jnp.dot(
            a.astype(jnp.bfloat16),
            b.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    if mode == "x2":
        # Study mode: two-pass product (drops the activation-low term).
        # Parity margin vs the gate is recorded in docs/perf/kernel_study.json.
        a = a.astype(jnp.float32)
        b = b.astype(jnp.float32)
        a_hi = a.astype(jnp.bfloat16)
        b_hi = b.astype(jnp.bfloat16)
        b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        d = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
        return d(a_hi, b_hi) + d(a_hi, b_lo)
    assert mode == "x3", mode
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    d = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    return d(a_hi, b_hi) + d(a_hi, b_lo) + d(a_lo, b_hi)


def _im2col(x: jnp.ndarray, rows: int, width: int) -> jnp.ndarray:
    """9-tap expansion: [R, W, C] -> [rows*W, 9C], (ky, kx)-major tap blocks.

    SAME zero padding in W comes from one explicit pad; each tap is then a
    static slice (single relayout copy — cheaper than roll+iota+select).
    """
    zero = jnp.zeros((x.shape[0], 1, x.shape[2]), x.dtype)
    xp = jnp.concatenate([zero, x, zero], axis=1)
    taps = []
    for ky in range(3):
        for kx in range(3):
            taps.append(
                xp[ky : ky + rows, kx : kx + width].reshape(rows * width, -1)
            )
    return jnp.concatenate(taps, axis=1)


def _conv3x3(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, mode: str) -> jnp.ndarray:
    """[R, W, Cin] -> [R-2, W, Cout]; SAME zero pad in W, VALID in rows.

    One im2col matmul per MXU pass ([rows·W, 9·Cin] @ [9·Cin, Cout]) instead
    of nine tap matmuls: the 9× longer contraction keeps the systolic array
    pipelined, and the bf16 hi/lo split happens once per tensor rather than
    once per tap (27→1 VPU splits per conv). ``w.reshape(9C, Cout)``'s row
    order (ky, kx, c) matches the tap-block order of :func:`_im2col`.
    """
    rows = x.shape[0] - 2
    width = x.shape[1]
    c = x.shape[2]
    cout = w.shape[-1]
    wm = w.reshape(9 * c, cout)
    d = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    if mode == "x3":
        # Split into the bf16 hi/lo pair once, im2col each half (bf16 pads
        # and slices are fine — only tpu.dynamic_rotate is 32-bit-limited).
        x = x.astype(jnp.float32)
        x_hi = x.astype(jnp.bfloat16)
        x_lo = (x - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        hi = _im2col(x_hi, rows, width)
        lo = _im2col(x_lo, rows, width)
        wm = wm.astype(jnp.float32)
        w_hi = wm.astype(jnp.bfloat16)
        w_lo = (wm - w_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = d(hi, w_hi) + d(hi, w_lo) + d(lo, w_hi)
    elif mode == "bf16":
        # Fast path: single MXU pass on the bf16-cast taps.
        hi = _im2col(x.astype(jnp.bfloat16), rows, width)
        acc = d(hi, wm.astype(jnp.bfloat16))
    elif mode == "x2":
        # Study mode: keep weight hi/lo, drop the activation-low pass.
        hi = _im2col(x.astype(jnp.float32).astype(jnp.bfloat16), rows, width)
        wm = wm.astype(jnp.float32)
        w_hi = wm.astype(jnp.bfloat16)
        w_lo = (wm - w_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = d(hi, w_hi) + d(hi, w_lo)
    elif mode == "highest":
        acc = jnp.dot(
            _im2col(x, rows, width), wm,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    else:
        assert mode == "f32", mode
        acc = d(_im2col(x, rows, width), wm)
    return (acc + b.astype(jnp.float32)).reshape(rows, width, cout)


def _hr_tail_kernel(*refs, band: int, total_rows: int, mode: str):
    (a_up, a_mid, a_dn, d_up, d_mid, d_dn) = refs[:6]
    w = dict(zip(WEIGHT_KEYS, refs[6:-1]))
    out_ref = refs[-1]

    # Assemble the x band with 4-row halos from the 8-row halo views.
    def band_with_halo(up, mid, dn):
        return jnp.concatenate([up[0][HALO - 4 :], mid[0], dn[0][:4]], axis=0)

    xa = band_with_halo(a_up, a_mid, a_dn)
    xd = band_with_halo(d_up, d_mid, d_dn)
    x = jnp.concatenate([xa, xd], axis=-1).astype(jnp.float32)
    width = x.shape[1]
    cin = x.shape[2]

    i = pl.program_id(1)
    row0 = i * band - 4  # absolute image row of x's first band row

    def affine_relu(v, a, c, abs_start):
        """BN-affine + ReLU, zeroed on out-of-image rows.

        The zeroing implements SAME zero padding at the image top/bottom:
        the padding enters each conv AFTER the activation (relu(c) != 0),
        so it must be applied per activation, at that tensor's own row
        offset within the band.
        """
        out = jnp.maximum(v * a + c, 0.0)
        row = jax.lax.broadcasted_iota(jnp.int32, (v.shape[0], 1, 1), 0) + abs_start
        return jnp.where((row >= 0) & (row < total_rows), out, 0.0)

    # fuse block 1 (projection shortcut): rows band+8 -> band+4
    t = affine_relu(x, w["f1_a1"][:], w["f1_c1"][:], row0)
    y = _conv3x3(t, w["f1_w1"][:], w["f1_b1"][:], mode)
    t = affine_relu(y, w["f1_a2"][:], w["f1_c2"][:], row0 + 1)
    y = _conv3x3(t, w["f1_w2"][:], w["f1_b2"][:], mode)
    cm = y.shape[-1]
    shortcut_in = x[2:-2].reshape((band + 4) * width, cin)
    proj = _dot(shortcut_in, w["f1_pw"][:], mode) + w["f1_pb"][:]
    y1 = y + proj.reshape(band + 4, width, cm)

    # fuse block 2 (identity shortcut): rows band+4 -> band
    t = affine_relu(y1, w["f2_a1"][:], w["f2_c1"][:], row0 + 2)
    y = _conv3x3(t, w["f2_w1"][:], w["f2_b1"][:], mode)
    t = affine_relu(y, w["f2_a2"][:], w["f2_c2"][:], row0 + 3)
    y = _conv3x3(t, w["f2_w2"][:], w["f2_b2"][:], mode)
    y2 = y + y1[2:-2]

    # head (1x1) — stays high-precision even in bf16 mode, matching the
    # unfused path's bf16-body/f32-head policy (ADR-0005).
    head_mode = "x3" if mode == "bf16" else mode
    out = _dot(y2.reshape(band * width, cm), w["head_w"][:], head_mode) + w["head_b"][:]
    out_ref[0] = out.reshape(band, width, -1)


def pack_hr_tail_weights(f1: dict, f2: dict, head: dict, *, bn_eps: float):
    """Fold BN stats and order the fuse/head parameters for the kernel.

    ``f1``/``f2`` carry ``{"params": ..., "state": ...}`` shaped like
    ``nn/resunet.py`` residual blocks (``f1`` must have a ``proj``); ``head``
    is the 1×1 conv param dict. Returns the weight list in
    :data:`WEIGHT_KEYS` order.
    """

    def affine(bn_p, bn_s):
        inv = jax.lax.rsqrt(bn_s["var"].astype(jnp.float32) + bn_eps)
        a = bn_p["scale"] * inv
        c = bn_p["offset"] - bn_p["scale"] * bn_s["mean"] * inv
        return a.astype(jnp.float32), c.astype(jnp.float32)

    def block(blk, with_proj):
        p, s = blk["params"], blk["state"]
        a1, c1 = affine(p["bn1"], s["bn1"])
        a2, c2 = affine(p["bn2"], s["bn2"])
        out = [
            a1, c1, p["conv1"]["w"], p["conv1"]["b"],
            a2, c2, p["conv2"]["w"], p["conv2"]["b"],
        ]
        if with_proj:
            out += [p["proj"]["w"][0, 0], p["proj"]["b"]]
        return out

    ws = block(f1, True) + block(f2, False) + [head["w"][0, 0], head["b"]]
    return [jnp.asarray(v, jnp.float32) for v in ws]


def hr_tail_pallas(
    sr_feat: jnp.ndarray,
    dem_feat: jnp.ndarray,
    *weights: jnp.ndarray,
    band: int = 32,
    interpret: bool = False,
    mode: str | None = None,
) -> jnp.ndarray:
    """Fused concat+resblock×2+head over NHWC features; returns [B,H,W,Ch].

    ``mode`` selects the MXU multiply precision for the f32 matmuls (see
    :func:`_dot`): ``"x3"`` (default on hardware — bf16x3, the semantics of
    ``lax.Precision.HIGH`` that the unfused XLA path pins), ``"bf16"``
    (single pass, f32 head), ``"highest"`` (Mosaic native fp32 contract),
    ``"x2"`` (two-pass study mode), or ``"f32"`` (plain dots — exact under
    interpret mode, where Mosaic precision attributes don't apply).
    """
    # Resolve the env-var default OUTSIDE the jit boundary: inside, the
    # first trace's value would stick in the cache for every later call
    # with mode=None.
    if mode is None:
        mode = "f32" if interpret else os.environ.get(
            "FLOODSR_HR_TAIL_PRECISION", "x3"
        )
    if mode == "f32" and not interpret:
        raise AssertionError(
            "mode='f32' is exact only under interpret mode; on hardware a "
            "plain f32 dot runs Mosaic's DEFAULT single-pass bf16 multiply "
            "(the exact silent-precision-loss this kernel guards against). "
            "Use 'x3' (HIGH semantics) or 'highest'."
        )
    return _hr_tail_pallas_jit(
        sr_feat, dem_feat, *weights, band=band, interpret=interpret, mode=mode
    )


@functools.partial(jax.jit, static_argnames=("band", "interpret", "mode"))
def _hr_tail_pallas_jit(
    sr_feat: jnp.ndarray,
    dem_feat: jnp.ndarray,
    *weights: jnp.ndarray,
    band: int,
    interpret: bool,
    mode: str,
) -> jnp.ndarray:
    assert sr_feat.ndim == 4 and dem_feat.ndim == 4
    assert band % HALO == 0, f"band {band} must be a multiple of {HALO}"
    assert len(weights) == len(WEIGHT_KEYS), len(weights)
    b, h, width, ca = sr_feat.shape
    cb = dem_feat.shape[-1]
    ch = weights[WEIGHT_KEYS.index("head_b")].shape[0]
    if h % band:
        raise AssertionError(f"height {h} not divisible by band {band}")
    n_bands = h // band
    halo_blocks_per_band = band // HALO

    def mid(bi, ri):
        return (bi, ri, 0, 0)

    def up(bi, ri):
        return (bi, jnp.maximum(ri * halo_blocks_per_band - 1, 0), 0, 0)

    def dn(bi, ri):
        return (
            bi,
            jnp.minimum(
                ri * halo_blocks_per_band + halo_blocks_per_band, h // HALO - 1
            ),
            0,
            0,
        )

    def views(c):
        return [
            pl.BlockSpec((1, HALO, width, c), up, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, band, width, c), mid, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HALO, width, c), dn, memory_space=pltpu.VMEM),
        ]

    kernel = functools.partial(_hr_tail_kernel, band=band, total_rows=h, mode=mode)
    return pl.pallas_call(
        kernel,
        grid=(b, n_bands),
        in_specs=[
            *views(ca),
            *views(cb),
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in WEIGHT_KEYS],
        ],
        out_specs=pl.BlockSpec((1, band, width, ch), mid, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, width, ch), jnp.float32),
        # The fused intermediates (x/t/y per layer at band+halo rows) live on
        # the kernel's scoped-VMEM stack; the 16 MiB default rejects the
        # flagship geometry. v5e has 128 MiB VMEM per core — allow most of it.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        sr_feat.astype(jnp.float32), sr_feat.astype(jnp.float32), sr_feat.astype(jnp.float32),
        dem_feat.astype(jnp.float32), dem_feat.astype(jnp.float32), dem_feat.astype(jnp.float32),
        *weights,
    )


def hr_tail_available() -> bool:
    return jax.default_backend() == "tpu"
