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
band), the only HBM write is the small head output. Row halos come from
extra block views with clamped index maps (same pattern as
:mod:`floodsr_tpu.ops.pallas.costgrow_stencil`).

Two convolution formulations are selectable (``formulation=``):

- ``"im2col"`` (round-2/3 shape): each conv is one long-contraction MXU
  matmul ``[rows·W, 9·Cin] @ [9·Cin, Cout]`` over a materialized 9-tap
  expansion. Pipelines the systolic array well but pays a large VMEM
  relayout (the im2col matrix is 9× the activation bytes, per bf16 half).
- ``"preshift"`` (round-4): each bf16 half of the activation is
  materialized exactly twice more (one copy per column shift, shared
  across the three row taps); row taps are then free leading-dim slices of
  contiguous arrays, so the 9 taps feed the MXU directly as
  ``[rows·W, Cin] @ [Cin, Cout]`` accumulated in f32. ~4× less VMEM
  relayout traffic at the same MAC count.
- ``"winograd"`` (round-4): F(2×2, 3×3) Winograd — 2.25× fewer MXU MACs.
  Weights are transformed to the 16-position domain at trace time
  (``G g Gᵀ``); inputs are transformed in-kernel with phase
  (even/odd-polyphase) reshapes + static slices (no strided loads), each
  position runs one ``[nH·nW, Cin] @ [Cin, Cout]`` matmul per bf16 pass,
  and the 2×2 outputs accumulate through the ±1 inverse transform.
  ``docs/perf/ceiling.md`` §3b rejected an XLA-level Winograd on HBM
  traffic; this VMEM-resident form has no such traffic. Transforms are
  exact in f32 (G's halves are exact in binary; Bᵀ/Aᵀ are ±1 sums), so
  the bf16×3 product error grows only ~1.7× vs the direct conv
  (measured; parity-gate margin is ~2.6×).

Numerics match the unfused path at f32 (same BN-affine folding as inference
``_batch_norm``; tap matmuls accumulate in f32) and are formulation-
independent up to f32 summation order. Exactness is pinned by tests in
interpret mode; TPU A/B numbers land in ``docs/perf/``.
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

# Weights that feed MXU matmuls. In the bf16-pass modes these are split into
# (hi, lo) bf16 pairs OUTSIDE the kernel — one tiny XLA op at trace time
# instead of a VPU split re-run on every band of every tile.
MATMUL_KEYS = frozenset({"f1_w1", "f1_w2", "f1_pw", "f2_w1", "f2_w2", "head_w"})


def _weight_is_paired(key: str, mode: str) -> bool:
    """Whether this weight ships as a (hi, lo) pair for ``mode``.

    x3/x2 consume both halves of every matmul weight. Single-pass bf16
    consumes only hi — shipping lo would DMA a dead tensor HBM→VMEM every
    band — EXCEPT the head, which stays at x3 precision in bf16 mode
    (ADR-0005 bf16-body/f32-head policy).
    """
    if key not in MATMUL_KEYS:
        return False
    if mode in ("x3", "x2"):
        return True
    return mode == "bf16" and key == "head_w"

FORMULATIONS = ("im2col", "preshift", "winograd")


def _split_hi_lo(v: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    v = v.astype(jnp.float32)
    hi = v.astype(jnp.bfloat16)
    lo = (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


# MXU multiply precision for the f32 tap matmuls. DEFAULT (Mosaic's only
# other option besides full-fp32 HIGHEST) multiplies in single-pass bfloat16
# even for float32 operands — the exact TPU behavior the unfused path pins
# against in ``nn/resunet.py::_precision_for`` (measured 0.047 m output
# divergence through this network). Mosaic does not lower Precision.HIGH, so
# the bf16x3 error-compensated product (what HIGH means on TPU:
# hi·hi + hi·lo + lo·hi) is built here explicitly from three DEFAULT-precision
# MXU passes. ``FLOODSR_HR_TAIL_PRECISION=highest`` switches to Mosaic's
# native fp32 contract for A/B runs.
#
# ``w`` is the f32 weight in "f32"/"highest" modes and a pre-split
# ``(w_hi, w_lo)`` bf16 pair in the bf16-pass modes.
def _dot(a: jnp.ndarray, w, mode: str) -> jnp.ndarray:
    d = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    if mode == "f32":
        # Exact float32 (interpret mode / CPU correctness tests).
        return d(a, w)
    if mode == "highest":
        return jnp.dot(
            a, w,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    if mode == "bf16":
        # Single-pass: only the hi half is consumed; the pre-split ships a
        # bare bf16 weight (no dead lo half riding HBM→VMEM every band).
        w_hi = w[0] if isinstance(w, tuple) else w
        return d(a.astype(jnp.bfloat16), w_hi)
    w_hi, w_lo = w
    if mode == "x2":
        # Study mode: two-pass product (drops the activation-low term, so
        # a_lo is never computed). Parity margin vs the gate is recorded in
        # docs/perf/kernel_study.json.
        a_hi = a.astype(jnp.float32).astype(jnp.bfloat16)
        return d(a_hi, w_hi) + d(a_hi, w_lo)
    assert mode == "x3", mode
    a_hi, a_lo = _split_hi_lo(a)
    return d(a_hi, w_hi) + d(a_hi, w_lo) + d(a_lo, w_hi)


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


def _conv3x3_im2col(x: jnp.ndarray, w, b: jnp.ndarray, mode: str) -> jnp.ndarray:
    """[R, W, Cin] -> [R-2, W, Cout]; SAME zero pad in W, VALID in rows.

    One im2col matmul per MXU pass ([rows·W, 9·Cin] @ [9·Cin, Cout]) instead
    of nine tap matmuls: the 9× longer contraction keeps the systolic array
    pipelined, and the bf16 hi/lo split happens once per tensor rather than
    once per tap. ``w``'s reshape row order (ky, kx, c) matches the
    tap-block order of :func:`_im2col`.
    """
    rows = x.shape[0] - 2
    width = x.shape[1]
    d = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    if mode in ("f32", "highest"):
        cout = w.shape[-1]
        wm = w.reshape(9 * x.shape[2], cout)
        if mode == "highest":
            acc = jnp.dot(
                _im2col(x, rows, width), wm,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        else:
            acc = d(_im2col(x, rows, width), wm)
        return (acc + b.astype(jnp.float32)).reshape(rows, width, cout)
    w_hi = w[0] if isinstance(w, tuple) else w
    cout = w_hi.shape[-1]
    wm_hi = w_hi.reshape(9 * x.shape[2], cout)
    if mode == "bf16":
        # Fast path: single MXU pass on the bf16-cast taps (hi-only weight).
        acc = d(_im2col(x.astype(jnp.bfloat16), rows, width), wm_hi)
    else:
        # Split into the bf16 hi/lo pair once, im2col each half (bf16 pads
        # and slices are fine — only tpu.dynamic_rotate is 32-bit-limited).
        wm_lo = w[1].reshape(9 * x.shape[2], cout)
        if mode == "x2":
            hi = _im2col(x.astype(jnp.float32).astype(jnp.bfloat16), rows, width)
            acc = d(hi, wm_hi) + d(hi, wm_lo)
        else:
            assert mode == "x3", mode
            x_hi, x_lo = _split_hi_lo(x)
            hi = _im2col(x_hi, rows, width)
            lo = _im2col(x_lo, rows, width)
            acc = d(hi, wm_hi) + d(hi, wm_lo) + d(lo, wm_hi)
    return (acc + b.astype(jnp.float32)).reshape(rows, width, cout)


def _shifted_copies(a: jnp.ndarray, width: int) -> list[jnp.ndarray]:
    """[kx] -> column-shifted tensors: out[kx][r, c, :] = a[r, c + kx - 1].

    One W-pad concat, two materialized slice copies; the center tap reuses
    ``a`` itself. SAME zero padding in W falls out of the pad.
    """
    zero = jnp.zeros((a.shape[0], 1, a.shape[2]), a.dtype)
    xp = jnp.concatenate([zero, a, zero], axis=1)
    return [xp[:, 0:width], a, xp[:, 2 : 2 + width]]


def _conv3x3_preshift(x: jnp.ndarray, w, b: jnp.ndarray, mode: str) -> jnp.ndarray:
    """[R, W, Cin] -> [R-2, W, Cout]; 9 tap matmuls on pre-shifted copies.

    Each bf16 half is materialized 3× total (original + one copy per column
    shift, shared across the 3 row taps); the row taps are contiguous
    leading-dim slices, so every tap matmul reads VMEM without further
    relayout. Accumulation is a flat f32 sum of all tap/pass products;
    the summation order differs from the im2col matmul's (which sums taps
    inside each pass's matmul accumulator), so the formulations agree only
    to f32 rounding of the tap partials (~1e-4 at unit-scale activations).
    """
    rows = x.shape[0] - 2
    width = x.shape[1]
    c = x.shape[2]
    d = functools.partial(jnp.dot, preferred_element_type=jnp.float32)

    if mode in ("f32", "highest"):
        halves = [x.astype(jnp.float32)]
        cout = w.shape[-1]

        def passes(ky, kx):
            wk = w[ky, kx]
            if mode == "highest":
                return [
                    lambda a, wk=wk: jnp.dot(
                        a, wk,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                ]
            return [lambda a, wk=wk: d(a, wk)]

        pass_half = [0]
    else:
        w_hi = w[0] if isinstance(w, tuple) else w
        cout = w_hi.shape[-1]
        if mode == "bf16":
            halves = [x.astype(jnp.bfloat16)]

            def passes(ky, kx):
                return [lambda a, wk=w_hi[ky, kx]: d(a, wk)]

            pass_half = [0]
        else:
            w_lo = w[1]
            if mode == "x2":
                halves = [x.astype(jnp.float32).astype(jnp.bfloat16)]

                def passes(ky, kx):
                    return [
                        lambda a, wk=w_hi[ky, kx]: d(a, wk),
                        lambda a, wk=w_lo[ky, kx]: d(a, wk),
                    ]

                pass_half = [0, 0]
            else:
                assert mode == "x3", mode
                x_hi, x_lo = _split_hi_lo(x)
                halves = [x_hi, x_lo]

                def passes(ky, kx):
                    return [
                        lambda a, wk=w_hi[ky, kx]: d(a, wk),
                        lambda a, wk=w_lo[ky, kx]: d(a, wk),
                        lambda a, wk=w_hi[ky, kx]: d(a, wk),
                    ]

                pass_half = [0, 0, 1]

    shifted = [_shifted_copies(a, width) for a in halves]
    acc = None
    for ky in range(3):
        for kx in range(3):
            for fn, hi_ix in zip(passes(ky, kx), pass_half):
                a = shifted[hi_ix][kx][ky : ky + rows].reshape(rows * width, c)
                t = fn(a)
                acc = t if acc is None else acc + t
    return (acc + b.astype(jnp.float32)).reshape(rows, width, cout)


def winograd_transform_weights(w: jnp.ndarray) -> jnp.ndarray:
    """``[3,3,Cin,Cout]`` → ``[16,Cin,Cout]``: ``U = G g Gᵀ`` per channel pair.

    Trace-time (outside the kernel). G's entries are {0, ±0.5, 1} — the
    halves are exact in binary floating point, so the transform itself adds
    no rounding beyond f32 addition.
    """
    g = jnp.asarray(
        [[1.0, 0.0, 0.0], [0.5, 0.5, 0.5], [0.5, -0.5, 0.5], [0.0, 0.0, 1.0]],
        jnp.float32,
    )
    u = jnp.einsum("ap,pqio,bq->abio", g, w.astype(jnp.float32), g)
    return u.reshape(16, w.shape[2], w.shape[3])


# Inverse-transform coefficients Aᵀ (F(2×2,3×3)): output row/col p takes
# winograd positions a with these ±1 weights; zeros are skipped entirely.
_AT = ((1, 1, 1, 0), (0, 1, -1, -1))


def _conv3x3_winograd(x: jnp.ndarray, u, b: jnp.ndarray, mode: str) -> jnp.ndarray:
    """[R, W, Cin] -> [R-2, W, Cout] via F(2×2, 3×3).

    ``u`` is the trace-time-transformed weight: ``[16, Cin, Cout]`` f32 in
    the f32/highest modes, a ``(hi, lo)`` bf16 pair of that shape otherwise.
    2.25× fewer MXU multiplies than the direct formulations; the input
    transform is pure VPU adds over polyphase (even/odd) views built with
    reshapes + static slices. Requires even R and W.
    """
    rr, width, c = x.shape
    ro = rr - 2
    assert ro % 2 == 0 and width % 2 == 0, (rr, width)
    nh, nw = ro // 2, width // 2
    x = x.astype(jnp.float32)

    # SAME zero padding in W; xp has 2·(nw+1) columns, split into even/odd
    # column phases so every Bᵀ column slice is a static slice (no strided
    # loads in Mosaic).
    zero = jnp.zeros((rr, 1, c), jnp.float32)
    xp = jnp.concatenate([zero, x, zero], axis=1)  # [R, 2(nw+1), C]
    ph = xp.reshape(rr, nw + 1, 2, c)
    ce, co = ph[:, :, 0], ph[:, :, 1]  # even/odd column phases [R, nw+1, C]
    s0, s1, s2, s3 = ce[:, :nw], co[:, :nw], ce[:, 1:], co[:, 1:]
    # Column transform (Bᵀ · over the kx dim): [R, nw, C] each.
    t_cols = (s0 - s2, s1 + s2, s2 - s1, s1 - s3)

    cout = (u[0] if isinstance(u, tuple) else u).shape[-1]
    y_acc: list[list] = [[None, None], [None, None]]
    for b_ in range(4):
        # Row phases of this column-transformed tensor: R = 2(nh+1) rows.
        rph = t_cols[b_].reshape(nh + 1, 2, nw, c)
        re, ro_ = rph[:, 0], rph[:, 1]  # [nh+1, nw, C]
        p0, p1, p2, p3 = re[:nh], ro_[:nh], re[1:], ro_[1:]
        v_rows = (p0 - p2, p1 + p2, p2 - p1, p1 - p3)
        for a in range(4):
            k = a * 4 + b_
            wk = (u[0][k], u[1][k]) if isinstance(u, tuple) else u[k]
            m = _dot(v_rows[a].reshape(nh * nw, c), wk, mode)
            for p in range(2):
                ca = _AT[p][a]
                if ca == 0:
                    continue
                for q in range(2):
                    cq = _AT[q][b_]
                    if cq == 0:
                        continue
                    t = m if ca * cq == 1 else -m
                    y_acc[p][q] = t if y_acc[p][q] is None else y_acc[p][q] + t

    # Interleave the 2×2 output phases back to [ro, W, Cout]: columns first
    # ([nh, nw, 2, C] reshape), then rows ([nh, 2, W, C] reshape).
    def col_interleave(y0, y1):
        z = jnp.stack(
            [y0.reshape(nh, nw, cout), y1.reshape(nh, nw, cout)], axis=2
        )
        return z.reshape(nh, width, cout)

    z0 = col_interleave(y_acc[0][0], y_acc[0][1])
    z1 = col_interleave(y_acc[1][0], y_acc[1][1])
    out = jnp.stack([z0, z1], axis=1).reshape(ro, width, cout)
    return out + b.astype(jnp.float32)


def _conv3x3(x, w, b, mode: str, formulation: str) -> jnp.ndarray:
    if formulation == "preshift":
        return _conv3x3_preshift(x, w, b, mode)
    if formulation == "winograd":
        return _conv3x3_winograd(x, w, b, mode)
    assert formulation == "im2col", formulation
    return _conv3x3_im2col(x, w, b, mode)


def _hr_tail_kernel(*refs, band: int, total_rows: int, mode: str, formulation: str):
    (a_up, a_mid, a_dn, d_up, d_mid, d_dn) = refs[:6]
    wrefs = refs[6:-1]
    out_ref = refs[-1]
    # Reassemble the weight dict: matmul weights arrive as (hi, lo) pairs in
    # the bf16-pass modes (pre-split at trace time), single refs otherwise.
    w: dict = {}
    it = iter(wrefs)
    for k in WEIGHT_KEYS:
        if _weight_is_paired(k, mode):
            w[k] = (next(it)[:], next(it)[:])
        else:
            w[k] = next(it)[:]

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

    conv = functools.partial(_conv3x3, mode=mode, formulation=formulation)

    # fuse block 1 (projection shortcut): rows band+8 -> band+4
    t = affine_relu(x, w["f1_a1"], w["f1_c1"], row0)
    y = conv(t, w["f1_w1"], w["f1_b1"])
    t = affine_relu(y, w["f1_a2"], w["f1_c2"], row0 + 1)
    y = conv(t, w["f1_w2"], w["f1_b2"])
    cm = y.shape[-1]
    shortcut_in = x[2:-2].reshape((band + 4) * width, cin)
    proj = _dot(shortcut_in, w["f1_pw"], mode) + w["f1_pb"]
    y1 = y + proj.reshape(band + 4, width, cm)

    # fuse block 2 (identity shortcut): rows band+4 -> band
    t = affine_relu(y1, w["f2_a1"], w["f2_c1"], row0 + 2)
    y = conv(t, w["f2_w1"], w["f2_b1"])
    t = affine_relu(y, w["f2_a2"], w["f2_c2"], row0 + 3)
    y = conv(t, w["f2_w2"], w["f2_b2"])
    y2 = y + y1[2:-2]

    # head (1x1) — stays high-precision even in bf16 mode, matching the
    # unfused path's bf16-body/f32-head policy (ADR-0005).
    head_mode = "x3" if mode == "bf16" else mode
    out = _dot(y2.reshape(band * width, cm), w["head_w"], head_mode) + w["head_b"]
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
    formulation: str | None = None,
) -> jnp.ndarray:
    """Fused concat+resblock×2+head over NHWC features; returns [B,H,W,Ch].

    ``mode`` selects the MXU multiply precision for the f32 matmuls (see
    :func:`_dot`): ``"x3"`` (default on hardware — bf16x3, the semantics of
    ``lax.Precision.HIGH`` that the unfused XLA path pins), ``"bf16"``
    (single pass, f32 head), ``"highest"`` (Mosaic native fp32 contract),
    ``"x2"`` (two-pass study mode), or ``"f32"`` (plain dots — exact under
    interpret mode, where Mosaic precision attributes don't apply).

    ``formulation`` selects the conv decomposition (module docstring);
    default ``"preshift"``, env-overridable via
    ``FLOODSR_HR_TAIL_FORMULATION``.
    """
    # Resolve the env-var default OUTSIDE the jit boundary: inside, the
    # first trace's value would stick in the cache for every later call
    # with mode=None.
    if mode is None:
        mode = "f32" if interpret else os.environ.get(
            "FLOODSR_HR_TAIL_PRECISION", "x3"
        )
    if formulation is None:
        formulation = os.environ.get("FLOODSR_HR_TAIL_FORMULATION", "preshift")
    if formulation not in FORMULATIONS:
        raise ValueError(f"unknown formulation {formulation!r}; use {FORMULATIONS}")
    if mode == "f32" and not interpret:
        raise AssertionError(
            "mode='f32' is exact only under interpret mode; on hardware a "
            "plain f32 dot runs Mosaic's DEFAULT single-pass bf16 multiply "
            "(the exact silent-precision-loss this kernel guards against). "
            "Use 'x3' (HIGH semantics) or 'highest'."
        )
    return _hr_tail_pallas_jit(
        sr_feat, dem_feat, *weights,
        band=band, interpret=interpret, mode=mode, formulation=formulation,
    )


@functools.partial(
    jax.jit, static_argnames=("band", "interpret", "mode", "formulation")
)
def _hr_tail_pallas_jit(
    sr_feat: jnp.ndarray,
    dem_feat: jnp.ndarray,
    *weights: jnp.ndarray,
    band: int,
    interpret: bool,
    mode: str,
    formulation: str,
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

    # Pre-split the matmul weights into bf16 (hi, lo) pairs at trace time so
    # the kernel never burns VPU cycles re-splitting them per band. In the
    # winograd formulation the four 3×3 conv weights are first transformed
    # to the 16-position domain (then split) — also at trace time.
    conv3_keys = frozenset({"f1_w1", "f1_w2", "f2_w1", "f2_w2"})
    kernel_weights: list[jnp.ndarray] = []
    for k, v in zip(WEIGHT_KEYS, weights):
        if formulation == "winograd" and k in conv3_keys:
            v = winograd_transform_weights(v)
        if _weight_is_paired(k, mode):
            kernel_weights.extend(_split_hi_lo(v))
        elif mode == "bf16" and k in MATMUL_KEYS:
            # Single-pass mode: ship the bf16 hi half only.
            kernel_weights.append(v.astype(jnp.float32).astype(jnp.bfloat16))
        else:
            kernel_weights.append(v)

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

    kernel = functools.partial(
        _hr_tail_kernel,
        band=band, total_rows=h, mode=mode, formulation=formulation,
    )
    return pl.pallas_call(
        kernel,
        grid=(b, n_bands),
        in_specs=[
            *views(ca),
            *views(cb),
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in kernel_weights],
        ],
        out_specs=pl.BlockSpec((1, band, width, ch), mid, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, width, ch), jnp.float32),
        # The fused intermediates (x/t/y per layer at band+halo rows) live on
        # the kernel's scoped-VMEM stack; the 16 MiB default rejects the
        # flagship geometry. v5e has 128 MiB VMEM per core — allow most of it
        # (the winograd formulation at band 32 needs 105+ MiB for its
        # 16-position tensors).
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=119 * 1024 * 1024),
        interpret=interpret,
    )(
        sr_feat.astype(jnp.float32), sr_feat.astype(jnp.float32), sr_feat.astype(jnp.float32),
        dem_feat.astype(jnp.float32), dem_feat.astype(jnp.float32), dem_feat.astype(jnp.float32),
        *kernel_weights,
    )


def hr_tail_available() -> bool:
    return jax.default_backend() == "tpu"
