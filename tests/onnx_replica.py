"""tf2onnx-idiom replica of the reference's released SR graph (test double).

The real ``model_infer.onnx`` (reference ``floodsr/models.json``; probe facts
in ``proof_of_concepts/infer_test_tiles.ipynb`` cell 9: 12,045,568 params,
opset 13, tf2onnx 1.8.4, NHWC I/O ``depth_lr [N,32,32,1]`` /
``dem_hr [N,512,512,1]`` → ``depth_hr_pred [N,512,512,1]``) is unreachable
offline. This module synthesizes a graph with the SAME export idioms so the
in-tree ONNX executor and the ONNX→fsrz converter are proven against
realistic structure, not toy graphs:

- NHWC graph I/O with Transpose sandwiches around NCHW compute (how tf2onnx
  exports Keras conv nets), including one redundant transpose pair;
- dynamic-batch plumbing: Shape → Gather(0) → Unsqueeze → Concat(const dims)
  → Reshape, as tf2onnx emits around flatten/reshape points;
- Keras-style post-activation Conv+BN+ReLU blocks, MaxPool downsampling,
  ConvTranspose skip-concat decoder, two stride-4 ConvTranspose stages for
  the 16× SR upsample, HR DEM re-fusion, 1×1 linear head;
- opset 13, separate (unfused) BatchNormalization nodes with Keras epsilon.

``base_filters=40`` lands at 12,208,729 parameters (~1.4% over the real
12,045,568 — same scale, same op mix).
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn

from onnx_build import _node, build_onnx, _tensor, _len_field, _varint_field, _str_field

LR_TILE = 32
SCALE = 16
HR_TILE = LR_TILE * SCALE
BN_EPS = 1e-3


def _he(rng, *shape):
    fan_in = int(np.prod(shape[1:]))
    return (rng.standard_normal(shape) * np.sqrt(2.0 / fan_in)).astype(np.float32)


class _TorchReplica(nn.Module):
    """Keras-style UNet twin used to cross-validate the ONNX executor."""

    def __init__(self, f: int):
        super().__init__()
        widths = [f, 2 * f, 4 * f, 8 * f, 16 * f]

        def block(cin, cout):
            return nn.Sequential(
                nn.Conv2d(cin, cout, 3, padding=1),
                nn.BatchNorm2d(cout, eps=BN_EPS),
                nn.ReLU(),
                nn.Conv2d(cout, cout, 3, padding=1),
                nn.BatchNorm2d(cout, eps=BN_EPS),
                nn.ReLU(),
            )

        self.pool_dem = nn.AvgPool2d(SCALE, SCALE)
        self.enc = nn.ModuleList()
        cin = 2
        for w in widths:
            self.enc.append(block(cin, w))
            cin = w
        self.down = nn.MaxPool2d(2, 2)
        self.ups = nn.ModuleList()
        self.dec = nn.ModuleList()
        for w in reversed(widths[:-1]):
            self.ups.append(nn.ConvTranspose2d(cin, w, 2, stride=2))
            self.dec.append(block(2 * w, w))
            cin = w
        self.sr1 = nn.ConvTranspose2d(cin, f, 4, stride=4)
        self.sr2 = nn.ConvTranspose2d(f, f, 4, stride=4)
        self.dem_feat = nn.Conv2d(1, f, 3, padding=1)
        self.fuse = block(2 * f, f)
        self.head = nn.Conv2d(f, 1, 1)

    def forward(self, depth_nhwc, dem_nhwc):
        d = depth_nhwc.permute(0, 3, 1, 2)
        m = dem_nhwc.permute(0, 3, 1, 2)
        x = torch.cat([d, self.pool_dem(m)], dim=1)
        skips = []
        for i, blk in enumerate(self.enc):
            x = blk(x)
            if i < len(self.enc) - 1:
                skips.append(x)
                x = self.down(x)
        for up, blk, skip in zip(self.ups, self.dec, reversed(skips)):
            x = torch.cat([up(x), skip], dim=1)
            x = blk(x)
        x = torch.relu(self.sr1(x))
        x = torch.relu(self.sr2(x))
        x = torch.cat([x, torch.relu(self.dem_feat(m))], dim=1)
        x = self.fuse(x)
        x = self.head(x)
        return x.permute(0, 2, 3, 1)


def build_reference_replica(seed: int = 0, f: int = 40):
    """Returns ``(onnx_bytes, torch_module)`` with identical weights."""
    rng = np.random.default_rng(np.random.Philox(seed))
    torch_net = _TorchReplica(f).eval()

    widths = [f, 2 * f, 4 * f, 8 * f, 16 * f]
    inits: dict[str, np.ndarray] = {}
    nodes: list[bytes] = []
    uid = [0]

    def fresh(prefix):
        uid[0] += 1
        return f"{prefix}_{uid[0]}"

    def conv(x, cin, cout, k, torch_conv, name, relu=False, pads=None):
        w = _he(rng, cout, cin, k, k)
        b = (rng.standard_normal(cout) * 0.02).astype(np.float32)
        with torch.no_grad():
            torch_conv.weight.copy_(torch.from_numpy(w))
            torch_conv.bias.copy_(torch.from_numpy(b))
        inits[f"{name}_w"] = w
        inits[f"{name}_b"] = b
        out = fresh(name)
        p = [k // 2] * 4 if pads is None else pads
        nodes.append(
            _node("Conv", [x, f"{name}_w", f"{name}_b"], [out],
                  {"strides": [1, 1], "pads": p, "kernel_shape": [k, k]})
        )
        if relu:
            r = fresh(name + "_relu")
            nodes.append(_node("Relu", [out], [r]))
            return r
        return out

    def bn(x, ch, torch_bn, name):
        scale = (1.0 + rng.standard_normal(ch) * 0.05).astype(np.float32)
        offset = (rng.standard_normal(ch) * 0.05).astype(np.float32)
        mean = (rng.standard_normal(ch) * 0.1).astype(np.float32)
        var = (0.5 + rng.random(ch)).astype(np.float32)
        with torch.no_grad():
            torch_bn.weight.copy_(torch.from_numpy(scale))
            torch_bn.bias.copy_(torch.from_numpy(offset))
            torch_bn.running_mean.copy_(torch.from_numpy(mean))
            torch_bn.running_var.copy_(torch.from_numpy(var))
        for suffix, arr in (("s", scale), ("o", offset), ("m", mean), ("v", var)):
            inits[f"{name}_{suffix}"] = arr
        out = fresh(name)
        nodes.append(
            _node("BatchNormalization",
                  [x, f"{name}_s", f"{name}_o", f"{name}_m", f"{name}_v"],
                  [out], {"epsilon": BN_EPS})
        )
        r = fresh(name + "_relu")
        nodes.append(_node("Relu", [out], [r]))
        return r

    def block(x, cin, cout, torch_block, name):
        x = conv(x, cin, cout, 3, torch_block[0], f"{name}_c1")
        x = bn(x, cout, torch_block[1], f"{name}_b1")
        x = conv(x, cout, cout, 3, torch_block[3], f"{name}_c2")
        x = bn(x, cout, torch_block[4], f"{name}_b2")
        return x

    def conv_t(x, cin, cout, k, s, torch_ct, name, relu=False):
        w = _he(rng, cin, cout, k, k) * 0.5
        b = np.zeros(cout, np.float32)
        with torch.no_grad():
            torch_ct.weight.copy_(torch.from_numpy(w))
            torch_ct.bias.copy_(torch.from_numpy(b))
        inits[f"{name}_w"] = w
        inits[f"{name}_b"] = b
        out = fresh(name)
        nodes.append(
            _node("ConvTranspose", [x, f"{name}_w", f"{name}_b"], [out],
                  {"strides": [s, s], "pads": [0, 0, 0, 0], "kernel_shape": [k, k]})
        )
        if relu:
            r = fresh(name + "_relu")
            nodes.append(_node("Relu", [out], [r]))
            return r
        return out

    # --- graph body ---------------------------------------------------------
    nodes.append(_node("Transpose", ["depth_lr"], ["d_nchw"], {"perm": [0, 3, 1, 2]}))
    nodes.append(_node("Transpose", ["dem_hr"], ["m_nchw"], {"perm": [0, 3, 1, 2]}))
    nodes.append(
        _node("AveragePool", ["m_nchw"], ["m_lr"],
              {"kernel_shape": [SCALE, SCALE], "strides": [SCALE, SCALE]})
    )
    nodes.append(_node("Concat", ["d_nchw", "m_lr"], ["enc_in"], {"axis": 1}))

    x = "enc_in"
    cin = 2
    skips = []
    for i, w in enumerate(widths):
        x = block(x, cin, w, torch_net.enc[i], f"enc{i}")
        cin = w
        if i < len(widths) - 1:
            skips.append(x)
            out = fresh(f"down{i}")
            nodes.append(
                _node("MaxPool", [x], [out],
                      {"kernel_shape": [2, 2], "strides": [2, 2]})
            )
            x = out

    for j, w in enumerate(reversed(widths[:-1])):
        up = conv_t(x, cin, w, 2, 2, torch_net.ups[j], f"up{j}")
        cat = fresh(f"cat{j}")
        nodes.append(_node("Concat", [up, skips[-1 - j]], [cat], {"axis": 1}))
        x = block(cat, 2 * w, w, torch_net.dec[j], f"dec{j}")
        cin = w

    # tf2onnx dynamic-batch plumbing: a shape-derived no-op Reshape.
    lr = LR_TILE
    nodes.append(_node("Shape", [x], ["dyn_shape"]))
    inits["g_zero"] = np.array([0], np.int64)
    nodes.append(_node("Gather", ["dyn_shape", "g_zero"], ["dyn_n0"], {"axis": 0}))
    inits["chw_dims"] = np.array([cin, lr, lr], np.int64)
    nodes.append(_node("Concat", ["dyn_n0", "chw_dims"], ["dyn_dims"], {"axis": 0}))
    reshaped = fresh("dyn_reshape")
    nodes.append(_node("Reshape", [x, "dyn_dims"], [reshaped]))
    # Slice idiom over the shape vector (consumes the Slice op tf2onnx emits).
    inits["sl_start"] = np.array([0], np.int64)
    inits["sl_end"] = np.array([1], np.int64)
    nodes.append(_node("Slice", ["dyn_shape", "sl_start", "sl_end"], ["dyn_n1"]))
    x = reshaped

    x = conv_t(x, cin, f, 4, 4, torch_net.sr1, "sr1", relu=True)
    # Redundant transpose sandwich (tf2onnx layout noise).
    nodes.append(_node("Transpose", [x], ["noise_nhwc"], {"perm": [0, 2, 3, 1]}))
    nodes.append(_node("Transpose", ["noise_nhwc"], ["noise_nchw"], {"perm": [0, 3, 1, 2]}))
    x = conv_t("noise_nchw", f, f, 4, 4, torch_net.sr2, "sr2", relu=True)

    mf = conv("m_nchw", 1, f, 3, torch_net.dem_feat, "dem_feat", relu=True)
    cat = fresh("fusecat")
    nodes.append(_node("Concat", [x, mf], [cat], {"axis": 1}))
    x = block(cat, 2 * f, f, torch_net.fuse, "fuse")
    x = conv(x, f, 1, 1, torch_net.head, "head", pads=[0, 0, 0, 0])
    nodes.append(_node("Transpose", [x], ["depth_hr_pred"], {"perm": [0, 2, 3, 1]}))

    data = build_onnx(
        nodes,
        inits,
        [("depth_lr", (1, LR_TILE, LR_TILE, 1)), ("dem_hr", (1, HR_TILE, HR_TILE, 1))],
        [("depth_hr_pred", (1, HR_TILE, HR_TILE, 1))],
    )
    return data, torch_net
