"""Execute parsed ONNX graphs as JAX (XLA) computations.

Covers the operator set a tf2onnx/torch-exported convolutional SR network
uses (the reference's released graph is a conv/BN/ReLU ResUNet with
transposed-conv upsampling — reference: ``floodsr/models/ResUNet_16x_DEM.py:
15-24``): Conv, ConvTranspose, BatchNormalization, Relu/LeakyRelu/Sigmoid/
Tanh, Add/Sub/Mul/Div, Concat, AveragePool/MaxPool/GlobalAveragePool,
Transpose, Identity/Cast, Pad, Reshape, Resize (nearest/linear), Clip, and
constant plumbing. Everything lowers to ``jax.lax`` ops, so a loaded ONNX
artifact runs jitted on TPU with no ONNX Runtime.

Usage::

    model = onnx_reader.load_model("model_infer.onnx")
    runner = OnnxGraphExecutor(model)           # callable, jit-compatible
    outputs = runner({"depth_lr": x, "dem_hr": d})
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from floodsr_tpu.nn.onnx_reader import OnnxModel, OnnxNode


def _attr(node: OnnxNode, name: str, default=None):
    return node.attributes.get(name, default)


def _auto_pad_pairs(node: OnnxNode, kernel: tuple[int, int], strides, in_hw, dilations=(1, 1)):
    """Resolve ONNX padding attributes to per-dimension (lo, hi) pairs."""
    auto_pad = _attr(node, "auto_pad", "NOTSET")
    if isinstance(auto_pad, bytes):
        auto_pad = auto_pad.decode()
    if auto_pad in ("SAME_UPPER", "SAME_LOWER"):
        pads = []
        for dim in range(2):
            eff_k = (kernel[dim] - 1) * dilations[dim] + 1
            out = -(-in_hw[dim] // strides[dim])
            total = max(0, (out - 1) * strides[dim] + eff_k - in_hw[dim])
            lo = total // 2
            hi = total - lo
            pads.append((hi, lo) if auto_pad == "SAME_LOWER" else (lo, hi))
        return pads
    if auto_pad == "VALID":
        return [(0, 0), (0, 0)]
    raw = _attr(node, "pads", [0, 0, 0, 0])
    # ONNX order: [y_begin, x_begin, y_end, x_end]
    return [(raw[0], raw[2]), (raw[1], raw[3])]


class OnnxGraphExecutor:
    """Interpret an ONNX graph with jnp/lax ops (NCHW, per ONNX convention)."""

    def __init__(self, model: OnnxModel):
        self.model = model
        self.constants: dict[str, np.ndarray] = dict(model.initializers)
        # Fold Constant nodes into the environment up front.
        self.nodes: list[OnnxNode] = []
        for node in model.nodes:
            if node.op_type == "Constant":
                value = _attr(node, "value")
                if value is None:
                    value = _attr(node, "value_float")
                self.constants[node.outputs[0]] = np.asarray(value)
            else:
                self.nodes.append(node)
        self.input_names = [vi.name for vi in model.graph_inputs]
        self.output_names = [vi.name for vi in model.outputs]

    # -- op implementations --------------------------------------------------

    def _op_conv(self, node: OnnxNode, env: dict) -> Any:
        x = env[node.inputs[0]]
        w = env[node.inputs[1]]
        b = env[node.inputs[2]] if len(node.inputs) > 2 else None
        strides = tuple(_attr(node, "strides", [1, 1]))
        dilations = tuple(_attr(node, "dilations", [1, 1]))
        groups = int(_attr(node, "group", 1))
        kernel = (int(w.shape[2]), int(w.shape[3]))
        pads = _auto_pad_pairs(node, kernel, strides, x.shape[2:4], dilations)
        out = lax.conv_general_dilated(
            x,
            w,
            window_strides=strides,
            padding=pads,
            rhs_dilation=dilations,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=groups,
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST,
        )
        if b is not None:
            out = out + b.reshape(1, -1, 1, 1)
        return out.astype(x.dtype)

    def _op_conv_transpose(self, node: OnnxNode, env: dict) -> Any:
        x = env[node.inputs[0]]
        w = env[node.inputs[1]]  # ONNX ConvTranspose weight: [Cin, Cout/groups, kH, kW]
        b = env[node.inputs[2]] if len(node.inputs) > 2 else None
        strides = tuple(_attr(node, "strides", [1, 1]))
        dilations = tuple(_attr(node, "dilations", [1, 1]))
        groups = int(_attr(node, "group", 1))
        if groups != 1:
            raise NotImplementedError("grouped ConvTranspose is not supported")
        kernel = (int(w.shape[2]), int(w.shape[3]))
        output_padding = tuple(_attr(node, "output_padding", [0, 0]))

        auto_pad = _attr(node, "auto_pad", "NOTSET")
        if isinstance(auto_pad, bytes):
            auto_pad = auto_pad.decode()
        output_shape_attr = _attr(node, "output_shape")
        in_hw = x.shape[2:4]
        if output_shape_attr is not None:
            out_hw = tuple(int(v) for v in output_shape_attr)
            pads = []
            for d in range(2):
                total = (in_hw[d] - 1) * strides[d] + (
                    (kernel[d] - 1) * dilations[d] + 1
                ) - out_hw[d]
                lo = total // 2
                hi = total - lo
                pads.append((lo, hi))
        elif auto_pad in ("SAME_UPPER", "SAME_LOWER"):
            out_hw = tuple(in_hw[d] * strides[d] for d in range(2))
            pads = []
            for d in range(2):
                total = (in_hw[d] - 1) * strides[d] + (
                    (kernel[d] - 1) * dilations[d] + 1
                ) - out_hw[d]
                lo = total // 2
                hi = total - lo
                pads.append((hi, lo) if auto_pad == "SAME_LOWER" else (lo, hi))
        else:
            raw = _attr(node, "pads", [0, 0, 0, 0])
            pads = [(raw[0], raw[2]), (raw[1], raw[3])]
            pads = [
                (p[0], p[1] - output_padding[d]) for d, p in enumerate(pads)
            ]

        # Express transposed conv as input-dilated conv with flipped kernel.
        w_flip = jnp.flip(w, axis=(2, 3))  # [Cin, Cout, kH, kW]
        w_oihw = jnp.transpose(w_flip, (1, 0, 2, 3))  # [Cout, Cin, kH, kW]
        conv_pads = []
        for d in range(2):
            eff_k = (kernel[d] - 1) * dilations[d] + 1
            lo = eff_k - 1 - pads[d][0]
            hi = eff_k - 1 - pads[d][1]
            conv_pads.append((lo, hi))
        out = lax.conv_general_dilated(
            x,
            w_oihw,
            window_strides=(1, 1),
            padding=conv_pads,
            lhs_dilation=strides,
            rhs_dilation=dilations,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST,
        )
        if b is not None:
            out = out + b.reshape(1, -1, 1, 1)
        return out.astype(x.dtype)

    def _op_batch_norm(self, node: OnnxNode, env: dict) -> Any:
        x, scale, offset, mean, var = (env[name] for name in node.inputs[:5])
        eps = float(_attr(node, "epsilon", 1e-5))
        inv = scale / jnp.sqrt(var + eps)
        shape = (1, -1) + (1,) * (x.ndim - 2)
        return x * inv.reshape(shape) + (offset - mean * inv).reshape(shape)

    def _op_pool(self, node: OnnxNode, env: dict, reducer: str) -> Any:
        x = env[node.inputs[0]]
        kernel = tuple(_attr(node, "kernel_shape"))
        strides = tuple(_attr(node, "strides", list(kernel)))
        pads = _auto_pad_pairs(node, kernel, strides, x.shape[2:4])
        window = (1, 1) + kernel
        strides4 = (1, 1) + strides
        padding = ((0, 0), (0, 0)) + tuple(pads)
        if reducer == "max":
            init = -jnp.inf
            out = lax.reduce_window(x, init, lax.max, window, strides4, padding)
        else:
            summed = lax.reduce_window(x, 0.0, lax.add, window, strides4, padding)
            if _attr(node, "count_include_pad", 0) or all(p == (0, 0) for p in pads):
                out = summed / float(np.prod(kernel))
            else:
                ones = jnp.ones(x.shape[2:4], x.dtype)[None, None]
                counts = lax.reduce_window(ones, 0.0, lax.add, window, strides4, padding)
                out = summed / counts
        return out

    def _op_resize(self, node: OnnxNode, env: dict) -> Any:
        x = env[node.inputs[0]]
        sizes = None
        if len(node.inputs) > 3 and node.inputs[3] and node.inputs[3] in env:
            sizes = np.asarray(env[node.inputs[3]]).astype(int).tolist()
        elif len(node.inputs) > 2 and node.inputs[2] and node.inputs[2] in env:
            scales = np.asarray(env[node.inputs[2]]).astype(float)
            sizes = [int(round(s * d)) for s, d in zip(scales, x.shape)]
        if sizes is None:
            raise NotImplementedError("Resize without scales/sizes")
        mode = _attr(node, "mode", "nearest")
        if isinstance(mode, bytes):
            mode = mode.decode()
        method = {"nearest": "nearest", "linear": "bilinear", "cubic": "bicubic"}[mode]
        return jax.image.resize(x, tuple(sizes), method=method)

    # -- graph walk -----------------------------------------------------------

    def __call__(self, feeds: dict[str, Any]) -> dict[str, Any]:
        # Constants stay numpy: jax 0.9 traces jnp-wrapped constants, which
        # would break the convert-time (np.asarray) evaluation of tf2onnx
        # shape plumbing. lax ops lift numpy operands to constants on use.
        env: dict[str, Any] = {
            name: np.asarray(value) for name, value in self.constants.items()
        }
        for name in self.input_names:
            if name not in feeds:
                raise KeyError(f"missing graph input '{name}'")
        env.update({name: jnp.asarray(v) for name, v in feeds.items()})

        for node in self.nodes:
            op = node.op_type
            if op == "Conv":
                result = self._op_conv(node, env)
            elif op == "ConvTranspose":
                result = self._op_conv_transpose(node, env)
            elif op == "BatchNormalization":
                result = self._op_batch_norm(node, env)
            elif op == "Relu":
                result = jax.nn.relu(env[node.inputs[0]])
            elif op == "LeakyRelu":
                result = jax.nn.leaky_relu(env[node.inputs[0]], _attr(node, "alpha", 0.01))
            elif op == "Sigmoid":
                result = jax.nn.sigmoid(env[node.inputs[0]])
            elif op == "Tanh":
                result = jnp.tanh(env[node.inputs[0]])
            elif op == "Elu":
                result = jax.nn.elu(env[node.inputs[0]], _attr(node, "alpha", 1.0))
            elif op == "Add":
                result = env[node.inputs[0]] + env[node.inputs[1]]
            elif op == "Sub":
                result = env[node.inputs[0]] - env[node.inputs[1]]
            elif op == "Mul":
                result = env[node.inputs[0]] * env[node.inputs[1]]
            elif op == "Div":
                result = env[node.inputs[0]] / env[node.inputs[1]]
            elif op == "Sqrt":
                result = jnp.sqrt(env[node.inputs[0]])
            elif op == "Exp":
                result = jnp.exp(env[node.inputs[0]])
            elif op == "Log":
                result = jnp.log(env[node.inputs[0]])
            elif op == "Concat":
                axis = int(_attr(node, "axis", 1))
                parts = [env[i] for i in node.inputs]
                if all(isinstance(p, np.ndarray) for p in parts):
                    result = np.concatenate(parts, axis=axis)  # shape plumbing
                else:
                    result = jnp.concatenate(parts, axis=axis)
            elif op in ("AveragePool", "MaxPool"):
                result = self._op_pool(node, env, "max" if op == "MaxPool" else "avg")
            elif op == "GlobalAveragePool":
                result = jnp.mean(env[node.inputs[0]], axis=(2, 3), keepdims=True)
            elif op == "Transpose":
                perm = _attr(node, "perm")
                result = jnp.transpose(env[node.inputs[0]], perm)
            elif op in ("Identity", "Cast", "Dropout"):
                result = env[node.inputs[0]]
                if op == "Cast":
                    from floodsr_tpu.nn.onnx_reader import _ONNX_DTYPES

                    to = _ONNX_DTYPES.get(int(_attr(node, "to", 1)), np.float32)
                    result = result.astype(to)
            elif op == "Clip":
                # Opset-11+ passes min/max as optional inputs (either may be
                # an empty name); earlier opsets use attributes.
                x = env[node.inputs[0]]
                lo = env[node.inputs[1]] if len(node.inputs) > 1 and node.inputs[1] else _attr(node, "min", -np.inf)
                hi = env[node.inputs[2]] if len(node.inputs) > 2 and node.inputs[2] else _attr(node, "max", np.inf)
                result = jnp.clip(x, lo, hi)
            elif op == "Pad":
                x = env[node.inputs[0]]
                if len(node.inputs) > 1 and node.inputs[1] in env:
                    raw = np.asarray(env[node.inputs[1]]).astype(int)
                else:
                    raw = np.asarray(_attr(node, "pads"), int)
                half = len(raw) // 2
                pad_width = [(int(raw[i]), int(raw[i + half])) for i in range(half)]
                mode = _attr(node, "mode", b"constant")
                mode = mode.decode() if isinstance(mode, bytes) else str(mode)
                if mode == "constant":
                    cval = 0.0
                    if len(node.inputs) > 2 and node.inputs[2] and node.inputs[2] in env:
                        cval = float(np.asarray(env[node.inputs[2]]).reshape(()))
                    result = jnp.pad(x, pad_width, constant_values=cval)
                elif mode == "reflect":
                    result = jnp.pad(x, pad_width, mode="reflect")
                elif mode == "edge":
                    result = jnp.pad(x, pad_width, mode="edge")
                else:
                    raise NotImplementedError(f"Pad mode {mode!r} not supported")
            elif op == "Reshape":
                shape = np.asarray(env[node.inputs[1]]).astype(int).tolist()
                x = env[node.inputs[0]]
                shape = [x.shape[i] if s == 0 else s for i, s in enumerate(shape)]
                result = jnp.reshape(x, shape)
            elif op == "Flatten":
                x = env[node.inputs[0]]
                axis = int(_attr(node, "axis", 1))
                result = jnp.reshape(x, (int(np.prod(x.shape[:axis])), -1))
            elif op == "Squeeze":
                axes = _attr(node, "axes")
                if axes is None and len(node.inputs) > 1:
                    axes = np.asarray(env[node.inputs[1]]).astype(int).tolist()
                result = jnp.squeeze(env[node.inputs[0]], axis=tuple(axes) if axes else None)
            elif op == "Unsqueeze":
                axes = _attr(node, "axes")
                if axes is None and len(node.inputs) > 1:
                    axes = np.asarray(env[node.inputs[1]]).astype(int).tolist()
                x = env[node.inputs[0]]
                if isinstance(x, np.ndarray):
                    result = np.expand_dims(x, axis=tuple(axes))
                else:
                    result = jnp.expand_dims(x, axis=tuple(axes))
            elif op == "Resize":
                result = self._op_resize(node, env)
            elif op == "Shape":
                # Host constant (numpy): shapes are static under jit, and
                # tf2onnx shape plumbing (Gather/Slice/Concat/Reshape over
                # this) must stay convert-time-evaluable, not become tracers.
                result = np.asarray(env[node.inputs[0]].shape, np.int64)
            elif op == "MatMul":
                result = jnp.matmul(
                    env[node.inputs[0]], env[node.inputs[1]],
                    preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST,
                )
            elif op == "Gather":
                data = env[node.inputs[0]]
                indices = np.asarray(env[node.inputs[1]])
                axis = int(_attr(node, "axis", 0))
                if isinstance(data, np.ndarray):
                    result = np.take(data, indices, axis=axis)  # shape plumbing
                else:
                    result = jnp.take(data, jnp.asarray(indices), axis=axis)
            elif op == "Slice":
                data = env[node.inputs[0]]
                if len(node.inputs) > 1:
                    starts = np.asarray(env[node.inputs[1]]).astype(np.int64)
                    ends = np.asarray(env[node.inputs[2]]).astype(np.int64)
                    axes = (
                        np.asarray(env[node.inputs[3]]).astype(np.int64)
                        if len(node.inputs) > 3 and node.inputs[3]
                        else np.arange(starts.size, dtype=np.int64)
                    )
                    steps = (
                        np.asarray(env[node.inputs[4]]).astype(np.int64)
                        if len(node.inputs) > 4 and node.inputs[4]
                        else np.ones(starts.size, np.int64)
                    )
                else:  # opset <10: attribute form
                    starts = np.asarray(_attr(node, "starts"), np.int64)
                    ends = np.asarray(_attr(node, "ends"), np.int64)
                    axes = np.asarray(
                        _attr(node, "axes", list(range(starts.size))), np.int64
                    )
                    steps = np.ones(starts.size, np.int64)
                slices = [slice(None)] * data.ndim
                for st, en, ax, sp in zip(starts, ends, axes, steps):
                    ax = int(ax) % data.ndim
                    big = np.iinfo(np.int64).max // 2
                    en = int(np.clip(en, -big, big))
                    slices[ax] = slice(int(st), en, int(sp))
                result = data[tuple(slices)]
            elif op == "ConstantOfShape":
                shape = [int(v) for v in np.asarray(env[node.inputs[0]])]
                fill = _attr(node, "value", None)
                value = float(np.asarray(fill).ravel()[0]) if fill is not None else 0.0
                result = jnp.full(shape, value, jnp.float32)
            elif op == "Gemm":
                a = env[node.inputs[0]]
                b = env[node.inputs[1]]
                if _attr(node, "transA", 0):
                    a = a.T
                if _attr(node, "transB", 0):
                    b = b.T
                result = _attr(node, "alpha", 1.0) * jnp.matmul(a, b)
                if len(node.inputs) > 2:
                    result = result + _attr(node, "beta", 1.0) * env[node.inputs[2]]
            else:
                raise NotImplementedError(
                    f"ONNX op '{op}' (node '{node.name}') is not supported by the "
                    "JAX executor"
                )
            for out_name in node.outputs:
                if out_name:
                    env[out_name] = result

        return {name: env[name] for name in self.output_names}


def make_jitted_runner(model: OnnxModel) -> Callable[[dict[str, Any]], dict[str, Any]]:
    """Return a jitted callable over the graph (weights closed over)."""
    executor = OnnxGraphExecutor(model)
    return jax.jit(executor.__call__)
