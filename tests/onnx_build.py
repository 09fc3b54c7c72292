"""Minimal protobuf/ONNX wire-format encoder shared by ONNX tests.

The image has no ``onnx`` package, so tests construct ONNX model bytes
directly. Field numbers follow onnx.proto3 (ModelProto/GraphProto/NodeProto/
TensorProto/AttributeProto); opset is pinned to 13 like the reference export.
"""

import struct

import numpy as np


# ---------------------------------------------------------------------------
# minimal protobuf / ONNX encoder (tests only)
# ---------------------------------------------------------------------------


def _varint(v: int) -> bytes:
    out = bytearray()
    v &= (1 << 64) - 1
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(fnum: int, wtype: int) -> bytes:
    return _varint((fnum << 3) | wtype)


def _len_field(fnum: int, payload: bytes) -> bytes:
    return _tag(fnum, 2) + _varint(len(payload)) + payload


def _varint_field(fnum: int, v: int) -> bytes:
    return _tag(fnum, 0) + _varint(v)


def _str_field(fnum: int, s: str) -> bytes:
    return _len_field(fnum, s.encode())


def _tensor(name: str, arr: np.ndarray) -> bytes:
    arr = np.ascontiguousarray(arr)
    dtype_code = {np.float32: 1, np.int64: 7}[arr.dtype.type]
    payload = b"".join(_varint_field(1, int(d)) for d in arr.shape)
    payload += _varint_field(2, dtype_code)
    payload += _str_field(8, name)
    payload += _len_field(9, arr.tobytes())
    return payload


def _attr(name: str, value) -> bytes:
    payload = _str_field(1, name)
    if isinstance(value, float):
        payload += _tag(2, 5) + struct.pack("<f", value) + _varint_field(20, 1)
    elif isinstance(value, int):
        payload += _varint_field(3, value) + _varint_field(20, 2)
    elif isinstance(value, str):
        payload += _len_field(4, value.encode()) + _varint_field(20, 3)
    elif isinstance(value, (list, tuple)) and all(isinstance(v, int) for v in value):
        payload += b"".join(_varint_field(8, int(v)) for v in value) + _varint_field(20, 7)
    else:
        raise TypeError(f"unsupported attr {name}={value!r}")
    return payload


def _node(op: str, inputs, outputs, attrs=None, name="") -> bytes:
    payload = b"".join(_str_field(1, i) for i in inputs)
    payload += b"".join(_str_field(2, o) for o in outputs)
    payload += _str_field(3, name or op.lower())
    payload += _str_field(4, op)
    for key, value in (attrs or {}).items():
        payload += _len_field(5, _attr(key, value))
    return payload


def _value_info(name: str, shape) -> bytes:
    dims = b""
    for d in shape:
        dims += _len_field(1, _varint_field(1, int(d)))
    shape_proto = dims
    tensor_type = _varint_field(1, 1) + _len_field(2, shape_proto)
    type_proto = _len_field(1, tensor_type)
    return _str_field(1, name) + _len_field(2, type_proto)


def build_onnx(nodes, initializers, inputs, outputs) -> bytes:
    graph = b"".join(_len_field(1, n) for n in nodes)
    graph += _str_field(2, "g")
    graph += b"".join(_len_field(5, _tensor(n, a)) for n, a in initializers.items())
    graph += b"".join(_len_field(11, _value_info(n, s)) for n, s in inputs)
    graph += b"".join(_len_field(12, _value_info(n, s)) for n, s in outputs)
    model = _varint_field(1, 7)  # ir_version
    model += _str_field(2, "floodsr-tpu-test")
    model += _len_field(7, graph)
    model += _len_field(8, _varint_field(2, 13))  # opset 13
    return model


