"""ctypes loader for the optional C++ TIFF codec fast path.

The native library (``floodsr_tpu/io/_native/libfloodsr_tiff.so``) implements
TIFF-variant LZW encode/decode — the CPU-bound part of raster I/O that GDAL's
C++ core provides in the reference stack. When absent (not yet built on this
machine) the pure-Python codec in :mod:`floodsr_tpu.io.tiff` is used instead.
Build with: ``python -m floodsr_tpu.io.build_native`` (uses g++).
"""

from __future__ import annotations

import ctypes
from pathlib import Path

_LIB_PATH = Path(__file__).parent / "_native" / "libfloodsr_tiff.so"
_lib: ctypes.CDLL | None = None
_load_failed = False


def _load() -> ctypes.CDLL | None:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not _LIB_PATH.exists():
        # Not a terminal state: the library may be built later in this
        # process (tests/build_native do exactly that) — re-check next call.
        return None
    src = _LIB_PATH.parent / "tiff_codec.cc"
    if src.exists() and _LIB_PATH.stat().st_mtime < src.stat().st_mtime:
        # Stale binary (source newer than the build): rebuild rather than
        # load a library with potentially fixed bugs still in it. A rebuild
        # failure (no g++ at runtime, read-only install, or mere mtime skew
        # from copy ordering) is NOT terminal: the existing .so may be
        # perfectly valid, so fall through and load it — decode already has
        # a lenient-Python fallback for the one known stale-binary bug.
        from floodsr_tpu.io.build_native import build

        build(verbose=False)
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.fsr_lzw_decode.restype = ctypes.c_longlong
        lib.fsr_lzw_decode.argtypes = [
            ctypes.c_char_p,
            ctypes.c_longlong,
            ctypes.c_char_p,
            ctypes.c_longlong,
        ]
        lib.fsr_lzw_encode_bound.restype = ctypes.c_longlong
        lib.fsr_lzw_encode_bound.argtypes = [ctypes.c_longlong]
        lib.fsr_lzw_encode.restype = ctypes.c_longlong
        lib.fsr_lzw_encode.argtypes = [
            ctypes.c_char_p,
            ctypes.c_longlong,
            ctypes.c_char_p,
            ctypes.c_longlong,
        ]
        _lib = lib
    except OSError:
        _load_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


class NativeLzwOverflow(ValueError):
    """Native decode code -2: output exceeded the exact-size buffer.

    Distinct from corruption (code -1) so callers can fall back to the
    lenient Python decoder ONLY for the known legacy-encoder overflow case
    (one spurious code before EOI) while letting corrupt streams propagate.
    """


def lzw_decode(data: bytes, expected_size: int) -> bytes:
    lib = _load()
    assert lib is not None, "native codec not available"
    # expected_size is exact for interior chunks; final strips may decode to
    # exactly expected_size too (callers pass the true uncompressed size).
    out = ctypes.create_string_buffer(expected_size)
    n = lib.fsr_lzw_decode(data, len(data), out, expected_size)
    if n == -2:
        raise NativeLzwOverflow("native LZW decode overflowed the output buffer")
    if n < 0:
        raise ValueError(f"native LZW decode failed with code {n}")
    return out.raw[:n]


def lzw_encode(data: bytes) -> bytes:
    lib = _load()
    assert lib is not None, "native codec not available"
    bound = lib.fsr_lzw_encode_bound(len(data))
    out = ctypes.create_string_buffer(bound)
    n = lib.fsr_lzw_encode(data, len(data), out, bound)
    if n < 0:
        raise ValueError(f"native LZW encode failed with code {n}")
    return out.raw[:n]
