"""Build the native TIFF codec shared library with g++.

Usage: ``python -m floodsr_tpu.io.build_native``
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path


def build(verbose: bool = True) -> Path | None:
    src_dir = Path(__file__).parent / "_native"
    src = src_dir / "tiff_codec.cc"
    out = src_dir / "libfloodsr_tiff.so"
    cmd = [
        "g++",
        "-O3",
        "-shared",
        "-fPIC",
        "-std=c++17",
        "-o",
        str(out),
        str(src),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as err:
        if verbose:
            detail = getattr(err, "stderr", "") or str(err)
            print(f"native codec build failed: {detail}", file=sys.stderr)
        return None
    if verbose:
        print(f"built {out}")
    return out


if __name__ == "__main__":
    raise SystemExit(0 if build() else 1)
