"""Host→device transfer encodings for tunnel/PCIe-limited hosts.

The DEM is the pipeline's one big upload (a 4096² float32 scene is 67 MB; the
axon harness moves ~15-35 MB/s). :func:`device_put_dem_quantized` ships it as
uint16 fixed point — half the bytes — and dequantizes on device:

- valid values map to codes ``0..65534`` over the valid min/max range, so the
  quantization step is ``range/65534`` (≈1.6 mm for 100 m of relief — three
  orders below the 1e-3 m output parity gate, and far below real DEM noise);
- code ``65535`` is reserved for nodata when a nodata value exists, so
  nodata round-trips EXACTLY and downstream ``isclose`` masking still fires.

Small arrays (< ``_MIN_BYTES``) and degenerate ranges skip the encoding and
upload float32 directly, so CI-sized scenes are bit-identical with or without
the option.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp

_MIN_BYTES = 8 * 1024 * 1024  # below this, encoding overhead beats the savings
_MAX_CODE = 65534.0


@lru_cache(maxsize=32)
def _dequant_fn(shape: tuple[int, ...], has_nodata: bool):
    def f(q, scale, vmin, nodata_val):
        x = q.astype(jnp.float32) * scale + vmin
        if has_nodata:
            x = jnp.where(q == jnp.uint16(65535), nodata_val, x)
        return x

    return jax.jit(f)


def device_put_dem_quantized(
    arr: np.ndarray, nodata: float | None = None, *, enabled: bool = True
):
    """Upload ``arr`` (2-D float raster) to device, uint16-encoded when large.

    Returns a float32 device array equal to ``arr`` up to the quantization
    step (exact on nodata cells). Falls back to a plain float32 upload when
    disabled, small, non-finite-ranged, or constant.
    """
    arr32 = np.ascontiguousarray(arr, dtype=np.float32)
    if not enabled or arr32.nbytes < _MIN_BYTES:
        return jax.device_put(arr32)

    if nodata is not None:
        from floodsr_tpu.ops.normalize import nodata_mask

        valid = ~nodata_mask(arr32, float(nodata))
        if not valid.any():
            return jax.device_put(arr32)
        vals = arr32[valid]
        vmin = float(vals.min())
        vmax = float(vals.max())
    else:
        vmin = float(arr32.min())
        vmax = float(arr32.max())
    if not (np.isfinite(vmin) and np.isfinite(vmax)) or vmax <= vmin:
        return jax.device_put(arr32)

    scale = (vmax - vmin) / _MAX_CODE
    codes = np.round((arr32 - vmin) * (1.0 / scale))
    codes = np.clip(codes, 0.0, _MAX_CODE).astype(np.uint16)
    if nodata is not None:
        codes = np.where(valid, codes, np.uint16(65535))
    dequant = _dequant_fn(arr32.shape, nodata is not None)
    return dequant(
        jax.device_put(codes),
        jnp.float32(scale),
        jnp.float32(vmin),
        jnp.float32(0.0 if nodata is None else nodata),
    )
