"""Runtime diagnostics for the ``doctor`` command.

Mirrors the role of the reference's provider diagnostics
(reference: ``floodsr/engine/providers.py:6-29``) for the JAX/TPU stack:
jax/jaxlib versions, visible devices, and the raster-I/O backend state.
"""

from __future__ import annotations

import importlib.metadata as md


def get_jax_info() -> dict[str, object]:
    """JAX installation, backend, and device diagnostics."""
    try:
        import jax
    except ImportError:  # pragma: no cover - jax is a hard dependency
        return {"installed": False, "version": None, "backend": None, "devices": []}
    try:
        devices = jax.devices()
        backend = jax.default_backend()
        device_kinds = [d.device_kind for d in devices]
    except Exception as err:  # backend init failure still yields diagnostics
        return {
            "installed": True,
            "version": jax.__version__,
            "backend": f"error: {err}",
            "devices": [],
        }
    return {
        "installed": True,
        "version": jax.__version__,
        "backend": backend,
        "devices": device_kinds,
    }


def get_io_info() -> dict[str, object]:
    """Raster I/O backend diagnostics (self-contained codec + native library)."""
    from floodsr_tpu.io import native

    return {
        "backend": "floodsr-tpu-geotiff",
        "native_codec": native.available(),
    }


def get_optional_package_info(name: str) -> dict[str, object]:
    """Presence/version info for an optional dependency."""
    try:
        version = md.version(name)
    except md.PackageNotFoundError:
        return {"installed": False, "version": None}
    return {"installed": True, "version": version}


def doctor_info() -> dict[str, object]:
    """The `doctor` diagnostics as one dict (CLI key=value; daemon JSON)."""
    jax_info = get_jax_info()
    io_info = get_io_info()
    return {
        "jax_installed": jax_info["installed"],
        "jax_version": jax_info["version"],
        "jax_backend": jax_info["backend"],
        "jax_devices": [str(d) for d in jax_info["devices"]],
        "io_backend": io_info["backend"],
        "io_native_codec": io_info["native_codec"],
    }
