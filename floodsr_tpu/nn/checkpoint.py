"""Model artifact format: ``.fsrz`` = zip(manifest.json, params.npz, state.npz).

Plays the role of the reference's released ONNX file
(reference: ``floodsr/models.json:1-10``): a single distributable weights
artifact, sha256-pinned by the registry and resolved into an I/O contract at
engine load (reference: ``floodsr/engine/ort.py:75-102``). The manifest
records the architecture config so any compatible graph (including weights
converted from the reference ONNX via :mod:`floodsr_tpu.nn.onnx_reader`)
carries its own shape.
"""

from __future__ import annotations

import io
import json
import zipfile
from pathlib import Path
from typing import Any

import numpy as np

import jax

from floodsr_tpu.nn.resunet import ResUNetConfig

ARTIFACT_FORMAT = "floodsr-tpu-fsrz"
ARTIFACT_VERSION = 1


def _flatten(tree: Any) -> tuple[dict[str, np.ndarray], Any]:
    """Flatten a pytree into numbered leaves plus a JSON-able skeleton."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i:05d}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    return arrays, treedef


def _skeleton(tree: Any) -> Any:
    """JSON-able structure mirror with leaf slots replaced by indices."""
    counter = [0]

    def walk(node: Any) -> Any:
        if isinstance(node, dict):
            # Walk in sorted key order to match jax.tree_util leaf ordering.
            return {k: walk(node[k]) for k in sorted(node)}
        if isinstance(node, (list, tuple)):
            return [walk(v) for v in node]
        idx = counter[0]
        counter[0] += 1
        return {"__leaf__": idx}

    return walk(tree)


def _rebuild(skeleton: Any, arrays: dict[str, np.ndarray]) -> Any:
    def walk(node: Any) -> Any:
        if isinstance(node, dict):
            if "__leaf__" in node and len(node) == 1:
                return arrays[f"leaf_{int(node['__leaf__']):05d}"]
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        raise ValueError(f"unexpected skeleton node: {node!r}")

    return walk(skeleton)


# Fixed member timestamp (the zip epoch): artifact bytes must be a pure
# function of the weights so the sha256 digest — which keys the registry
# checksums AND the AOT executable cache — is reproducible across processes.
# zipfile.writestr and np.savez both stamp wall-clock time otherwise.
_ZIP_EPOCH = (1980, 1, 1, 0, 0, 0)


def _zip_writestr(zf: zipfile.ZipFile, name: str, data: bytes | str, *, compress: int) -> None:
    info = zipfile.ZipInfo(name, date_time=_ZIP_EPOCH)
    info.compress_type = compress
    info.external_attr = 0o644 << 16
    zf.writestr(info, data)


def _npz_bytes(arrays: dict[str, np.ndarray]) -> bytes:
    """np.savez-compatible bytes with deterministic (epoch) member headers."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", compression=zipfile.ZIP_STORED) as zf:
        for key, arr in arrays.items():
            member = io.BytesIO()
            np.lib.format.write_array(member, np.asarray(arr), allow_pickle=False)
            _zip_writestr(zf, f"{key}.npy", member.getvalue(), compress=zipfile.ZIP_STORED)
    return buf.getvalue()


def save_artifact(
    fp: str | Path,
    config: ResUNetConfig,
    params: Any,
    state: Any,
    metadata: dict | None = None,
    *,
    store_dtype: str | None = None,
) -> Path:
    """Write a model artifact; returns the written path.

    ``store_dtype="float16"`` stores float leaves as half precision (halves
    artifact size for distribution/goldens; ~1e-3 relative weight rounding);
    the loader restores float32. Stored dtype is recorded in the manifest.
    """
    path = Path(fp).expanduser().resolve()
    path.parent.mkdir(parents=True, exist_ok=True)

    params_arrays, _ = _flatten(params)
    state_arrays, _ = _flatten(state)
    if store_dtype == "float16":
        def half(arrays):
            return {
                k: (a.astype(np.float16) if a.dtype == np.float32 else a)
                for k, a in arrays.items()
            }

        params_arrays = half(params_arrays)
        state_arrays = half(state_arrays)
    elif store_dtype is not None:
        raise ValueError(f"unsupported store_dtype {store_dtype!r}")
    manifest = {
        "format": ARTIFACT_FORMAT,
        "version": ARTIFACT_VERSION,
        "architecture": "ResUNet_DEM",
        "config": config.to_dict(),
        "io_contract": {
            "depth_input_name": "depth_lr",
            "dem_input_name": "dem_hr",
            "output_name": "depth_hr_pred",
            "depth_lr_hwc": [config.lr_tile, config.lr_tile, 1],
            "dem_hr_hwc": [config.hr_tile, config.hr_tile, 1],
            "output_hwc": [config.hr_tile, config.hr_tile, 1],
            "scale": config.scale,
        },
        "params_skeleton": _skeleton(params),
        "state_skeleton": _skeleton(state),
        "store_dtype": store_dtype or "float32",
        "metadata": metadata or {},
    }
    with zipfile.ZipFile(path, "w") as zf:
        _zip_writestr(
            zf,
            "manifest.json",
            json.dumps(manifest, sort_keys=True),
            compress=zipfile.ZIP_DEFLATED,
        )
        _zip_writestr(zf, "params.npz", _npz_bytes(params_arrays), compress=zipfile.ZIP_DEFLATED)
        _zip_writestr(zf, "state.npz", _npz_bytes(state_arrays), compress=zipfile.ZIP_DEFLATED)
    return path


def load_artifact(fp: str | Path) -> dict[str, Any]:
    """Load an artifact: ``{config, params, state, manifest}``."""
    path = Path(fp).expanduser().resolve()
    if not path.exists():
        raise AssertionError(f"model artifact does not exist: {path}")
    try:
        with zipfile.ZipFile(path) as zf:
            manifest = json.loads(zf.read("manifest.json"))
            if manifest.get("format") != ARTIFACT_FORMAT:
                raise ValueError(f"not a floodsr-tpu artifact: {path}")
            with np.load(io.BytesIO(zf.read("params.npz"))) as npz:
                params_arrays = {
                    k: (npz[k].astype(np.float32) if npz[k].dtype == np.float16 else npz[k])
                    for k in npz.files
                }
            with np.load(io.BytesIO(zf.read("state.npz"))) as npz:
                state_arrays = {
                    k: (npz[k].astype(np.float32) if npz[k].dtype == np.float16 else npz[k])
                    for k in npz.files
                }
    except zipfile.BadZipFile as err:
        raise ValueError(f"not a floodsr-tpu artifact (bad zip): {path}") from err

    return {
        "config": ResUNetConfig.from_dict(manifest["config"]),
        "params": _rebuild(manifest["params_skeleton"], params_arrays),
        "state": _rebuild(manifest["state_skeleton"], state_arrays),
        "manifest": manifest,
    }
