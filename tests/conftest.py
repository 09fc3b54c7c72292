"""Pytest fixtures for floodsr-tpu tests.

Tests run on a virtual 8-device CPU mesh (the reference pattern recommended in
SURVEY.md §4: single-host multi-device simulation via
``xla_force_host_platform_device_count``) so sharded code paths are exercised
without TPU hardware. Benchmarks target the real chip separately (bench.py).
"""

import hashlib
import json
import logging
import os
import pathlib

# Force the CPU backend BEFORE any jax use. The environment may pre-register
# a TPU plugin (sitecustomize) and pre-set JAX_PLATFORMS to it, so a plain
# setdefault is not enough — tests must never run over the TPU tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Persistent compile cache: this box has one CPU core, so re-jitting between
# test runs dominates wall time without it.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax-test")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

# Isolate tests from any user config file on this machine.
os.environ["FLOODSR_CONFIG_FILE"] = "/nonexistent/floodsr-test-config.json"

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", "tests must run on the CPU backend"

import numpy as np
import pytest


# Keep case parameterization synced with tests/data/*/case_spec.json.
TEST_TILE_CASES = tuple(
    sorted(
        case_spec.parent.name
        for case_spec in (pathlib.Path(__file__).parent / "data").glob("*/case_spec.json")
    )
)


def _read_tile_case(case_name: str) -> dict:
    """Load one data-driven test case from tests/data."""
    tile_dir = pathlib.Path(__file__).parent / "data" / case_name
    case_spec_fp = tile_dir / "case_spec.json"
    assert tile_dir.exists(), f"missing tile directory: {tile_dir}"
    assert case_spec_fp.exists(), f"missing case spec artifact: {case_spec_fp}"
    case_spec = json.loads(case_spec_fp.read_text(encoding="utf-8"))
    assert {"inputs", "expected", "flags"} <= set(case_spec), (
        f"invalid case spec shape for {case_name}: missing top-level keys"
    )
    assert {"lowres_fp", "dem_fp", "truth_fp"} <= set(case_spec["inputs"]), (
        f"invalid case inputs for {case_name}"
    )
    for run_label, run_spec in case_spec["expected"].items():
        assert "params" in run_spec and "metrics" in run_spec, (
            f"invalid expected run block for {case_name}/{run_label}"
        )
        assert "model_version" in run_spec["params"]
        assert {"mase_m", "rmse_m", "ssim"} <= set(run_spec["metrics"])
    assert "in_hrdem" in case_spec["flags"]
    return {
        "case_name": case_name,
        "tile_dir": tile_dir,
        "case_spec_fp": case_spec_fp,
        "case_spec": case_spec,
    }


@pytest.fixture(scope="session")
def logger():
    log = logging.getLogger("pytest")
    log.setLevel(logging.DEBUG)
    return log


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(20260816)


@pytest.fixture(scope="session")
def tile_case_catalog():
    """Metadata for all tracked data-driven tile cases."""
    return {case_name: _read_tile_case(case_name) for case_name in TEST_TILE_CASES}


@pytest.fixture
def tile_case(request, tile_case_catalog):
    case_name = request.param
    assert case_name in tile_case_catalog, f"missing tile case in catalog: {case_name}"
    return tile_case_catalog[case_name]


TINY_MODEL_CFG_KW = dict(
    base_filters=8,
    levels=2,
    enc_blocks=1,
    dec_blocks=1,
    fuse_filters=8,
    fuse_blocks=1,
    scale=4,
    lr_tile=8,
)


@pytest.fixture(scope="session")
def tiny_model_fp(tmp_path_factory) -> pathlib.Path:
    """A small deterministic model artifact for pipeline/CLI tests."""
    from floodsr_tpu.nn import ResUNetConfig, init_resunet
    from floodsr_tpu.nn.checkpoint import save_artifact

    cfg = ResUNetConfig(**TINY_MODEL_CFG_KW)
    params, state = init_resunet(20260816, cfg)
    fp = tmp_path_factory.mktemp("model") / "model_infer.fsrz"
    save_artifact(fp, cfg, params, state, {"seed": 20260816, "purpose": "tests"})
    return fp


def _write_geotiff(fp, array, transform, crs, nodata=-9999.0):
    from floodsr_tpu.io import write_raster

    profile = {
        "driver": "GTiff",
        "height": int(array.shape[0]),
        "width": int(array.shape[1]),
        "count": 1,
        "dtype": "float32",
        "crs": crs,
        "transform": transform,
        "nodata": float(nodata),
        "compress": "LZW",
    }
    write_raster(fp, np.asarray(array, np.float32), profile)


@pytest.fixture(scope="session")
def synthetic_tohr_tiles(tmp_path_factory):
    """On-the-fly raster inputs for ToHR coverage tests (native 4x scale)."""
    from floodsr_tpu.io import from_origin

    root = tmp_path_factory.mktemp("tohr_tiles")
    lr_shape = (16, 16)
    hr_shape = (64, 64)
    crs = "EPSG:32633"
    lr_res, hr_res = 30.0, 7.5
    x0, y0 = 500000.0, 4000000.0

    rng = np.random.default_rng(7)
    depth_lr = rng.uniform(0.0, 2.0, lr_shape).astype(np.float32)
    dem = (
        500.0
        + np.cumsum(rng.normal(0, 0.5, hr_shape).astype(np.float32), axis=1)
        + np.linspace(0, 50, hr_shape[0], dtype=np.float32)[:, None]
    )

    depth_lr_fp = root / "depth_lr.tif"
    dem_fp = root / "dem.tif"
    _write_geotiff(
        depth_lr_fp, depth_lr,
        from_origin(x0, y0 + lr_shape[0] * lr_res, lr_res, lr_res), crs,
    )
    _write_geotiff(
        dem_fp, dem,
        from_origin(x0, y0 + hr_shape[0] * hr_res, hr_res, hr_res), crs,
    )
    return {
        "depth_lr_fp": depth_lr_fp,
        "dem_fp": dem_fp,
        "lr_shape": lr_shape,
        "hr_shape": hr_shape,
        "output_fp": root / "pred_sr.tif",
    }


@pytest.fixture(scope="session")
def synthetic_nonnative_tiles(tmp_path_factory):
    """DEM on a finer grid than lr_res/scale → exercises post-resample."""
    from floodsr_tpu.io import from_origin

    root = tmp_path_factory.mktemp("tohr_nonnative")
    lr_shape = (16, 16)
    dem_shape = (96, 96)  # 5 m over the same 480 m extent (model space is 64²)
    crs = "EPSG:32633"
    lr_res, dem_res = 30.0, 5.0
    x0, y0 = 500000.0, 4000000.0

    rng = np.random.default_rng(11)
    depth_lr = rng.uniform(0.0, 3.0, lr_shape).astype(np.float32)
    dem = 300.0 + np.cumsum(rng.normal(0, 0.4, dem_shape).astype(np.float32), axis=0)

    depth_lr_fp = root / "depth_lr.tif"
    dem_fp = root / "dem.tif"
    _write_geotiff(
        depth_lr_fp, depth_lr,
        from_origin(x0, y0 + lr_shape[0] * lr_res, lr_res, lr_res), crs,
    )
    _write_geotiff(
        dem_fp, dem,
        from_origin(x0, y0 + dem_shape[0] * dem_res, dem_res, dem_res), crs,
    )
    return {
        "depth_lr_fp": depth_lr_fp,
        "dem_fp": dem_fp,
        "dem_shape": dem_shape,
        "output_fp": root / "pred_sr.tif",
    }


@pytest.fixture(scope="function")
def models_manifest_fp(tmp_path: pathlib.Path) -> pathlib.Path:
    """Local one-model manifest pointing at a file:// blob with a real sha256."""
    source_fp = tmp_path / "source_model.fsrz"
    source_fp.write_bytes(b"cli-test-model")
    sha256 = hashlib.sha256(source_fp.read_bytes()).hexdigest()
    manifest = {
        "models": {
            "v-cli": {
                "file_name": "model.fsrz",
                "url": source_fp.as_uri(),
                "sha256": sha256,
                "description": "Local CLI test model.",
            }
        }
    }
    manifest_fp = tmp_path / "models.json"
    manifest_fp.write_text(json.dumps(manifest), encoding="utf-8")
    return manifest_fp
