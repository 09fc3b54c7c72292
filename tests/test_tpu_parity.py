"""TPU↔CPU parity: golden cases re-run on the accelerator (opt-in).

The regression goldens are pinned on the CPU backend; this suite re-runs
them on the real device and gates on the BASELINE tolerance (≤1e-3 m RMSE
between backends). Skipped unless ``FLOODSR_RUN_TPU_TESTS=1`` (the chip is a
shared, contended resource in CI).
"""

import json
import os
from pathlib import Path

import numpy as np
import pytest

from conftest import TEST_TILE_CASES

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        os.environ.get("FLOODSR_RUN_TPU_TESTS") != "1",
        reason="set FLOODSR_RUN_TPU_TESTS=1 to run on the real device",
    ),
]

_DATA_DIR = Path(__file__).parent / "data"


@pytest.mark.parametrize("case_name", TEST_TILE_CASES)
def test_tpu_output_matches_cpu_golden(case_name, tmp_path):
    # Run the pipeline in a TPU subprocess (this test session is CPU-pinned).
    import subprocess
    import sys

    tile_dir = _DATA_DIR / case_name
    case_spec = json.loads((tile_dir / "case_spec.json").read_text())
    model_fp = _DATA_DIR / case_spec.get(
        "model_artifact", "_artifacts/model_infer_test.fsrz"
    )
    out_tpu = tmp_path / "pred_tpu.tif"
    script = f"""
import sys; sys.path.insert(0, {str(Path(__file__).parents[1])!r})
import jax
assert jax.default_backend() == "tpu", jax.default_backend()
from floodsr_tpu.tohr import tohr
tohr(
    model_version="ResUNet_16x_DEM",
    model_fp={str(model_fp)!r},
    depth_lr_fp={str(tile_dir / case_spec["inputs"]["lowres_fp"])!r},
    dem_hr_fp={str(tile_dir / case_spec["inputs"]["dem_fp"])!r},
    output_fp={str(out_tpu)!r},
)
"""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["JAX_PLATFORMS"] = "axon"
    result = subprocess.run(
        [sys.executable, "-c", script], env=env, capture_output=True, text=True,
        timeout=1200,
    )
    assert result.returncode == 0, result.stderr[-3000:]

    # CPU reference output in-process.
    from floodsr_tpu.io import read_raster
    from floodsr_tpu.tohr import tohr

    out_cpu = tmp_path / "pred_cpu.tif"
    tohr(
        model_version="ResUNet_16x_DEM",
        model_fp=model_fp,
        depth_lr_fp=tile_dir / case_spec["inputs"]["lowres_fp"],
        dem_hr_fp=tile_dir / case_spec["inputs"]["dem_fp"],
        output_fp=out_cpu,
    )
    pred_tpu, _, _ = read_raster(out_tpu)
    pred_cpu, _, _ = read_raster(out_cpu)
    rmse = float(np.sqrt(np.mean((pred_tpu - pred_cpu) ** 2)))
    assert rmse <= 1e-3, f"TPU-vs-CPU RMSE {rmse} exceeds 1e-3 m for {case_name}"
