"""Data-driven ToHR regression: golden metrics via the machine-interface CLI.

Mirror of the reference harness (reference:
``tests/test_tohr_regression.py:27-75``): for every ``tests/data/*/
case_spec.json`` × run-label, build a machine-interface JSON from the case
params, invoke the real CLI ``main(["tohr", "--machine-json", ...])``, read
the written GeoTIFF, compute metrics, and assert rounded-to-precision
equality against the pinned goldens. The model artifact is the committed
deterministic test checkpoint named by the case spec.
"""

import json
from pathlib import Path

import numpy as np
import pytest

from conftest import TEST_TILE_CASES
from floodsr_tpu.cli import main
from floodsr_tpu.eval import compute_depth_error_metrics
from floodsr_tpu.io import read_raster
from floodsr_tpu.ops.normalize import replace_nodata_with_zero

pytestmark = pytest.mark.e2e

_DATA_DRIVEN_CASES = [
    pytest.param(case_name, id=f"data_case_{case_name.lower()}")
    for case_name in TEST_TILE_CASES
]

_DATA_DIR = Path(__file__).parent / "data"


def _case_model_fp(case_spec: dict) -> Path:
    artifact_rel = case_spec.get("model_artifact", "_artifacts/model_infer_test.fsrz")
    model_fp = _DATA_DIR / artifact_rel
    assert model_fp.exists(), f"missing committed test artifact: {model_fp}"
    return model_fp


@pytest.mark.skipif(not TEST_TILE_CASES, reason="no data-driven cases generated")
@pytest.mark.parametrize("tile_case", _DATA_DRIVEN_CASES, indirect=True)
def test_tohr_regression_matches_case_spec_metrics(tile_case: dict, tmp_path: Path):
    case_spec = tile_case["case_spec"]
    tile_dir = tile_case["tile_dir"]
    model_fp = _case_model_fp(case_spec)

    truth_raw, truth_nodata, _ = read_raster(tile_dir / case_spec["inputs"]["truth_fp"])
    truth = replace_nodata_with_zero(truth_raw, truth_nodata)

    for run_label, run_spec in case_spec["expected"].items():
        output_fp = tmp_path / f"{tile_case['case_name']}_{run_label}_pred_sr.tif"
        machine_payload = {
            "in_fp": str(tile_dir / case_spec["inputs"]["lowres_fp"]),
            "dem": str(tile_dir / case_spec["inputs"]["dem_fp"]),
            "out": str(output_fp),
            "model_path": str(model_fp),
        }
        machine_payload.update(run_spec["params"])
        machine_json_fp = tmp_path / f"{tile_case['case_name']}_{run_label}_machine.json"
        machine_json_fp.write_text(json.dumps(machine_payload), encoding="utf-8")

        exit_code = main(["tohr", "--machine-json", str(machine_json_fp)])
        assert exit_code == 0

        pred, _, _ = read_raster(output_fp)
        assert pred.dtype == np.float32
        assert pred.size > 0

        metrics = compute_depth_error_metrics(
            reference_depth_m=truth, estimate_depth_m=pred, max_depth=5.0
        )
        precision = int(run_spec["metrics"].get("precision", 3))
        rounded_actual = {
            key: round(float(metrics[key]), precision)
            for key in ("mase_m", "rmse_m", "ssim")
        }
        rounded_expected = {
            key: round(float(run_spec["metrics"][key]), precision)
            for key in ("mase_m", "rmse_m", "ssim")
        }
        assert isinstance(case_spec["flags"]["in_hrdem"], bool)
        assert rounded_actual == rounded_expected, (
            f"{tile_case['case_name']}/{run_label}: {rounded_actual} != {rounded_expected}"
        )


@pytest.mark.e2e
def test_requalify_dry_run_workflow(tmp_path):
    """Offline rehearsal of the real-artifact requalification workflow.

    Exercises every step of bin/requalify_reference.py except the two HTTPS
    fetches: registry fetch via file:// (.part + sha256 + atomic rename),
    ONNX→fsrz conversion, converted-vs-direct execution parity, and the
    CLI + metrics case loop (reference harness shape:
    ``tests/test_tohr_regression.py:27-75``).
    """
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "requalify_reference",
        Path(__file__).parents[1] / "bin" / "requalify_reference.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    verdict = mod.run_dry_run(tmp_path)
    assert verdict["steps"]["fetch_model"]["ok"]
    assert verdict["steps"]["convert_onnx_to_fsrz"]["ok"]
    assert verdict["steps"]["conversion_parity_max_abs_norm"] <= 1e-3
    assert verdict["workflow_ok"], json.dumps(verdict, indent=1)
    # Dry-run must never claim the golden-metrics gate: it is null until the
    # physical released artifact runs online (so is every per-case gate).
    assert verdict["pass"] is None
    assert verdict["metrics_gate"] is None
    for case in verdict["cases"].values():
        for run in case.values():
            assert "pass" not in run
            assert run["metrics_gate"] is None
