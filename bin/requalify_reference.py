"""One-command requalification against the reference's REAL artifacts.

The reference pins its parity harness to the released ``model_infer.onnx``
and three git-LFS raster cases with golden metrics (reference:
``tests/test_tohr_regression.py:27-75``, ``tests/data/*/case_spec.json``).
Those artifacts are unreachable from the offline build harness; this script
is the single command that closes the loop the moment network exists:

    python bin/requalify_reference.py            # online requalification
    python bin/requalify_reference.py --dry-run  # offline workflow rehearsal

Online mode:
 (a) fetches the released ONNX through the model registry (real URL +
     sha256 from ``floodsr_tpu/models.json``, .part + checksum + atomic
     rename),
 (b) converts it to a native ``.fsrz`` via ``nn/onnx_convert``,
 (c) fetches the three real case rasters from GitHub's LFS media endpoint,
     verified against the LFS pointer sha256s pinned below (read from the
     reference checkout's pointer files),
 (d) runs the machine-interface CLI per case × run-label and computes
     mase/rmse/ssim exactly as the regression harness does, comparing to
     the reference's expected metrics at the spec'd precision, and
 (e) writes a JSON verdict (``requalify_verdict.json``) and exits 0 only
     if every case passes.

Offline ``--dry-run`` rehearses the identical workflow with zero egress:
a generated tf2onnx-idiom replica ONNX stands in for the release (fetched
through the registry via a file:// manifest, exercising fetch + checksum),
the converter produces the ``.fsrz``, the synthetic golden case's rasters
stand in for the LFS files, and the CLI + metrics path runs end-to-end.
The dry-run gate is workflow-shaped (conversion parity vs the direct
ONNX path + finite metrics), not golden-valued — replica weights are not
the trained release. Only the two HTTPS fetches differ online.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

LFS_MEDIA_BASE = "https://media.githubusercontent.com/media/cefect/floodsr/main"

#: Reference golden cases: expected metrics from
#: ``/root/reference/tests/data/<case>/case_spec.json`` and raster content
#: digests from the LFS pointer files at the same paths (``oid sha256:...``).
CASES = {
    "2407_FHIMP_tile": {
        "inputs": {"lowres_fp": "lowres032.tif", "dem_fp": "hires002_dem.tif",
                   "truth_fp": "hires002.tif"},
        "lfs_sha256": {
            "lowres032.tif": "73eeb51c0019e886fae2638e38bc56251b818eb2a0802d89713a07b556b10053",
            "hires002_dem.tif": "de50ec9060928f12caf4f405f8a58175bd62d49c9c5b3200e8d174691bf5a2ad",
            "hires002.tif": "17a8dd3d06a75cd37e373f6e64dec872bd638bc4a17e6b0d48dea3359e67fd92",
        },
        "expected": {
            "ResUNet_16x_DEM_default": {
                "params": {"model_version": "ResUNet_16x_DEM"},
                "metrics": {"precision": 3, "mase_m": 0.0588738657906549,
                            "rmse_m": 0.10593308482338049,
                            "ssim": 0.6661965858844487},
            }
        },
    },
    "rss_mersch_A": {
        "inputs": {"lowres_fp": "lowres030.tif", "dem_fp": "hires002_dem.tif",
                   "truth_fp": "hires002.tif"},
        "lfs_sha256": {
            "lowres030.tif": "8a8691363f5a64836df1fb01b5d289a06c9457960eef21e7aa1b18e9f809c287",
            "hires002_dem.tif": "2c958a37c7b25b9b57956817a0a4f6a290e747a8c90835a1720f7b2454ddef60",
            "hires002.tif": "8d1872a80f4c12e11088a48d867d0a759256eb283b3fc164bfe897d628b7a06c",
        },
        "expected": {
            "ResUNet_16x_DEM_default": {
                "params": {"model_version": "ResUNet_16x_DEM"},
                "metrics": {"precision": 3, "mase_m": 0.04416096852376296,
                            "rmse_m": 0.2903624856425355,
                            "ssim": 0.31122690073982445},
            }
        },
    },
    "rss_dudelange_A": {
        "inputs": {"lowres_fp": "lowres030.tif", "dem_fp": "hires003_dem.tif",
                   "truth_fp": "hires003.tif"},
        "lfs_sha256": {
            "lowres030.tif": "3f2c54a1d31c09bca5fa0d65d5ba2d7df548c256e151479c4db2c18c1a5579dd",
            "hires003_dem.tif": "675868e17456749065dd8c88d07507ad8e091472ba81dd9c0aaaab3cb2ad0644",
            "hires003.tif": "8401ee603f58ef7ce24f8f76604ba3e9febc123b505e65ebcf6c1651b2b1d5a8",
        },
        "expected": {
            "ResUNet_16x_DEM_default": {
                "params": {"model_version": "ResUNet_16x_DEM"},
                "metrics": {"precision": 3, "mase_m": 0.03275433880831328,
                            "rmse_m": 0.18901252658183912,
                            "ssim": 0.4688561808417386},
            }
        },
    },
}


def _download(url: str, dest: Path, sha256: str, transport=None) -> Path:
    """Fetch ``url`` to ``dest`` with digest verification (.part + rename)."""
    from urllib.request import Request, urlopen

    dest.parent.mkdir(parents=True, exist_ok=True)
    part = dest.with_suffix(dest.suffix + ".part")
    if dest.exists():
        digest = hashlib.sha256(dest.read_bytes()).hexdigest()
        if digest == sha256:
            return dest
    if transport is not None:
        body = transport(url, None, {})
    else:
        with urlopen(Request(url, headers={"User-Agent": "floodsr-tpu"}), timeout=300) as resp:  # nosec B310
            body = resp.read()
    digest = hashlib.sha256(body).hexdigest()
    if digest != sha256:
        raise RuntimeError(f"digest mismatch for {url}: got {digest}, want {sha256}")
    part.write_bytes(body)
    part.replace(dest)
    return dest


def _run_case(case_name: str, case: dict, case_dir: Path, model_fp: Path,
              work: Path) -> dict:
    """CLI run + metrics for every run-label of one case (harness-identical)."""
    from floodsr_tpu.cli import main as cli_main
    from floodsr_tpu.eval import compute_depth_error_metrics
    from floodsr_tpu.io import read_raster
    from floodsr_tpu.ops.normalize import replace_nodata_with_zero

    truth_raw, truth_nodata, _ = read_raster(case_dir / case["inputs"]["truth_fp"])
    truth = replace_nodata_with_zero(truth_raw, truth_nodata)

    out: dict = {}
    for run_label, run_spec in case["expected"].items():
        output_fp = work / f"{case_name}_{run_label}_pred_sr.tif"
        payload = {
            "in_fp": str(case_dir / case["inputs"]["lowres_fp"]),
            "dem": str(case_dir / case["inputs"]["dem_fp"]),
            "out": str(output_fp),
            "model_path": str(model_fp),
        }
        payload.update(
            {k: v for k, v in run_spec["params"].items() if k != "model_version"}
        )
        mj = work / f"{case_name}_{run_label}_machine.json"
        mj.write_text(json.dumps(payload), encoding="utf-8")
        code = cli_main(["tohr", "--machine-json", str(mj)])
        if code != 0:
            out[run_label] = {"pass": False, "error": f"CLI exit {code}"}
            continue
        pred, _, _ = read_raster(output_fp)
        metrics = compute_depth_error_metrics(
            reference_depth_m=truth, estimate_depth_m=pred, max_depth=5.0
        )
        precision = int(run_spec["metrics"].get("precision", 3))
        actual = {k: round(float(metrics[k]), precision)
                  for k in ("mase_m", "rmse_m", "ssim")}
        expected = {k: round(float(run_spec["metrics"][k]), precision)
                    for k in ("mase_m", "rmse_m", "ssim")}
        out[run_label] = {
            "expected": expected,
            "actual": actual,
            "precision": precision,
            "pass": actual == expected,
        }
    return out


def run_requalification(work: Path, *, transport=None, cases=None,
                        manifest_fp=None) -> dict:
    """The full online workflow; ``transport`` is injectable for tests."""
    from floodsr_tpu.model_registry import fetch_model
    from floodsr_tpu.nn.onnx_convert import convert_onnx_to_fsrz

    verdict: dict = {"mode": "online", "date": time.strftime("%Y-%m-%d"),
                     "steps": {}, "cases": {}}

    onnx_fp = fetch_model(
        "ResUNet_16x_DEM", cache_dir=work / "cache", manifest_fp=manifest_fp
    )
    verdict["steps"]["fetch_model"] = {"path": str(onnx_fp), "ok": True}

    fsrz_fp = work / "model_infer_real.fsrz"
    convert_onnx_to_fsrz(onnx_fp, fsrz_fp)
    verdict["steps"]["convert_onnx_to_fsrz"] = {"path": str(fsrz_fp), "ok": True}

    for case_name, case in (cases or CASES).items():
        case_dir = work / "cases" / case_name
        for fname, sha in case["lfs_sha256"].items():
            url = f"{LFS_MEDIA_BASE}/tests/data/{case_name}/{fname}"
            _download(url, case_dir / fname, sha, transport=transport)
        verdict["cases"][case_name] = _run_case(
            case_name, case, case_dir, fsrz_fp, work
        )

    verdict["workflow_ok"] = True  # every step above completed
    verdict["metrics_gate"] = all(
        run.get("pass", False)
        for case in verdict["cases"].values()
        for run in case.values()
    )
    verdict["pass"] = verdict["metrics_gate"]
    return verdict


def run_dry_run(work: Path) -> dict:
    """Offline rehearsal: replica ONNX through the identical workflow."""
    sys.path.insert(0, str(REPO / "tests"))
    from onnx_replica import build_reference_replica

    from floodsr_tpu.model_registry import fetch_model
    from floodsr_tpu.nn.onnx_convert import convert_onnx_to_fsrz

    verdict: dict = {"mode": "dry-run", "date": time.strftime("%Y-%m-%d"),
                     "steps": {}, "cases": {}}

    # Stand-in release: replica ONNX behind a file:// manifest → the real
    # fetch path (scheme dispatch, .part, sha256, atomic rename) runs.
    blob, _torch_model = build_reference_replica(seed=7, f=8)
    release_fp = work / "release" / "model_infer.onnx"
    release_fp.parent.mkdir(parents=True)
    release_fp.write_bytes(blob)
    manifest_fp = work / "models.json"
    manifest_fp.write_text(json.dumps({
        "models": {
            "ResUNet_16x_DEM": {
                "file_name": "model_infer.onnx",
                "url": release_fp.as_uri(),
                "sha256": hashlib.sha256(blob).hexdigest(),
                "description": "dry-run replica",
            }
        }
    }))
    onnx_fp = fetch_model(
        "ResUNet_16x_DEM", cache_dir=work / "cache", manifest_fp=manifest_fp
    )
    verdict["steps"]["fetch_model"] = {"path": str(onnx_fp), "ok": True}

    fsrz_fp = work / "model_infer_replica.fsrz"
    convert_onnx_to_fsrz(onnx_fp, fsrz_fp)
    verdict["steps"]["convert_onnx_to_fsrz"] = {"path": str(fsrz_fp), "ok": True}

    # Converter parity: converted .fsrz output ≡ direct-ONNX execution.
    from floodsr_tpu.engine import EngineJAX

    rng = np.random.default_rng(3)
    depth = rng.uniform(0, 3, (1, 32, 32)).astype(np.float32)
    dem = rng.normal(300, 20, (1, 512, 512)).astype(np.float32)
    eng_a = EngineJAX(fsrz_fp, output_transfer="float32")
    eng_b = EngineJAX(onnx_fp, output_transfer="float32")
    # Normalized-space comparison: the meter-domain expm1 inverse amplifies
    # float noise ~10x on the untrained replica's full-range outputs.
    pa = eng_a.run_tiles(depth, dem)["predictions_norm"]
    pb = eng_b.run_tiles(depth, dem)["predictions_norm"]
    eng_a.close(); eng_b.close()
    conv_max_abs = float(np.max(np.abs(pa - pb)))
    verdict["steps"]["conversion_parity_max_abs_norm"] = conv_max_abs

    # Case workflow on the committed synthetic golden (LFS stand-in). The
    # replica is untrained, so only the WORKFLOW is gated here (finite
    # metrics through the full CLI path); the metrics gate itself stays
    # null until the physical released artifact runs online — a dry-run
    # must never print a per-case "pass" beside mismatched goldens.
    case_dir = REPO / "tests/data/synth_single_tile"
    spec = json.loads((case_dir / "case_spec.json").read_text())
    case = {"inputs": spec["inputs"], "expected": spec["expected"]}
    result = _run_case("synth_single_tile", case, case_dir, fsrz_fp, work)
    for run in result.values():
        run.pop("pass", None)
        run["workflow_ok"] = all(
            np.isfinite(v) for v in run.get("actual", {}).values()
        ) if "actual" in run else False
        run["metrics_gate"] = None
        run["note"] = (
            "dry-run: workflow gate only (finite metrics through the real "
            "CLI); golden-metric comparison requires the online run"
        )
    verdict["cases"]["synth_single_tile"] = result

    # Gate at 1e-3 normalized: a converter BUG shows as O(0.1-1) divergence;
    # the untrained He-init replica legitimately amplifies f32 rounding to
    # ~2e-4 through its ~30-conv depth (trained weights are far tamer).
    verdict["workflow_ok"] = conv_max_abs <= 1e-3 and all(
        run.get("workflow_ok", False)
        for case in verdict["cases"].values()
        for run in case.values()
    )
    verdict["metrics_gate"] = None
    verdict["pass"] = None
    verdict["note"] = (
        "dry-run: pass/metrics_gate are null by design — they are decided "
        "only by the online run against the released ONNX + LFS goldens"
    )
    return verdict


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--dry-run", action="store_true",
                    help="offline workflow rehearsal (no network)")
    ap.add_argument("--out", type=Path, default=REPO / "requalify_verdict.json")
    ap.add_argument("--work", type=Path, default=None,
                    help="working directory (default: temp)")
    args = ap.parse_args()

    if args.work is not None:
        args.work.mkdir(parents=True, exist_ok=True)
        work_ctx = None
        work = args.work
    else:
        work_ctx = tempfile.TemporaryDirectory(prefix="floodsr-requalify-")
        work = Path(work_ctx.name)
    try:
        verdict = run_dry_run(work) if args.dry_run else run_requalification(work)
    finally:
        if work_ctx is not None:
            work_ctx.cleanup()
    args.out.write_text(json.dumps(verdict, indent=1) + "\n")
    print(json.dumps(verdict))
    # Dry-run exits on the workflow gate (pass is null until the online
    # goldens run); online exits on the real metrics gate.
    gate = verdict["pass"] if verdict["pass"] is not None else verdict["workflow_ok"]
    return 0 if gate else 1


if __name__ == "__main__":
    raise SystemExit(main())
