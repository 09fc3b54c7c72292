"""ONNX → .fsrz conversion: IR correctness and engine-level equivalence.

VERDICT r1 item 6: the converter compiles a foreign (tf2onnx-idiom) graph to
the NHWC native IR; these tests pin (a) converter-vs-interpreter numerical
agreement, (b) round-trip through the artifact format, and (c) engine parity:
``EngineJAX(.onnx)`` output == ``EngineJAX(converted .fsrz)`` output through
``run_scene``, including at full reference parameter scale.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from onnx_replica import HR_TILE, LR_TILE, build_reference_replica
from test_onnx import build_dual_input_onnx

from floodsr_tpu.engine import EngineJAX
from floodsr_tpu.nn.checkpoint import load_artifact
from floodsr_tpu.nn.onnx_convert import convert_onnx_to_fsrz, graph_apply
from floodsr_tpu.nn.onnx_exec import OnnxGraphExecutor
from floodsr_tpu.nn.onnx_reader import load_model

pytestmark = pytest.mark.unit


class TestConverterSmallGraph:
    @pytest.fixture(scope="class")
    def small(self, tmp_path_factory):
        data = build_dual_input_onnx(lr_tile=8, scale=4, channels=8, seed=5)
        fsrz = tmp_path_factory.mktemp("conv") / "converted.fsrz"
        convert_onnx_to_fsrz(data, fsrz)
        return data, fsrz

    def test_ir_matches_interpreter(self, small):
        data, fsrz = small
        model = load_model(data)
        art = load_artifact(fsrz)
        manifest = art["manifest"]
        assert manifest["architecture"] == "onnx-graph"

        rng = np.random.default_rng(0)
        depth = rng.uniform(0, 1, (2, 8, 8, 1)).astype(np.float32)
        dem = rng.uniform(0, 1, (2, 32, 32, 1)).astype(np.float32)
        want = np.asarray(
            OnnxGraphExecutor(model)({"depth_lr": depth, "dem_hr": dem})["depth_hr_pred"]
        )
        got = np.asarray(
            graph_apply(
                manifest["graph_ir"],
                {k: jnp.asarray(v) for k, v in art["params"].items()},
                {"depth_lr": jnp.asarray(depth), "dem_hr": jnp.asarray(dem)},
                [manifest["graph_output_edge"]],
            )[manifest["graph_output_edge"]]
        )
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)

    def test_transposes_and_plumbing_eliminated(self, small):
        _, fsrz = small
        ir = load_artifact(fsrz)["manifest"]["graph_ir"]
        kinds = {op["op"] for op in ir}
        assert "transpose" not in kinds
        assert not any(k in kinds for k in ("shape", "gather", "slice", "reshape"))

    def test_engine_scene_parity_onnx_vs_converted(self, small, tmp_path):
        data, fsrz = small
        onnx_fp = tmp_path / "model.onnx"
        onnx_fp.write_bytes(data)

        rng = np.random.default_rng(1)
        depth = rng.uniform(0, 3, (16, 16)).astype(np.float32)
        dem = rng.uniform(300, 800, (64, 64)).astype(np.float32)
        outs = {}
        for name, fp in (("onnx", onnx_fp), ("converted", fsrz)):
            eng = EngineJAX(fp, max_batch=4, output_transfer="float32")
            out, _ = eng.run_scene(
                depth, dem, stride_hr=24, overlap_hr=8,
                max_depth=5.0, dem_pct_clip=95.0, crop_shape=(64, 64),
            )
            outs[name] = out
            eng.close()
        np.testing.assert_allclose(outs["converted"], outs["onnx"], atol=5e-5)


class TestConverterFullScaleReplica:
    def test_replica_round_trip_and_scene_parity(self, tmp_path):
        data, _ = build_reference_replica(seed=11)
        onnx_fp = tmp_path / "replica.onnx"
        onnx_fp.write_bytes(data)
        fsrz = tmp_path / "replica.fsrz"
        convert_onnx_to_fsrz(data, fsrz)

        art = load_artifact(fsrz)
        manifest = art["manifest"]
        assert manifest["io_contract"]["scale"] == 16
        assert manifest["metadata"]["onnx_param_count"] > 12_000_000
        # BN folding: no standalone affines should survive (every BN follows
        # a single-consumer conv in this family).
        assert not any(op["op"] == "affine" for op in manifest["graph_ir"])

        rng = np.random.default_rng(2)
        depth = rng.uniform(0, 3, (LR_TILE, LR_TILE)).astype(np.float32)
        dem = rng.uniform(300, 800, (HR_TILE, HR_TILE)).astype(np.float32)
        outs = {}
        for name, fp in (("onnx", onnx_fp), ("converted", fsrz)):
            eng = EngineJAX(fp, max_batch=1, output_transfer="float32")
            out, _ = eng.run_scene(
                depth, dem, stride_hr=HR_TILE, overlap_hr=0,
                max_depth=5.0, dem_pct_clip=95.0, crop_shape=(HR_TILE, HR_TILE),
            )
            outs[name] = out
            eng.close()
        assert outs["onnx"].shape == (HR_TILE, HR_TILE)
        np.testing.assert_allclose(outs["converted"], outs["onnx"], atol=5e-5)
