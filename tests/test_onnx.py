"""ONNX reader + JAX executor: wire-format parsing and op semantics vs torch.

The image has no ``onnx`` package (torch cannot export), so these tests build
ONNX protobuf bytes directly with a minimal encoder and cross-validate the
JAX executor against torch forward passes using identical weights.
"""

import struct

import numpy as np
import pytest
import torch
import torch.nn as nn

from floodsr_tpu.nn.onnx_exec import OnnxGraphExecutor
from floodsr_tpu.nn.onnx_reader import count_parameters, load_model

pytestmark = pytest.mark.unit


from onnx_build import (  # noqa: E402  (shared mini ONNX encoder)
    _attr,
    _len_field,
    _node,
    _str_field,
    _tag,
    _tensor,
    _value_info,
    _varint,
    _varint_field,
    build_onnx,
)

# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


class TestParser:
    def test_parse_roundtrip(self, rng):
        w = rng.normal(size=(4, 1, 3, 3)).astype(np.float32)
        data = build_onnx(
            [_node("Conv", ["x", "w"], ["y"], {"strides": [1, 1], "pads": [1, 1, 1, 1]})],
            {"w": w},
            [("x", (1, 1, 8, 8))],
            [("y", (1, 4, 8, 8))],
        )
        model = load_model(data)
        assert model.ir_version == 7
        assert model.opset == 13
        assert model.producer == "floodsr-tpu-test"
        assert len(model.nodes) == 1
        assert model.nodes[0].op_type == "Conv"
        assert model.nodes[0].attributes["pads"] == [1, 1, 1, 1]
        np.testing.assert_array_equal(model.initializers["w"], w)
        assert [vi.name for vi in model.graph_inputs] == ["x"]
        assert count_parameters(model) == w.size

    def test_not_onnx_raises(self):
        with pytest.raises(ValueError):
            load_model(b"\x0a\x02hi")  # field 1 as LEN: no graph


def build_dual_input_onnx(lr_tile=4, scale=2, channels=4, seed=0):
    """NHWC dual-input SR graph matching the engine contract conventions.

    Inputs ``depth_lr [N,h,w,1]`` / ``dem_hr [N,H,W,1]`` (NHWC like the
    tf2onnx-exported reference), internal NCHW compute via Transpose.
    """
    rng = np.random.default_rng(seed)
    hr = lr_tile * scale
    w_conv = (rng.normal(size=(channels, 2, 3, 3)) * 0.2).astype(np.float32)
    b_conv = np.zeros(channels, np.float32)
    w_up = (rng.normal(size=(channels, channels, scale, scale)) * 0.2).astype(np.float32)
    b_up = np.zeros(channels, np.float32)
    w_head = (rng.normal(size=(1, channels + 1, 1, 1)) * 0.2).astype(np.float32)
    b_head = np.array([0.3], np.float32)
    nodes = [
        _node("Transpose", ["depth_lr"], ["d_nchw"], {"perm": [0, 3, 1, 2]}),
        _node("Transpose", ["dem_hr"], ["m_nchw"], {"perm": [0, 3, 1, 2]}),
        _node(
            "AveragePool", ["m_nchw"], ["m_lr"],
            {"kernel_shape": [scale, scale], "strides": [scale, scale]},
        ),
        _node("Concat", ["d_nchw", "m_lr"], ["cat"], {"axis": 1}),
        _node("Conv", ["cat", "w1", "b1"], ["f0"], {"strides": [1, 1], "pads": [1, 1, 1, 1]}),
        _node("Relu", ["f0"], ["f"]),
        _node(
            "ConvTranspose", ["f", "w2", "b2"], ["u0"],
            {"strides": [scale, scale], "pads": [0, 0, 0, 0]},
        ),
        _node("Relu", ["u0"], ["u"]),
        _node("Concat", ["u", "m_nchw"], ["fuse"], {"axis": 1}),
        _node("Conv", ["fuse", "w3", "b3"], ["p_nchw"], {"strides": [1, 1], "pads": [0, 0, 0, 0]}),
        _node("Transpose", ["p_nchw"], ["depth_hr_pred"], {"perm": [0, 2, 3, 1]}),
    ]
    inits = {"w1": w_conv, "b1": b_conv, "w2": w_up, "b2": b_up, "w3": w_head, "b3": b_head}
    return build_onnx(
        nodes,
        inits,
        [("depth_lr", (1, lr_tile, lr_tile, 1)), ("dem_hr", (1, hr, hr, 1))],
        [("depth_hr_pred", (1, hr, hr, 1))],
    )


class TestEngineWithOnnxArtifact:
    @pytest.fixture(scope="class")
    def onnx_model_fp(self, tmp_path_factory):
        fp = tmp_path_factory.mktemp("onnx_model") / "model_infer.onnx"
        fp.write_bytes(build_dual_input_onnx())
        return fp

    def test_engine_loads_onnx_and_resolves_contract(self, onnx_model_fp):
        from floodsr_tpu.engine import EngineJAX

        eng = EngineJAX(onnx_model_fp, max_batch=4)
        assert eng.contract.depth_lr_hwc == (4, 4, 1)
        assert eng.contract.dem_hr_hwc == (8, 8, 1)
        assert eng.contract.scale == 2
        r = eng.run_tile(
            np.random.default_rng(0).uniform(0, 2, (4, 4)).astype(np.float32),
            np.random.default_rng(1).uniform(100, 300, (8, 8)).astype(np.float32),
        )
        assert r["prediction_m"].shape == (8, 8)
        assert np.isfinite(r["prediction_m"]).all()
        eng.close()

    def test_tohr_with_onnx_model(self, onnx_model_fp, tmp_path, logger):
        from floodsr_tpu.io import from_origin, read_raster, write_raster
        from floodsr_tpu.tohr import tohr

        rng = np.random.default_rng(3)
        lr = rng.uniform(0, 2, (8, 8)).astype(np.float32)
        dem = rng.uniform(100, 200, (16, 16)).astype(np.float32)

        def prof(a, res, top):
            return {
                "height": a.shape[0], "width": a.shape[1], "count": 1,
                "dtype": "float32", "crs": "EPSG:32633", "nodata": -9999.0,
                "transform": from_origin(0.0, top, res, res), "compress": "LZW",
            }

        lr_fp, dem_fp = tmp_path / "lr.tif", tmp_path / "dem.tif"
        write_raster(lr_fp, lr, prof(lr, 30.0, 240.0))
        write_raster(dem_fp, dem, prof(dem, 15.0, 240.0))
        out_fp = tmp_path / "sr.tif"
        result = tohr(
            model_version="ResUNet_16x_DEM",
            model_fp=onnx_model_fp,
            depth_lr_fp=lr_fp,
            dem_hr_fp=dem_fp,
            output_fp=out_fp,
            tile_overlap=1,
            logger=logger,
        )
        pred, _, _ = read_raster(result["output_fp"])
        assert pred.shape == (16, 16)
        assert np.isfinite(pred).all()


class TestExecutorVsTorch:
    def _run_ours(self, data: bytes, feeds: dict) -> np.ndarray:
        model = load_model(data)
        executor = OnnxGraphExecutor(model)
        out = executor(feeds)
        return np.asarray(list(out.values())[0])

    def test_conv_bn_relu(self, rng):
        torch_net = nn.Sequential(
            nn.Conv2d(2, 6, 3, padding=1), nn.BatchNorm2d(6), nn.ReLU()
        ).eval()
        with torch.no_grad():
            torch_net[1].running_mean.copy_(torch.randn(6))
            torch_net[1].running_var.copy_(torch.rand(6) + 0.5)
        x = rng.normal(size=(1, 2, 10, 10)).astype(np.float32)
        want = torch_net(torch.from_numpy(x)).detach().numpy()

        conv, bn = torch_net[0], torch_net[1]
        data = build_onnx(
            [
                _node("Conv", ["x", "w", "b"], ["c"], {"strides": [1, 1], "pads": [1, 1, 1, 1]}),
                _node(
                    "BatchNormalization",
                    ["c", "scale", "offset", "mean", "var"],
                    ["n"],
                    {"epsilon": float(bn.eps)},
                ),
                _node("Relu", ["n"], ["y"]),
            ],
            {
                "w": conv.weight.detach().numpy(),
                "b": conv.bias.detach().numpy(),
                "scale": bn.weight.detach().numpy(),
                "offset": bn.bias.detach().numpy(),
                "mean": bn.running_mean.numpy(),
                "var": bn.running_var.numpy(),
            },
            [("x", x.shape)],
            [("y", want.shape)],
        )
        got = self._run_ours(data, {"x": x})
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_strided_conv_same_upper(self, rng):
        # tf2onnx-style SAME_UPPER auto padding with stride 2: total pad is
        # k - stride = 1, placed at the END (unlike torch's symmetric pad).
        torch_net = nn.Conv2d(3, 5, 3, stride=2, padding=0).eval()
        x = rng.normal(size=(2, 3, 8, 8)).astype(np.float32)
        x_padded = torch.nn.functional.pad(torch.from_numpy(x), (0, 1, 0, 1))
        want = torch_net(x_padded).detach().numpy()
        data = build_onnx(
            [_node("Conv", ["x", "w", "b"], ["y"], {"strides": [2, 2], "auto_pad": "SAME_UPPER"})],
            {"w": torch_net.weight.detach().numpy(), "b": torch_net.bias.detach().numpy()},
            [("x", x.shape)],
            [("y", want.shape)],
        )
        got = self._run_ours(data, {"x": x})
        np.testing.assert_allclose(got, want, atol=1e-5)

    @pytest.mark.parametrize("stride,kernel", [(2, 2), (2, 4), (4, 4)])
    def test_conv_transpose(self, rng, stride, kernel):
        pad = (kernel - stride) // 2
        torch_net = nn.ConvTranspose2d(4, 3, kernel, stride=stride, padding=pad).eval()
        x = rng.normal(size=(1, 4, 6, 6)).astype(np.float32)
        want = torch_net(torch.from_numpy(x)).detach().numpy()
        data = build_onnx(
            [
                _node(
                    "ConvTranspose",
                    ["x", "w", "b"],
                    ["y"],
                    {"strides": [stride, stride], "pads": [pad, pad, pad, pad]},
                )
            ],
            {"w": torch_net.weight.detach().numpy(), "b": torch_net.bias.detach().numpy()},
            [("x", x.shape)],
            [("y", want.shape)],
        )
        got = self._run_ours(data, {"x": x})
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_avgpool_concat_add(self, rng):
        x = rng.normal(size=(1, 2, 8, 8)).astype(np.float32)
        pool = nn.AvgPool2d(2)
        want_pool = pool(torch.from_numpy(x)).numpy()
        want = np.concatenate([want_pool, want_pool + 1.0], axis=1)
        data = build_onnx(
            [
                _node("AveragePool", ["x"], ["p"], {"kernel_shape": [2, 2], "strides": [2, 2]}),
                _node("Add", ["p", "one"], ["p1"]),
                _node("Concat", ["p", "p1"], ["y"], {"axis": 1}),
            ],
            {"one": np.ones((1,), np.float32)},
            [("x", x.shape)],
            [("y", want.shape)],
        )
        got = self._run_ours(data, {"x": x})
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_mini_dual_input_sr_graph(self, rng):
        """A miniature of the reference's dual-input graph shape: depth_lr +
        dem_hr -> pooled concat -> conv -> convT upsample -> fuse -> head."""
        depth = rng.uniform(0, 1, (1, 1, 4, 4)).astype(np.float32)
        dem = rng.uniform(0, 1, (1, 1, 8, 8)).astype(np.float32)

        conv = nn.Conv2d(2, 4, 3, padding=1).eval()
        up = nn.ConvTranspose2d(4, 4, 2, stride=2).eval()
        head = nn.Conv2d(5, 1, 1).eval()
        with torch.no_grad():
            t_pool = nn.functional.avg_pool2d(torch.from_numpy(dem), 2)
            t_cat = torch.cat([torch.from_numpy(depth), t_pool], dim=1)
            t_feat = torch.relu(conv(t_cat))
            t_up = torch.relu(up(t_feat))
            t_fuse = torch.cat([t_up, torch.from_numpy(dem)], dim=1)
            want = head(t_fuse).numpy()

        data = build_onnx(
            [
                _node("AveragePool", ["dem_hr"], ["dem_lr"], {"kernel_shape": [2, 2], "strides": [2, 2]}),
                _node("Concat", ["depth_lr", "dem_lr"], ["cat"], {"axis": 1}),
                _node("Conv", ["cat", "w1", "b1"], ["f0"], {"strides": [1, 1], "pads": [1, 1, 1, 1]}),
                _node("Relu", ["f0"], ["f"]),
                _node("ConvTranspose", ["f", "w2", "b2"], ["u0"], {"strides": [2, 2], "pads": [0, 0, 0, 0]}),
                _node("Relu", ["u0"], ["u"]),
                _node("Concat", ["u", "dem_hr"], ["fuse"], {"axis": 1}),
                _node("Conv", ["fuse", "w3", "b3"], ["depth_hr_pred"], {"strides": [1, 1], "pads": [0, 0, 0, 0]}),
            ],
            {
                "w1": conv.weight.detach().numpy(),
                "b1": conv.bias.detach().numpy(),
                "w2": up.weight.detach().numpy(),
                "b2": up.bias.detach().numpy(),
                "w3": head.weight.detach().numpy(),
                "b3": head.bias.detach().numpy(),
            },
            [("depth_lr", depth.shape), ("dem_hr", dem.shape)],
            [("depth_hr_pred", want.shape)],
        )
        model = load_model(data)
        assert [vi.name for vi in model.graph_inputs] == ["depth_lr", "dem_hr"]
        executor = OnnxGraphExecutor(model)
        got = np.asarray(executor({"depth_lr": depth, "dem_hr": dem})["depth_hr_pred"])
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestOpEdgeCases:
    """Edge-case op semantics flagged in review: Clip min-only, Pad modes."""

    def _run(self, data: bytes, feeds: dict) -> np.ndarray:
        model = load_model(data)
        out = OnnxGraphExecutor(model)(feeds)
        return np.asarray(list(out.values())[0])

    def test_clip_min_only_input(self, rng):
        # Opset-11+ Clip with exactly (x, min): must clip the low side.
        x = rng.normal(size=(2, 3)).astype(np.float32)
        data = build_onnx(
            [_node("Clip", ["x", "lo"], ["y"])],
            {"lo": np.float32(0.0).reshape(())},
            [("x", x.shape)],
            [("y", x.shape)],
        )
        got = self._run(data, {"x": x})
        np.testing.assert_allclose(got, np.clip(x, 0.0, None), atol=0)

    def test_clip_min_and_max_inputs(self, rng):
        x = rng.normal(size=(2, 3)).astype(np.float32)
        data = build_onnx(
            [_node("Clip", ["x", "lo", "hi"], ["y"])],
            {"lo": np.float32(-0.5).reshape(()), "hi": np.float32(0.5).reshape(())},
            [("x", x.shape)],
            [("y", x.shape)],
        )
        got = self._run(data, {"x": x})
        np.testing.assert_allclose(got, np.clip(x, -0.5, 0.5), atol=0)

    def test_pad_reflect_and_edge_modes(self, rng):
        x = rng.normal(size=(1, 1, 4, 4)).astype(np.float32)
        pads = np.array([0, 0, 1, 1, 0, 0, 1, 1], np.int64)
        for mode in ("reflect", "edge"):
            data = build_onnx(
                [_node("Pad", ["x", "pads"], ["y"], {"mode": mode})],
                {"pads": pads},
                [("x", x.shape)],
                [("y", (1, 1, 6, 6))],
            )
            got = self._run(data, {"x": x})
            want = np.pad(x, [(0, 0), (0, 0), (1, 1), (1, 1)], mode=mode)
            np.testing.assert_allclose(got, want, atol=0, err_msg=mode)

    def test_pad_constant_value_input(self, rng):
        x = rng.normal(size=(1, 1, 4, 4)).astype(np.float32)
        pads = np.array([0, 0, 1, 1, 0, 0, 1, 1], np.int64)
        data = build_onnx(
            [_node("Pad", ["x", "pads", "cval"], ["y"])],
            {"pads": pads, "cval": np.float32(7.5).reshape(())},
            [("x", x.shape)],
            [("y", (1, 1, 6, 6))],
        )
        got = self._run(data, {"x": x})
        want = np.pad(x, [(0, 0), (0, 0), (1, 1), (1, 1)], constant_values=7.5)
        np.testing.assert_allclose(got, want, atol=0)
