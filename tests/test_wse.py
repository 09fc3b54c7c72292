"""WSE ingestion (``--input-kind wse``): conversion math, e2e, CostGrow.

Implements the reference's planned-but-unbuilt "preprocessing WSE feature"
(reference ``PLAN.md``): water-surface-elevation rasters are converted to
depth against the DEM before super-resolution; CostGrow gains the inverse
(depth lifted to WSE, its native input).
"""

import numpy as np
import pytest

from floodsr_tpu.io import from_origin, read_raster, write_raster
from floodsr_tpu.model_registry import resolve_model_worker_class
from floodsr_tpu.preprocessing import wse_to_depth_lr
from floodsr_tpu.tohr import tohr

pytestmark = pytest.mark.unit

NODATA = -9999.0
CRS = "EPSG:32633"


def _profile(arr, transform, nodata=NODATA):
    return {
        "height": int(arr.shape[0]), "width": int(arr.shape[1]), "count": 1,
        "dtype": "float32", "crs": CRS, "transform": transform,
        "nodata": float(nodata), "compress": "LZW",
    }


class TestConversionMath:
    def test_wet_dry_nodata_and_dem_hole(self):
        lr_shape, scale = (8, 8), 4
        hr_shape = (32, 32)
        lr_t = from_origin(0, 320, 40.0, 40.0)
        dem_t = from_origin(0, 320, 10.0, 10.0)

        dem = np.full(hr_shape, 100.0, np.float32)
        dem_valid = np.ones(hr_shape, np.float32)
        # Knock out the DEM under LR cell (0, 0) entirely.
        dem[0:4, 0:4] = 0.0  # already "zeroed" form
        dem_valid[0:4, 0:4] = 0.0

        wse = np.full(lr_shape, NODATA, np.float32)
        wse[2, 3] = 101.5   # wet: depth 1.5
        wse[4, 4] = 99.0    # below terrain: dry
        wse[0, 0] = 105.0   # over the DEM hole: no valid terrain -> dry
        wse[5, 5] = 100.0   # exactly at terrain: dry

        depth = wse_to_depth_lr(wse, NODATA, lr_t, dem, dem_valid, dem_t)
        assert depth.shape == lr_shape and depth.dtype == np.float32
        np.testing.assert_allclose(depth[2, 3], 1.5, atol=1e-5)
        assert depth[4, 4] == 0.0
        assert depth[0, 0] == 0.0
        assert depth[5, 5] == 0.0
        assert depth[1, 1] == 0.0  # nodata WSE
        assert (depth >= 0).all()

    def test_fully_valid_dem_no_mask(self):
        lr_t = from_origin(0, 80, 20.0, 20.0)
        dem_t = from_origin(0, 80, 5.0, 5.0)
        dem = np.full((16, 16), 50.0, np.float32)
        wse = np.full((4, 4), 52.25, np.float32)
        depth = wse_to_depth_lr(wse, None, lr_t, dem, None, dem_t)
        np.testing.assert_allclose(depth, 2.25, atol=1e-5)


class TestTohrWse:
    @pytest.fixture(scope="class")
    def flat_scene(self, tmp_path_factory):
        """Per-LR-cell-constant DEM: depth and WSE inputs interconvert exactly.

        The bilinear taps for an LR cell center all land inside that cell's
        constant DEM block, so the sampled ``dem_lr`` equals the block value
        bit-for-bit and ``WSE − dem_lr`` reproduces the depth raster (up to
        one f32 rounding of the sum). Blocks vary across cells so the
        pipeline's per-tile DEM-range guard stays satisfied.
        """
        root = tmp_path_factory.mktemp("wse_scene")
        lr_shape, hr_shape = (16, 16), (64, 64)
        scale = 4
        lr_res, hr_res = 30.0, 7.5
        x0, y0 = 500000.0, 4000000.0
        rng = np.random.default_rng(11)
        depth = (
            rng.uniform(0.0, 2.0, lr_shape) * (rng.random(lr_shape) > 0.3)
        ).astype(np.float32)
        dem_lr = (100.0 + rng.uniform(0.0, 5.0, lr_shape)).astype(np.float32)
        dem = np.kron(dem_lr, np.ones((scale, scale), np.float32))
        assert dem.shape == hr_shape
        wse = dem_lr + depth

        lr_t = from_origin(x0, y0 + lr_shape[0] * lr_res, lr_res, lr_res)
        hr_t = from_origin(x0, y0 + hr_shape[0] * hr_res, hr_res, hr_res)
        paths = {
            "depth": root / "depth.tif",
            "wse": root / "wse.tif",
            "dem": root / "dem.tif",
        }
        write_raster(paths["depth"], depth, _profile(depth, lr_t))
        write_raster(paths["wse"], wse, _profile(wse, lr_t))
        write_raster(paths["dem"], dem, _profile(dem, hr_t))
        return paths

    def test_wse_input_matches_depth_input(
        self, tiny_model_fp, flat_scene, tmp_path, logger
    ):
        outs = {}
        for kind, in_key in (("depth", "depth"), ("wse", "wse")):
            out_fp = tmp_path / f"pred_{kind}.tif"
            result = tohr(
                model_version="ResUNet_16x_DEM",
                model_fp=tiny_model_fp,
                depth_lr_fp=flat_scene[in_key],
                dem_hr_fp=flat_scene["dem"],
                output_fp=out_fp,
                input_kind=kind,
                logger=logger,
            )
            assert result["preprocess"]["input_kind"] == kind
            outs[kind], _, _ = read_raster(out_fp)
        # Flat terrain: WSE−DEM reproduces the depth raster up to f32
        # rounding of (100+d)−100; the model output tracks it tightly.
        np.testing.assert_allclose(outs["wse"], outs["depth"], atol=1e-3)

    def test_default_is_model_native_depth(
        self, tiny_model_fp, flat_scene, tmp_path, logger
    ):
        result = tohr(
            model_version="ResUNet_16x_DEM",
            model_fp=tiny_model_fp,
            depth_lr_fp=flat_scene["depth"],
            dem_hr_fp=flat_scene["dem"],
            output_fp=tmp_path / "pred.tif",
            logger=logger,
        )
        assert result["preprocess"]["input_kind"] == "depth"

    def test_bad_input_kind_raises(self, tiny_model_fp, flat_scene, tmp_path, logger):
        with pytest.raises(AssertionError, match="input_kind"):
            tohr(
                model_version="ResUNet_16x_DEM",
                model_fp=tiny_model_fp,
                depth_lr_fp=flat_scene["depth"],
                dem_hr_fp=flat_scene["dem"],
                output_fp=tmp_path / "pred.tif",
                input_kind="velocity",
                logger=logger,
            )


class TestCostGrowDepthIngestion:
    @pytest.fixture(scope="class")
    def flat_costgrow_scene(self, tmp_path_factory):
        import json

        root = tmp_path_factory.mktemp("costgrow_wse")
        h = w = 64
        dem = np.full((h, w), 100.0, np.float32)
        wse_lr = np.full((8, 8), NODATA, np.float32)
        wse_lr[3:5, 2:6] = 102.5
        depth_lr = np.where(np.isclose(wse_lr, NODATA), NODATA, wse_lr - 100.0)

        lr_t = from_origin(0, 512, 64.0, 64.0)
        hr_t = from_origin(0, 512, 8.0, 8.0)
        paths = {
            "wse": root / "wse.tif",
            "depth": root / "depth.tif",
            "dem": root / "dem.tif",
            "params": root / "params.json",
        }
        write_raster(paths["wse"], wse_lr, _profile(wse_lr, lr_t))
        write_raster(paths["depth"], depth_lr, _profile(depth_lr, lr_t))
        write_raster(paths["dem"], dem, _profile(dem, hr_t))
        paths["params"].write_text(json.dumps({"max_grow_coarse_pixels": 2}))
        return paths

    def test_depth_ingestion_matches_native_wse(
        self, flat_costgrow_scene, tmp_path, logger
    ):
        worker_cls = resolve_model_worker_class("CostGrow")
        outs = {}
        for kind, in_key in (("wse", "wse"), ("depth", "depth")):
            out_fp = tmp_path / f"grown_{kind}.tif"
            with worker_cls(
                model_fp=flat_costgrow_scene["params"], logger=logger
            ) as worker:
                worker.run(
                    depth_lr_fp=flat_costgrow_scene[in_key],
                    dem_hr_fp=flat_costgrow_scene["dem"],
                    output_fp=out_fp,
                    input_kind=kind if kind == "depth" else None,
                )
            outs[kind], _, _ = read_raster(out_fp)
        np.testing.assert_allclose(outs["depth"], outs["wse"], atol=1e-4)


class TestCliPlumbing:
    def test_parse_and_machine_json(self, tmp_path):
        import json

        from floodsr_tpu.cli import (
            _build_tohr_machine_cli_tokens,
            _parse_arguments,
        )

        args = _parse_arguments(
            ["tohr", "--in", "a.tif", "--dem", "b.tif", "--input-kind", "wse"]
        )
        assert args.input_kind == "wse"
        args = _parse_arguments(["tohr", "--in", "a.tif", "--dem", "b.tif"])
        assert args.input_kind is None

        tokens = _build_tohr_machine_cli_tokens({"input_kind": "wse"}, [])
        assert tokens == ["--input-kind", "wse"]
        # Explicit CLI wins over machine-json.
        tokens = _build_tohr_machine_cli_tokens(
            {"input_kind": "wse"}, ["--input-kind", "depth"]
        )
        assert tokens == []
