"""End-to-end ToHR pipeline through the worker/tohr library surface."""

import numpy as np
import pytest

from floodsr_tpu.io import read_raster
from floodsr_tpu.io.geotiff import raster_bounds
from floodsr_tpu.model_registry import resolve_model_worker_class
from floodsr_tpu.tohr import tohr

pytestmark = pytest.mark.e2e


@pytest.fixture(scope="module")
def worker_cls():
    return resolve_model_worker_class("ResUNet_16x_DEM")


class TestTohrNativeScale:
    @pytest.mark.parametrize("window_method,tile_overlap", [("feather", 1), ("hard", 0)])
    def test_end_to_end(
        self, tiny_model_fp, synthetic_tohr_tiles, tmp_path, logger, window_method, tile_overlap
    ):
        out_fp = tmp_path / f"pred_{window_method}.tif"
        result = tohr(
            model_version="ResUNet_16x_DEM",
            model_fp=tiny_model_fp,
            depth_lr_fp=synthetic_tohr_tiles["depth_lr_fp"],
            dem_hr_fp=synthetic_tohr_tiles["dem_fp"],
            output_fp=out_fp,
            window_method=window_method,
            tile_overlap=tile_overlap,
            logger=logger,
        )
        pred, nodata, profile = read_raster(result["output_fp"])
        assert pred.shape == synthetic_tohr_tiles["hr_shape"]
        assert pred.dtype == np.float32
        assert np.isfinite(pred).all()
        assert pred.min() >= 0.0 and pred.max() <= 5.0

        # Low-depth mask: nothing in the open interval (0, 1e-3).
        nonzero = pred[pred > 0]
        assert (nonzero >= 1e-3).all()

        # Output georeferencing matches the LR input bounds.
        _, _, in_profile = read_raster(synthetic_tohr_tiles["depth_lr_fp"])
        np.testing.assert_allclose(
            raster_bounds(profile), raster_bounds(in_profile), atol=1e-6
        )

        diag = result["preprocess"]
        assert diag["window_method"] == window_method
        assert diag["tile_size_lr"] == 8
        assert diag["tile_size_hr"] == 32
        assert diag["model_scale"] == 4
        assert diag["tile_cache_size"] >= 4
        assert diag["tile_dem_stats"]["tile_count"] == diag["tile_cache_size"]
        assert diag["prepared_inputs"]["post_sr_was_resampled"] is False
        assert result["runtime_s"] > 0

    def test_tile_size_override_runs_convolutionally(
        self, tiny_model_fp, synthetic_tohr_tiles, tmp_path, logger
    ):
        """tile_size != trained tile: same weights, larger windows.

        The fully-convolutional override (impossible on the reference's
        fixed-shape ONNX graph) must window at the requested size, carry it
        into the diagnostics, and produce a valid masked/clipped scene.
        """
        out_fp = tmp_path / "pred_ts16.tif"
        result = tohr(
            model_version="ResUNet_16x_DEM",
            model_fp=tiny_model_fp,
            depth_lr_fp=synthetic_tohr_tiles["depth_lr_fp"],
            dem_hr_fp=synthetic_tohr_tiles["dem_fp"],
            output_fp=out_fp,
            tile_size=16,
            logger=logger,
        )
        pred, _, _ = read_raster(result["output_fp"])
        assert pred.shape == synthetic_tohr_tiles["hr_shape"]
        assert np.isfinite(pred).all()
        assert pred.min() >= 0.0 and pred.max() <= 5.0
        diag = result["preprocess"]
        assert diag["tile_size_lr"] == 16
        assert diag["tile_size_hr"] == 64
        # 16-LR windows cover the scene with fewer tiles than the trained 8.
        assert diag["tile_cache_size"] < 25

    def test_tile_size_override_rejects_non_divisible(
        self, tiny_model_fp, synthetic_tohr_tiles, tmp_path, logger
    ):
        with pytest.raises(AssertionError, match="2\\^levels"):
            tohr(
                model_version="ResUNet_16x_DEM",
                model_fp=tiny_model_fp,
                depth_lr_fp=synthetic_tohr_tiles["depth_lr_fp"],
                dem_hr_fp=synthetic_tohr_tiles["dem_fp"],
                output_fp=tmp_path / "bad.tif",
                tile_size=10,
                logger=logger,
            )

    def test_dem_device_cache_hit_is_identical_and_invalidates(
        self, worker_cls, tiny_model_fp, synthetic_tohr_tiles, tmp_path, logger
    ):
        """Repeat runs on the same DEM reuse the device copy bit-exactly;
        touching the file invalidates the cache."""
        import os
        import shutil

        dem_fp = tmp_path / "dem_cached.tif"
        shutil.copy2(synthetic_tohr_tiles["dem_fp"], dem_fp)
        kwargs = dict(
            depth_lr_fp=synthetic_tohr_tiles["depth_lr_fp"],
            dem_hr_fp=dem_fp,
            window_method="feather",
            tile_overlap=1,
        )
        with worker_cls(model_fp=tiny_model_fp, logger=logger) as worker:
            worker.run(output_fp=tmp_path / "a.tif", **kwargs)
            assert len(worker._dem_device_cache) == 1
            key_before = next(iter(worker._dem_device_cache))
            worker.run(output_fp=tmp_path / "b.tif", **kwargs)
            assert list(worker._dem_device_cache) == [key_before]
            # Rewrite the file (new mtime) → a fresh entry must be used.
            shutil.copy2(synthetic_tohr_tiles["dem_fp"], dem_fp)
            os.utime(dem_fp, ns=(1, 1))
            worker.run(output_fp=tmp_path / "c.tif", **kwargs)
            key_after = next(reversed(worker._dem_device_cache))
            assert key_after != key_before
        a, _, _ = read_raster(tmp_path / "a.tif")
        b, _, _ = read_raster(tmp_path / "b.tif")
        c, _, _ = read_raster(tmp_path / "c.tif")
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(a, c)

    def test_warmup_precompiles_the_executable_run_hits(
        self, worker_cls, tiny_model_fp, synthetic_tohr_tiles, tmp_path, logger
    ):
        """warmup() builds the exact scene executable a real run then reuses."""
        from floodsr_tpu.io import read_raster as _rr

        dem, _, _ = _rr(synthetic_tohr_tiles["dem_fp"])
        with worker_cls(model_fp=tiny_model_fp, logger=logger) as worker:
            n = worker.warmup([dem.shape], tile_overlap=1)
            assert n == 1
            keys_before = set(worker.engine._jit_cache)
            assert any(k[0] == "scene" for k in keys_before)
            worker.run(
                depth_lr_fp=synthetic_tohr_tiles["depth_lr_fp"],
                dem_hr_fp=synthetic_tohr_tiles["dem_fp"],
                output_fp=tmp_path / "warm.tif",
                window_method="feather",
                tile_overlap=1,
            )
            # the run added no new scene executable — warmup built the one it needed
            scene_keys_after = {k for k in worker.engine._jit_cache if k[0] == "scene"}
            assert scene_keys_after == {k for k in keys_before if k[0] == "scene"}

    def test_warmup_rejects_feather_with_zero_overlap(
        self, worker_cls, tiny_model_fp, logger
    ):
        # run() rejects feather+overlap=0; warmup() must apply the same
        # validation instead of warming a hard-geometry executable for
        # arguments every real request will refuse.
        with worker_cls(model_fp=tiny_model_fp, logger=logger) as worker:
            with pytest.raises(AssertionError, match="overlap_lr > 0"):
                worker.warmup([(64, 64)], window_method="feather",
                              tile_overlap=0)

    def test_run_many_streams_scenes_with_prefetch(
        self, worker_cls, tiny_model_fp, synthetic_tohr_tiles, tmp_path, logger
    ):
        """run_many matches per-scene run() output and rides the DEM cache /
        prefetch path (second scene's DEM uploaded by a background thread)."""
        import shutil

        dem2 = tmp_path / "dem_scene2.tif"
        shutil.copy2(synthetic_tohr_tiles["dem_fp"], dem2)
        jobs = [
            {
                "depth_lr_fp": synthetic_tohr_tiles["depth_lr_fp"],
                "dem_hr_fp": synthetic_tohr_tiles["dem_fp"],
                "output_fp": tmp_path / "m0.tif",
            },
            {
                "depth_lr_fp": synthetic_tohr_tiles["depth_lr_fp"],
                "dem_hr_fp": dem2,
                "output_fp": tmp_path / "m1.tif",
            },
        ]
        with worker_cls(model_fp=tiny_model_fp, logger=logger) as worker:
            results = worker.run_many(jobs, window_method="feather", tile_overlap=1)
            assert len(results) == 2
            # both DEMs resident after the stream
            assert len(worker._dem_device_cache) == 2
        with worker_cls(model_fp=tiny_model_fp, logger=logger) as worker:
            solo = worker.run(
                depth_lr_fp=synthetic_tohr_tiles["depth_lr_fp"],
                dem_hr_fp=synthetic_tohr_tiles["dem_fp"],
                output_fp=tmp_path / "solo.tif",
                window_method="feather",
                tile_overlap=1,
            )
        m0, _, _ = read_raster(tmp_path / "m0.tif")
        m1, _, _ = read_raster(tmp_path / "m1.tif")
        ref, _, _ = read_raster(tmp_path / "solo.tif")
        np.testing.assert_array_equal(m0, ref)
        np.testing.assert_array_equal(m1, ref)
        assert results[0]["output_fp"] == str(tmp_path / "m0.tif")
        assert solo["runtime_s"] > 0

    def test_feather_and_hard_agree_where_tiles_are_interior_constant(
        self, tiny_model_fp, synthetic_tohr_tiles, tmp_path, logger
    ):
        # Same scene through both window methods: results differ only by
        # blending, so they should be broadly similar (sanity bound).
        outs = {}
        for method, overlap in (("feather", 2), ("hard", 0)):
            fp = tmp_path / f"agree_{method}.tif"
            tohr(
                model_version="ResUNet_16x_DEM",
                model_fp=tiny_model_fp,
                depth_lr_fp=synthetic_tohr_tiles["depth_lr_fp"],
                dem_hr_fp=synthetic_tohr_tiles["dem_fp"],
                output_fp=fp,
                window_method=method,
                tile_overlap=overlap,
                logger=logger,
            )
            outs[method], _, _ = read_raster(fp)
        diff = np.abs(outs["feather"] - outs["hard"])
        assert float(np.median(diff)) < 0.5


class TestOutputCompress:
    """--output-compress: pixel-identical outputs, only the encoding differs."""

    def test_every_codec_writes_identical_pixels(
        self, tiny_model_fp, synthetic_tohr_tiles, tmp_path, logger
    ):
        from floodsr_tpu.io import zstd_codec
        from floodsr_tpu.io.geotiff import read_raster_header
        from floodsr_tpu.io.tiff import (
            COMPRESSION_DEFLATE_ADOBE,
            COMPRESSION_LZW,
            COMPRESSION_NONE,
            COMPRESSION_PACKBITS,
            COMPRESSION_ZSTD,
        )
        from floodsr_tpu.model_registry import resolve_model_worker_class

        expected_tag = {
            "lzw": COMPRESSION_LZW,
            "deflate": COMPRESSION_DEFLATE_ADOBE,
            "packbits": COMPRESSION_PACKBITS,
            "none": COMPRESSION_NONE,
            "zstd": COMPRESSION_ZSTD,
        }
        choices = ["lzw", "deflate", "packbits", "none"]
        if zstd_codec.available():
            choices.append("zstd")

        worker_cls = resolve_model_worker_class("ResUNet_16x_DEM")
        outs = {}
        with worker_cls(model_fp=tiny_model_fp, logger=logger) as worker:
            for choice in choices:
                fp = tmp_path / f"pred_{choice}.tif"
                worker.run(
                    depth_lr_fp=synthetic_tohr_tiles["depth_lr_fp"],
                    dem_hr_fp=synthetic_tohr_tiles["dem_fp"],
                    output_fp=fp,
                    tile_overlap=1,
                    output_compress=choice,
                )
                header = read_raster_header(fp)
                want = expected_tag[choice]
                got = header.get("compress")
                # Header reports the profile name; map back for comparison.
                from floodsr_tpu.io.geotiff import _COMPRESS_TO_TIFF

                assert _COMPRESS_TO_TIFF[got] == want, (choice, got)
                outs[choice], _, _ = read_raster(fp)
        for choice in choices[1:]:
            np.testing.assert_array_equal(outs[choice], outs["lzw"])

    def test_default_is_lzw_even_for_non_lzw_dem_input(
        self, tiny_model_fp, synthetic_tohr_tiles, tmp_path, logger
    ):
        # Rewrite the DEM uncompressed; the OUTPUT write profile is fixed
        # (reference default LZW), never inherited from input tags.
        from floodsr_tpu.io.geotiff import read_raster_header, write_raster

        dem, dem_nodata, dem_profile = read_raster(synthetic_tohr_tiles["dem_fp"])
        dem_profile = dict(dem_profile)
        dem_profile["compress"] = None
        dem_fp = tmp_path / "dem_uncompressed.tif"
        write_raster(dem_fp, dem, dem_profile)

        out_fp = tmp_path / "pred_default.tif"
        tohr(
            model_version="ResUNet_16x_DEM",
            model_fp=tiny_model_fp,
            depth_lr_fp=synthetic_tohr_tiles["depth_lr_fp"],
            dem_hr_fp=dem_fp,
            output_fp=out_fp,
            tile_overlap=1,
            logger=logger,
        )
        assert read_raster_header(out_fp).get("compress") == "LZW"

    def test_bad_output_compress_raises(
        self, worker_cls, tiny_model_fp, synthetic_tohr_tiles, tmp_path, logger
    ):
        with worker_cls(model_fp=tiny_model_fp, logger=logger) as worker:
            with pytest.raises(AssertionError, match="output_compress"):
                worker.run(
                    depth_lr_fp=synthetic_tohr_tiles["depth_lr_fp"],
                    dem_hr_fp=synthetic_tohr_tiles["dem_fp"],
                    output_fp=tmp_path / "bad.tif",
                    tile_overlap=1,
                    output_compress="jpeg",
                )


class TestTohrNonNativeScale:
    def test_post_resample_path(self, tiny_model_fp, synthetic_nonnative_tiles, tmp_path, logger):
        out_fp = tmp_path / "pred_nonnative.tif"
        result = tohr(
            model_version="ResUNet_16x_DEM",
            model_fp=tiny_model_fp,
            depth_lr_fp=synthetic_nonnative_tiles["depth_lr_fp"],
            dem_hr_fp=synthetic_nonnative_tiles["dem_fp"],
            output_fp=out_fp,
            window_method="feather",
            tile_overlap=1,
            logger=logger,
        )
        pred, _, _ = read_raster(result["output_fp"])
        # Output lands on the raw DEM grid, not the model-space grid.
        assert pred.shape == synthetic_nonnative_tiles["dem_shape"]
        diag = result["preprocess"]
        assert diag["prepared_inputs"]["post_sr_was_resampled"] is True
        assert diag["input_shape"]["model_space_crop_height"] == 64
        assert diag["input_shape"]["output_shape"] == [96, 96]


class TestAsciiGridInput:
    def test_asc_depth_input_matches_geotiff_input(
        self, tiny_model_fp, synthetic_tohr_tiles, tmp_path, logger
    ):
        """An ESRI .asc LR depth + .prj sidecar runs the full pipeline and
        produces the identical output to the same scene read from GeoTIFF
        (reference: GDAL reads AAIGrid transparently,
        floodsr/preprocessing.py:247-282)."""
        import numpy as np

        depth, nodata, profile = read_raster(synthetic_tohr_tiles["depth_lr_fp"])
        t = profile["transform"]
        assert t.b == 0 and t.d == 0 and t.a == -t.e
        asc_fp = tmp_path / "depth_lr.asc"
        header = (
            f"ncols {depth.shape[1]}\n"
            f"nrows {depth.shape[0]}\n"
            f"xllcorner {t.c!r}\n"
            f"yllcorner {t.f + t.e * depth.shape[0]!r}\n"
            f"cellsize {t.a!r}\n"
            f"NODATA_value {nodata!r}\n"
        )
        # %.9g round-trips float32 exactly, so both inputs are bit-identical.
        np.savetxt(asc_fp, depth, fmt="%.9g", header=header.rstrip("\n"),
                   comments="")
        (tmp_path / "depth_lr.prj").write_text(
            'PROJCS["WGS 84 / UTM zone 33N",GEOGCS["WGS 84",DATUM["WGS_1984",'
            'SPHEROID["WGS 84",6378137,298.257223563]],PRIMEM["Greenwich",0],'
            'UNIT["degree",0.0174532925199433]],'
            'PROJECTION["Transverse_Mercator"],'
            'PARAMETER["latitude_of_origin",0],'
            'PARAMETER["central_meridian",15],'
            'PARAMETER["scale_factor",0.9996],'
            'PARAMETER["false_easting",500000],'
            'PARAMETER["false_northing",0],UNIT["metre",1],'
            'AUTHORITY["EPSG","32633"]]'
        )
        asc_check, asc_nodata, asc_profile = read_raster(asc_fp)
        np.testing.assert_array_equal(asc_check, depth)
        assert asc_nodata == nodata
        assert asc_profile["crs"] == profile["crs"]

        outs = {}
        for label, lr_fp in (("tif", synthetic_tohr_tiles["depth_lr_fp"]),
                             ("asc", asc_fp)):
            result = tohr(
                model_version="ResUNet_16x_DEM",
                model_fp=tiny_model_fp,
                depth_lr_fp=lr_fp,
                dem_hr_fp=synthetic_tohr_tiles["dem_fp"],
                output_fp=tmp_path / f"pred_{label}.tif",
                window_method="feather",
                tile_overlap=1,
                logger=logger,
            )
            outs[label], _, _ = read_raster(result["output_fp"])
        np.testing.assert_array_equal(outs["asc"], outs["tif"])


class TestWorkerValidation:
    def test_tile_size_non_divisible_raises(
        self, worker_cls, tiny_model_fp, synthetic_tohr_tiles, tmp_path, logger
    ):
        # A divisible tile_size != the trained tile is now a supported
        # convolutional override (TestTohrNativeScale); only sizes that
        # break the UNet's 2^levels divisibility are rejected.
        with worker_cls(model_fp=tiny_model_fp, logger=logger) as worker:
            with pytest.raises(AssertionError, match="2\\^levels"):
                worker.run(
                    depth_lr_fp=synthetic_tohr_tiles["depth_lr_fp"],
                    dem_hr_fp=synthetic_tohr_tiles["dem_fp"],
                    output_fp=tmp_path / "x.tif",
                    tile_size=6,
                )

    def test_bad_window_method_raises(
        self, worker_cls, tiny_model_fp, synthetic_tohr_tiles, tmp_path, logger
    ):
        with worker_cls(model_fp=tiny_model_fp, logger=logger) as worker:
            with pytest.raises(AssertionError):
                worker.run(
                    depth_lr_fp=synthetic_tohr_tiles["depth_lr_fp"],
                    dem_hr_fp=synthetic_tohr_tiles["dem_fp"],
                    output_fp=tmp_path / "x.tif",
                    window_method="blend",
                )

    def test_feather_requires_positive_overlap(
        self, worker_cls, tiny_model_fp, synthetic_tohr_tiles, tmp_path, logger
    ):
        with worker_cls(model_fp=tiny_model_fp, logger=logger) as worker:
            with pytest.raises(AssertionError):
                worker.run(
                    depth_lr_fp=synthetic_tohr_tiles["depth_lr_fp"],
                    dem_hr_fp=synthetic_tohr_tiles["dem_fp"],
                    output_fp=tmp_path / "x.tif",
                    window_method="feather",
                    tile_overlap=0,
                )

    def test_run_outside_context_raises(self, worker_cls, tiny_model_fp, synthetic_tohr_tiles, tmp_path):
        worker = worker_cls(model_fp=tiny_model_fp)
        with pytest.raises(AssertionError):
            worker.run(
                depth_lr_fp=synthetic_tohr_tiles["depth_lr_fp"],
                dem_hr_fp=synthetic_tohr_tiles["dem_fp"],
                output_fp=tmp_path / "x.tif",
            )

    def test_missing_input_raises(self, worker_cls, tiny_model_fp, tmp_path, logger):
        with worker_cls(model_fp=tiny_model_fp, logger=logger) as worker:
            with pytest.raises(AssertionError):
                worker.run(
                    depth_lr_fp=tmp_path / "missing.tif",
                    dem_hr_fp=tmp_path / "missing_dem.tif",
                    output_fp=tmp_path / "x.tif",
                )
