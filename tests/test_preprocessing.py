"""Preprocessing: config resolution, alignment, prepared-raster writes, warp."""

import json

import numpy as np
import pytest

from floodsr_tpu.io import from_origin, read_raster, write_raster
from floodsr_tpu.io.geotiff import raster_bounds
from floodsr_tpu.ops.resample import pad_to_multiple, reproject_bilinear
from floodsr_tpu.preprocessing import (
    resolve_preprocess_config,
    write_prepared_rasters,
)

pytestmark = pytest.mark.unit


def _write(fp, arr, transform, crs="EPSG:32633", nodata=-9999.0):
    write_raster(
        fp,
        np.asarray(arr, np.float32),
        {
            "height": arr.shape[0],
            "width": arr.shape[1],
            "count": 1,
            "dtype": "float32",
            "crs": crs,
            "transform": transform,
            "nodata": nodata,
            "compress": "LZW",
        },
    )


class TestResamplng:
    def test_identity_grid(self, rng):
        src = rng.normal(size=(32, 32)).astype(np.float32)
        t = from_origin(0, 32, 1.0, 1.0)
        out = reproject_bilinear(src, t, (32, 32), t)
        np.testing.assert_allclose(out, src, atol=1e-5)

    def test_2x_upsample_preserves_linear_field(self):
        # Bilinear resampling reproduces an affine field exactly (interior).
        yy, xx = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
        src = (2.0 * xx + 3.0 * yy).astype(np.float32)
        t_src = from_origin(0, 16, 1.0, 1.0)
        t_dst = from_origin(0, 16, 0.5, 0.5)
        out = reproject_bilinear(src, t_src, (32, 32), t_dst)
        want_x = (np.arange(32) + 0.5) * 0.5 - 0.5  # src pixel coords of dst centers
        want_y = want_x.copy()
        want = 2.0 * want_x[None, :] + 3.0 * want_y[:, None]
        np.testing.assert_allclose(out[2:-2, 2:-2], want[2:-2, 2:-2].astype(np.float32), atol=1e-4)

    def test_nodata_excluded_and_renormalized(self):
        src = np.full((8, 8), 10.0, np.float32)
        src[0, 0] = -9999.0
        t = from_origin(0, 8, 1.0, 1.0)
        out = reproject_bilinear(src, t, (8, 8), t, src_nodata=-9999.0, dst_nodata=-1.0)
        assert out[0, 0] == -1.0  # fully nodata pixel
        assert (out[1:, 1:] == 10.0).all()

    def test_outside_source_gets_fill(self):
        src = np.ones((4, 4), np.float32)
        t_src = from_origin(0, 4, 1.0, 1.0)
        t_dst = from_origin(100, 104, 1.0, 1.0)  # disjoint extent
        out = reproject_bilinear(src, t_src, (4, 4), t_dst, dst_nodata=-5.0)
        assert (out == -5.0).all()

    def test_separable_matches_gather_interior(self, rng):
        from floodsr_tpu.ops.resample import separable_resample_matrices

        src = rng.normal(size=(40, 48)).astype(np.float32)
        t_src = from_origin(0, 40, 1.0, 1.0)
        t_dst = from_origin(2, 38, 1.25, 1.25)
        dst_shape = (28, 34)
        want = reproject_bilinear(src, t_src, dst_shape, t_dst)
        ry, rx = separable_resample_matrices(src.shape, t_src, dst_shape, t_dst)
        got = ry @ src @ rx.T
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_separable_identity(self, rng):
        from floodsr_tpu.ops.resample import separable_resample_matrices

        src = rng.normal(size=(16, 16)).astype(np.float32)
        t = from_origin(0, 16, 1.0, 1.0)
        ry, rx = separable_resample_matrices(src.shape, t, (16, 16), t)
        np.testing.assert_allclose(ry @ src @ rx.T, src, atol=1e-6)

    def test_bucketed_device_warp_matches_dense(self, rng):
        from floodsr_tpu.ops.resample import (
            separable_resample_matrices,
            warp_bucketed_device,
        )

        for src_shape, dst_shape, t_src, t_dst in [
            ((40, 48), (28, 34), from_origin(0, 40, 1.0, 1.0), from_origin(2, 38, 1.25, 1.25)),
            ((60, 40), (64, 43), from_origin(0, 120, 2.0, 2.0), from_origin(0, 120, 1.875, 1.875)),
        ]:
            src = rng.normal(300, 40, size=src_shape).astype(np.float32)
            ry, rx = separable_resample_matrices(src_shape, t_src, dst_shape, t_dst)
            want = ry @ src @ rx.T
            got = np.asarray(warp_bucketed_device(src, t_src, dst_shape, t_dst))
            assert got.shape == dst_shape
            np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-6)
            # same executable must serve a same-bucket sibling geometry
            from floodsr_tpu.ops.resample import _bucketed_warp_exe

            info = _bucketed_warp_exe.cache_info()
            np.asarray(
                warp_bucketed_device(
                    src[: src_shape[0] - 3], t_src, (dst_shape[0] - 2, dst_shape[1]), t_dst
                )
            )
            assert _bucketed_warp_exe.cache_info().hits > info.hits

    def test_pad_to_multiple(self):
        arr = np.ones((5, 7), np.float32)
        out = pad_to_multiple(arr, 4)
        assert out.shape == (8, 8)
        assert out[5:].sum() == 0 and out[:, 7:].sum() == 0
        assert pad_to_multiple(np.ones((4, 4), np.float32), 4).shape == (4, 4)


class TestConfigResolution:
    def test_defaults_without_train_config(self, tmp_path):
        model_fp = tmp_path / "m.fsrz"
        model_fp.write_bytes(b"x")
        cfg = resolve_preprocess_config(model_fp)
        assert cfg["max_depth"] == 5.0
        assert cfg["dem_pct_clip"] == 95.0
        assert cfg["dem_ref_stats"] is None
        assert cfg["lr_tile"] is None
        assert cfg["scale"] is None
        assert cfg["model_dem_resolution"] == 2.0

    def test_train_config_resolution(self, tmp_path):
        model_fp = tmp_path / "m.fsrz"
        model_fp.write_bytes(b"x")
        (tmp_path / "train_config.json").write_text(
            json.dumps(
                {
                    "max_depth": 8.0,
                    "dem_pct_clip": 99.0,
                    "dem_stats": {"p_clip": 100.0, "dem_min": 0.0, "dem_max": 50.0},
                    "input_shape": [32, 32, 1],
                    "upscale": 16,
                    "dem_fp": "data/002_dem_clipped.tif",
                }
            )
        )
        cfg = resolve_preprocess_config(model_fp)
        assert cfg["max_depth"] == 8.0
        assert cfg["dem_pct_clip"] == 99.0
        assert cfg["dem_ref_stats"] == {"dem_max": 50.0, "dem_min": 0.0, "p_clip": 100.0}
        assert cfg["lr_tile"] == 32
        assert cfg["scale"] == 16
        assert cfg["model_dem_resolution"] == 2.0

    def test_cli_overrides_win(self, tmp_path):
        model_fp = tmp_path / "m.fsrz"
        model_fp.write_bytes(b"x")
        (tmp_path / "train_config.json").write_text(json.dumps({"max_depth": 8.0}))
        cfg = resolve_preprocess_config(model_fp, max_depth=3.0, dem_pct_clip=90.0)
        assert cfg["max_depth"] == 3.0
        assert cfg["dem_pct_clip"] == 90.0

    def test_dem_resolution_regex(self, tmp_path):
        model_fp = tmp_path / "m.fsrz"
        model_fp.write_bytes(b"x")
        (tmp_path / "train_config.json").write_text(
            json.dumps({"dem_fp": "tiles/030_dem.tif"})
        )
        assert resolve_preprocess_config(model_fp)["model_dem_resolution"] == 30.0


class TestAlignment:
    def test_prepared_rasters_geometry(self, tmp_path, rng):
        lr = rng.uniform(0, 2, (16, 16)).astype(np.float32)
        dem = rng.uniform(100, 200, (96, 96)).astype(np.float32)
        lr_fp, dem_fp = tmp_path / "lr.tif", tmp_path / "dem.tif"
        _write(lr_fp, lr, from_origin(0, 480, 30.0, 30.0))
        _write(dem_fp, dem, from_origin(0, 480, 5.0, 5.0))

        prepped = write_prepared_rasters(lr_fp, dem_fp, scale=4, out_dir=tmp_path / "prep")
        assert prepped["depth_lr_shape"] == (16, 16)
        assert prepped["dem_hr_shape"] == (64, 64)  # lr_shape * scale
        assert prepped["dem_raw_shape"] == (96, 96)
        assert prepped["resampled"] is True

        # Prepared rasters cover the LR bounds exactly.
        _, _, dem_prof = read_raster(prepped["dem_hr_prepared_fp"])
        np.testing.assert_allclose(raster_bounds(dem_prof), (0, 0, 480, 480), atol=1e-6)

    def test_crs_mismatch_raises(self, tmp_path, rng):
        lr = rng.uniform(0, 2, (8, 8)).astype(np.float32)
        dem = rng.uniform(0, 10, (32, 32)).astype(np.float32)
        lr_fp, dem_fp = tmp_path / "lr.tif", tmp_path / "dem.tif"
        _write(lr_fp, lr, from_origin(0, 240, 30.0, 30.0), crs="EPSG:32633")
        _write(dem_fp, dem, from_origin(0, 240, 7.5, 7.5), crs="EPSG:32634")
        with pytest.raises(AssertionError, match="CRS mismatch"):
            write_prepared_rasters(lr_fp, dem_fp, scale=4, out_dir=tmp_path / "p")

    def test_geographic_crs_rejected(self, tmp_path, rng):
        lr = rng.uniform(0, 2, (8, 8)).astype(np.float32)
        dem = rng.uniform(0, 10, (32, 32)).astype(np.float32)
        lr_fp, dem_fp = tmp_path / "lr.tif", tmp_path / "dem.tif"
        _write(lr_fp, lr, from_origin(6.0, 50.0, 0.01, 0.01), crs="EPSG:4326")
        _write(dem_fp, dem, from_origin(6.0, 50.0, 0.0025, 0.0025), crs="EPSG:4326")
        with pytest.raises(AssertionError, match="projected"):
            write_prepared_rasters(lr_fp, dem_fp, scale=4, out_dir=tmp_path / "p")

    def test_depth_inherits_dem_crs_with_warning(self, tmp_path, rng, caplog):
        lr = rng.uniform(0, 2, (8, 8)).astype(np.float32)
        dem = rng.uniform(0, 10, (32, 32)).astype(np.float32)
        lr_fp, dem_fp = tmp_path / "lr.tif", tmp_path / "dem.tif"
        _write(lr_fp, lr, from_origin(0, 240, 30.0, 30.0), crs=None)
        _write(dem_fp, dem, from_origin(0, 240, 7.5, 7.5), crs="EPSG:32633")
        import logging

        with caplog.at_level(logging.WARNING):
            prepped = write_prepared_rasters(lr_fp, dem_fp, scale=4, out_dir=tmp_path / "p")
        assert any("assigning missing depth CRS" in r.message for r in caplog.records)
        assert prepped["dem_hr_shape"] == (32, 32)

    def test_negative_depth_rejected(self, tmp_path, rng):
        lr = np.full((8, 8), -1.0, np.float32)
        dem = rng.uniform(0, 10, (32, 32)).astype(np.float32)
        lr_fp, dem_fp = tmp_path / "lr.tif", tmp_path / "dem.tif"
        _write(lr_fp, lr, from_origin(0, 240, 30.0, 30.0), nodata=None)
        _write(dem_fp, dem, from_origin(0, 240, 7.5, 7.5))
        with pytest.raises(AssertionError, match="negative"):
            write_prepared_rasters(lr_fp, dem_fp, scale=4, out_dir=tmp_path / "p")

    def test_nodata_replaced_in_prepared_outputs(self, tmp_path, rng):
        lr = rng.uniform(0.5, 2, (8, 8)).astype(np.float32)
        lr[0, 0] = -9999.0
        dem = rng.uniform(100, 200, (32, 32)).astype(np.float32)
        dem[:2, :2] = -9999.0
        lr_fp, dem_fp = tmp_path / "lr.tif", tmp_path / "dem.tif"
        _write(lr_fp, lr, from_origin(0, 240, 30.0, 30.0))
        _write(dem_fp, dem, from_origin(0, 240, 7.5, 7.5))
        prepped = write_prepared_rasters(lr_fp, dem_fp, scale=4, out_dir=tmp_path / "p")
        depth_out, _, _ = read_raster(prepped["depth_lr_prepared_fp"])
        dem_out, _, _ = read_raster(prepped["dem_hr_prepared_fp"])
        assert depth_out[0, 0] == 0.0
        assert np.isfinite(dem_out).all()
        assert (dem_out > -1000).all()


class TestNodataHandling:
    """NaN nodata sentinels + nodata-aware device warp (round-3 review fixes)."""

    def test_nan_nodata_dem_aligns_without_crash(self, tmp_path, rng):
        """GDAL_NODATA="nan" is standard for float rasters; isclose(x, nan)
        is all-False, so every nodata branch needs the isnan path."""
        lr = rng.uniform(0, 2, (8, 8)).astype(np.float32)
        dem = rng.uniform(100, 200, (32, 32)).astype(np.float32)
        dem[:3, :3] = np.nan
        lr_fp, dem_fp = tmp_path / "lr.tif", tmp_path / "dem.tif"
        _write(lr_fp, lr, from_origin(0, 240, 30.0, 30.0), nodata=float("nan"))
        _write(dem_fp, dem, from_origin(0, 240, 7.5, 7.5), nodata=float("nan"))
        # Round-trip of the NaN sentinel through the GeoTIFF tags.
        _, nodata_back, _ = read_raster(dem_fp)
        assert nodata_back is not None and np.isnan(nodata_back)

        prepped = write_prepared_rasters(
            lr_fp, dem_fp, scale=4, out_dir=tmp_path / "prep"
        )
        out, _, _ = read_raster(prepped["dem_hr_prepared_fp"])
        assert np.isfinite(out).all()

    def test_device_warp_renormalizes_at_nodata_holes(self, tmp_path, rng):
        """The device (rectilinear fast-path) warp must not blend the zero
        fill into cells adjacent to nodata holes — it renormalizes by the
        warped validity mask like the host reproject_bilinear path."""
        lr = rng.uniform(0, 2, (8, 8)).astype(np.float32)
        dem = np.full((48, 48), 150.0, np.float32)
        dem[20:28, 20:28] = -9999.0  # interior nodata hole
        lr_fp, dem_fp = tmp_path / "lr.tif", tmp_path / "dem.tif"
        _write(lr_fp, lr, from_origin(0, 240, 30.0, 30.0))
        _write(dem_fp, dem, from_origin(0, 240, 5.0, 5.0))

        host = write_prepared_rasters(
            lr_fp, dem_fp, scale=4, out_dir=tmp_path / "h"
        )
        host_dem, _, _ = read_raster(host["dem_hr_prepared_fp"])
        dev = write_prepared_rasters(
            lr_fp, dem_fp, scale=4, out_dir=tmp_path / "d",
            write_files=False, device_dem=True,
        )
        dev_dem = np.asarray(dev["dem_hr"])
        assert dev_dem.shape == host_dem.shape
        # Valid cells stay at the plateau elevation in BOTH paths — no
        # zero-fill depression bleeding in from the hole.
        for out in (host_dem, dev_dem):
            valid = out > 0
            assert valid.any()
            np.testing.assert_allclose(out[valid], 150.0, atol=1e-3)
        np.testing.assert_allclose(dev_dem, host_dem, atol=1e-3)


class TestStreamingResampler:
    @pytest.mark.parametrize("dst_shape", [(97, 61), (240, 240), (33, 200)])
    def test_matches_one_shot_and_bounds_memory(self, rng, dst_shape):
        from floodsr_tpu.io import from_origin
        from floodsr_tpu.ops.resample import (
            StreamingSeparableResampler,
            separable_resample_np,
        )

        src = rng.normal(0, 1, (120, 80)).astype(np.float32)
        t_src = from_origin(0, 120.0, 1.0, 1.0)
        # dst grid covering the same extent at a different resolution
        t_dst = from_origin(
            0, 120.0, 80.0 / dst_shape[1], 120.0 / dst_shape[0]
        )
        want = separable_resample_np(src, t_src, dst_shape, t_dst)

        s = StreamingSeparableResampler(src.shape, t_src, dst_shape, t_dst)
        got = np.zeros(dst_shape, np.float32)
        fed = 0
        max_retained = 0
        band_sizes = [7, 1, 23, 11, 40, 38]
        while fed < src.shape[0]:
            n = min(band_sizes[0], src.shape[0] - fed)
            band_sizes = band_sizes[1:] + band_sizes[:1]
            start, rows = s.feed(src[fed : fed + n])
            got[start : start + rows.shape[0]] = rows
            fed += n
            max_retained = max(
                max_retained, sum(r.shape[0] for r in s._src_rows)
            )
        assert s.complete
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=0)
        # Consumed rows are dropped: the retained window stays O(band),
        # never the whole accumulated prefix (quadratic-copy regression).
        assert max_retained < src.shape[0]


class TestWarpTorchOracle:
    """`reproject_bilinear` vs torch grid_sample as an EXTERNAL oracle.

    Both implement pixel-center bilinear sampling between affine grids;
    `grid_sample(align_corners=False)` places pixel centers at
    ((2i+1)/N - 1), which is exactly this codebase's coordinate convention
    (`ops/resample.py::_dst_center_coords_in_src`). Border semantics
    differ by design (this repo renormalizes partial tap weights at the
    edge; torch zero-pads), so the comparison is over strictly-interior
    destination pixels — where every one of the 4 taps is in bounds.
    """

    def test_random_affine_pairs_match_grid_sample(self):
        import torch
        import torch.nn.functional as F

        from floodsr_tpu.io.affine import Affine
        from floodsr_tpu.ops.resample import reproject_bilinear

        rng = np.random.default_rng(20260818)
        compared = 0
        for _ in range(25):
            h_s, w_s = int(rng.integers(8, 90)), int(rng.integers(8, 90))
            src = rng.normal(size=(h_s, w_s)).astype(np.float64)
            a_s = float(rng.uniform(0.5, 5.0))
            e_s = -float(rng.uniform(0.5, 5.0))
            c_s = float(rng.uniform(-100, 100))
            f_s = float(rng.uniform(-100, 100))
            t_src = Affine(a_s, 0.0, c_s, 0.0, e_s, f_s)
            hd, wd = int(rng.integers(8, 100)), int(rng.integers(8, 100))
            a_d = float(rng.uniform(0.3, 3.0))
            e_d = -float(rng.uniform(0.3, 3.0))
            c_d = c_s + float(rng.uniform(0, 0.3)) * a_s * w_s
            f_d = f_s + float(rng.uniform(0, 0.3)) * e_s * h_s
            t_dst = Affine(a_d, 0.0, c_d, 0.0, e_d, f_d)

            got = reproject_bilinear(src, t_src, (hd, wd), t_dst)

            jj, ii = np.meshgrid(np.arange(wd), np.arange(hd))
            u = (c_d + a_d * (jj + 0.5) - c_s) / a_s - 0.5
            v = (f_d + e_d * (ii + 0.5) - f_s) / e_s - 0.5
            grid = torch.from_numpy(
                np.stack(
                    [(2 * (u + 0.5) / w_s) - 1, (2 * (v + 0.5) / h_s) - 1], -1
                )[None]
            ).double()
            ref = F.grid_sample(
                torch.from_numpy(src)[None, None],
                grid,
                mode="bilinear",
                padding_mode="zeros",
                align_corners=False,
            )[0, 0].numpy()
            interior = (v >= 0) & (v <= h_s - 1) & (u >= 0) & (u <= w_s - 1)
            if not interior.any():
                continue
            np.testing.assert_allclose(
                got[interior], ref[interior], atol=1e-6, rtol=0
            )
            compared += int(interior.sum())
        assert compared > 10_000, compared
