"""CostGrow_pcraster: grid-distance/fill kernels vs scipy+Dijkstra oracles,
and the PCRaster-variant worker end-to-end.

The oracle reimplements the reference's PCRaster notebook semantics
(reference ``others/CostGrow_pcraster_inline.ipynb``): scipy
``distance_transform_cdt`` for grid distance and the coarse nearest fill,
and the sequential Dijkstra twin for the ``spreadzone`` allocation.
"""

import json

import numpy as np
import pytest

import jax.numpy as jnp

from floodsr_tpu.io import from_origin, read_raster, write_raster
from floodsr_tpu.model_registry import fetch_model, resolve_model_worker_class
from floodsr_tpu.ops.costgrow import (
    grid_distance_jax,
    mcp_fill_numpy,
    nearest_fill_numpy,
)
from floodsr_tpu.ops.resample import reproject_bilinear

scipy_ndimage = pytest.importorskip("scipy.ndimage")

pytestmark = pytest.mark.unit


def _cheb(metric: str, dy: np.ndarray, dx: np.ndarray) -> np.ndarray:
    if metric == "chessboard":
        return np.maximum(np.abs(dy), np.abs(dx))
    return np.abs(dy) + np.abs(dx)


class TestGridDistance:
    @pytest.mark.parametrize("metric", ["chessboard", "taxicab"])
    def test_matches_scipy_cdt(self, rng, metric):
        h, w = 24, 31
        seeds = rng.random((h, w)) < 0.05
        seeds[3, 7] = True  # guarantee at least one seed
        want = scipy_ndimage.distance_transform_cdt(
            ~seeds, metric=metric
        ).astype(np.float64)
        got = np.asarray(grid_distance_jax(jnp.asarray(seeds), metric=metric))
        np.testing.assert_array_equal(got, want)

    def test_no_seeds_is_all_inf(self):
        got = np.asarray(grid_distance_jax(jnp.zeros((6, 6), bool)))
        assert not np.isfinite(got).any()

    def test_rejects_unknown_metric(self):
        with pytest.raises(ValueError, match="metric"):
            grid_distance_jax(jnp.zeros((4, 4), bool), metric="euclidean")


class TestNearestFill:
    @pytest.mark.parametrize("metric", ["chessboard", "taxicab"])
    def test_fill_is_a_nearest_source_value(self, rng, metric):
        """Every filled cell takes the value of SOME minimal-distance seed.

        scipy's index fill and ours may break exact-distance ties toward
        different seeds (both are valid "nearest"), so the spec-level check
        is set membership at the true minimal distance, computed brute
        force.
        """
        h, w = 14, 17
        values = np.full((h, w), np.nan)
        seed_rc = [(1, 2), (9, 13), (12, 3), (4, 16)]
        for k, (r, c) in enumerate(seed_rc):
            values[r, c] = 10.0 * (k + 1)
        filled = nearest_fill_numpy(values, metric=metric)
        assert np.isfinite(filled).all()
        rr, cc = np.mgrid[0:h, 0:w]
        dists = np.stack(
            [_cheb(metric, rr - r, cc - c) for (r, c) in seed_rc], axis=0
        )
        dmin = dists.min(axis=0)
        for r in range(h):
            for c in range(w):
                nearest_vals = {
                    values[sr, sc]
                    for (sr, sc), d in zip(seed_rc, dists[:, r, c])
                    if d == dmin[r, c]
                }
                assert filled[r, c] in nearest_vals

    def test_matches_scipy_index_fill_distances(self, rng):
        """Distance-to-chosen-source agrees with scipy's cdt everywhere."""
        h, w = 20, 20
        values = np.full((h, w), np.nan)
        mask = rng.random((h, w)) < 0.08
        mask[5, 5] = True
        values[mask] = rng.normal(size=int(mask.sum())) * 7.0
        filled = nearest_fill_numpy(values, metric="chessboard")
        want_dist = scipy_ndimage.distance_transform_cdt(
            ~mask, metric="chessboard"
        )
        # Each filled cell's value must exist at a seed exactly want_dist away.
        rr, cc = np.mgrid[0:h, 0:w]
        seeds = list(zip(*np.nonzero(mask)))
        for r in range(h):
            for c in range(w):
                hits = [
                    values[sr, sc]
                    for sr, sc in seeds
                    if max(abs(sr - r), abs(sc - c)) == want_dist[r, c]
                ]
                assert any(np.isclose(filled[r, c], v) for v in hits)

    def test_all_nan_raises(self):
        with pytest.raises(ValueError, match="no finite"):
            nearest_fill_numpy(np.full((4, 4), np.nan))


def _oracle_pcraster_phases(
    wse_fine,
    dem,
    dem_valid,
    wse_coarse,
    wse_transform,
    dem_transform,
    downscale,
    fine_pixel,
    *,
    dp_coarse_pixel_max=10.0,
    decay_frac=0.001,
    terrain_penalty_scale=1.0,
):
    """Numpy twin of the PCRaster notebook pipeline (phases 02-04)."""
    from scipy.ndimage import distance_transform_cdt, label

    # 02: wet partials.
    with np.errstate(invalid="ignore"):
        wet = np.isfinite(wse_fine) & np.isfinite(dem) & (wse_fine > dem)
    wse_wet = np.where(wet, wse_fine, np.nan)

    # 03: coarse nearest fill -> bilinear resample -> cost surface.
    coarse = np.asarray(wse_coarse, np.float64)
    if np.isfinite(coarse).all():
        coarse_filled = coarse
    else:
        idx = distance_transform_cdt(
            ~np.isfinite(coarse), metric="chessboard",
            return_indices=True, return_distances=False,
        )
        coarse_filled = coarse[tuple(idx)]
    filled_fine = reproject_bilinear(
        np.where(np.isfinite(coarse_filled), coarse_filled, -9999.0),
        wse_transform,
        dem.shape,
        dem_transform,
        src_nodata=-9999.0,
        dst_nodata=np.nan,
    )
    delta = filled_fine - dem
    cost = np.where(delta > 0.0, 1.0, 1.0 + np.abs(delta) * terrain_penalty_scale)
    cost = np.where(dem_valid & np.isfinite(delta), cost, np.nan)

    # spreadzone: min-cost source value over the friction surface.
    domain = dem_valid & np.isfinite(cost)
    filled, _dist = mcp_fill_numpy(
        np.where(wet, wse_wet, np.nan).astype(np.float32),
        wet,
        np.where(np.isfinite(cost), cost, np.inf),
        domain,
    )

    # grid distance from anchors over the whole raster; decay + threshold.
    dist_px = distance_transform_cdt(~wet, metric="chessboard").astype(np.float64)
    decay = np.where(wet, 0.0, dist_px * decay_frac * fine_pixel)
    decayed = filled - decay
    if dp_coarse_pixel_max is None:
        thresh = np.ones_like(wet)
    else:
        thresh = dist_px < dp_coarse_pixel_max * downscale
    with np.errstate(invalid="ignore"):
        grown = np.where(thresh & (decayed > dem), decayed, np.nan)
    out = np.where(wet, wse_wet, grown)

    # 04: 4-connected anchored components.
    wet_post = np.isfinite(out)
    labels, _n = label(wet_post.astype(np.uint8))  # default structure = 4-conn
    keep_labels = np.unique(labels[wet & wet_post])
    keep_labels = keep_labels[keep_labels != 0]
    keep = np.isin(labels, keep_labels) & wet_post
    out = np.where(keep, out, np.nan)
    return np.where(dem_valid, out, np.nan)


class TestPcrasterPhasesDifferential:
    def test_matches_notebook_oracle(self, rng):
        """Worker phases vs the scipy+Dijkstra notebook oracle on a random scene."""
        from floodsr_tpu.models.CostGrow_pcraster import ModelWorker

        h = w = 48
        downscale = 8
        ch, cw = h // downscale, w // downscale
        # Smooth random valley DEM (no exact ties in costs/values).
        yy = np.abs(np.arange(h) - h / 2)[:, None]
        dem = (
            50.0 + yy * 0.4 + rng.normal(size=(h, w)) * 0.05
        ).astype(np.float32)
        dem_valid = np.ones((h, w), bool)
        dem_t = from_origin(0, h * 4.0, 4.0, 4.0)
        wse_t = from_origin(0, h * 4.0, 4.0 * downscale, 4.0 * downscale)

        wse_coarse = np.full((ch, cw), np.nan, np.float32)
        wse_coarse[2:4, :] = 52.0 + rng.normal(size=(2, cw)).astype(np.float32) * 0.3

        # Phase 01 (shared with the base worker): bilinear resample + mask.
        wse_fine = reproject_bilinear(
            np.where(np.isfinite(wse_coarse), wse_coarse, -9999.0),
            wse_t,
            (h, w),
            dem_t,
            src_nodata=-9999.0,
            dst_nodata=np.nan,
        ).astype(np.float32)

        params = {
            "dp_coarse_pixel_max": 2,
            "decay_frac": 0.01,
            "terrain_penalty_scale": 1.0,
        }
        worker = ModelWorker.__new__(ModelWorker)
        worker.params = params
        got, diag = worker._apply_phases(
            wse_fine=wse_fine,
            dem=dem,
            dem_valid=dem_valid,
            wse_coarse=wse_coarse,
            wse_transform=wse_t,
            dem_transform=dem_t,
            downscale=downscale,
            fine_pixel=4.0,
        )
        want = _oracle_pcraster_phases(
            wse_fine.astype(np.float64),
            dem.astype(np.float64),
            dem_valid,
            wse_coarse,
            wse_t,
            dem_t,
            downscale,
            4.0,
            dp_coarse_pixel_max=2.0,
            decay_frac=0.01,
        )
        got_wet = np.isfinite(got)
        want_wet = np.isfinite(want)
        # Wet masks agree except possibly f32-vs-f64 boundary flips.
        assert (got_wet != want_wet).mean() < 0.01
        both = got_wet & want_wet
        assert both.sum() > 100
        np.testing.assert_allclose(got[both], want[both], atol=2e-3)
        assert diag["variant"] == "pcraster"
        assert diag["dp_fine_pixel_max"] == 16.0

    def test_null_threshold_grows_unbounded(self, rng):
        from floodsr_tpu.models.CostGrow_pcraster import ModelWorker

        h = w = 32
        dem = np.full((h, w), 10.0, np.float32)
        dem_valid = np.ones((h, w), bool)
        t = from_origin(0, h, 1.0, 1.0)
        wse_fine = np.full((h, w), np.nan, np.float32)
        wse_fine[0, 0] = 14.0
        wse_coarse = wse_fine.copy()

        def run(dp):
            worker = ModelWorker.__new__(ModelWorker)
            worker.params = {
                "dp_coarse_pixel_max": dp,
                "decay_frac": 0.05,
                "terrain_penalty_scale": 1.0,
            }
            out, _ = worker._apply_phases(
                wse_fine=wse_fine, dem=dem, dem_valid=dem_valid,
                wse_coarse=wse_coarse, wse_transform=t, dem_transform=t,
                downscale=1, fine_pixel=1.0,
            )
            return np.isfinite(out).sum()

        bounded = run(5)       # grows at most 5 px (chessboard ring)
        unbounded = run(None)  # grows until decay sinks below terrain
        assert bounded <= 6 * 6
        assert unbounded > bounded


class TestPcrasterWorker:
    @pytest.fixture(scope="class")
    def scene(self, tmp_path_factory):
        root = tmp_path_factory.mktemp("costgrow_pcr")
        h = w = 64
        yy = np.abs(np.arange(h) - h / 2)[:, None]
        dem = (100.0 + yy * 0.5 + np.linspace(0, 3, w)[None, :]).astype(np.float32)
        wse_lr = np.full((8, 8), np.nan, np.float32)
        wse_lr[3:5, :] = 102.5
        wse_fp = root / "wse_lr.tif"
        dem_fp = root / "dem.tif"
        nodata = -9999.0
        write_raster(
            wse_fp,
            np.where(np.isfinite(wse_lr), wse_lr, nodata),
            {
                "height": 8, "width": 8, "count": 1, "dtype": "float32",
                "crs": "EPSG:32633", "nodata": nodata,
                "transform": from_origin(0, 512, 64.0, 64.0), "compress": "LZW",
            },
        )
        write_raster(
            dem_fp,
            dem,
            {
                "height": h, "width": w, "count": 1, "dtype": "float32",
                "crs": "EPSG:32633", "nodata": nodata,
                "transform": from_origin(0, 512, 8.0, 8.0), "compress": "LZW",
            },
        )
        params_fp = root / "costgrow_pcraster_params.json"
        params_fp.write_text(
            json.dumps({"model_version": "CostGrow_pcraster", "dp_coarse_pixel_max": 2})
        )
        return {"wse_fp": wse_fp, "dem_fp": dem_fp, "params_fp": params_fp, "dem": dem}

    def test_worker_end_to_end(self, scene, tmp_path, logger):
        worker_cls = resolve_model_worker_class("CostGrow_pcraster")
        assert worker_cls.model_version == "CostGrow_pcraster"
        out_fp = tmp_path / "wse_grown.tif"
        with worker_cls(model_fp=scene["params_fp"], logger=logger) as worker:
            result = worker.run(
                depth_lr_fp=scene["wse_fp"],
                dem_hr_fp=scene["dem_fp"],
                output_fp=out_fp,
            )
        out, nodata, _profile = read_raster(out_fp)
        assert out.shape == (64, 64)
        wet = ~np.isclose(out, nodata)
        assert wet.any()
        assert (out[wet] > scene["dem"][wet]).all()
        diag = result["preprocess"]
        assert diag["variant"] == "pcraster"
        assert diag["downscale"] == 8
        assert diag["distance_metric"] == "chessboard"

    def test_rejects_bad_metric(self, scene, tmp_path, logger):
        params_fp = tmp_path / "p.json"
        params_fp.write_text(json.dumps({"distance_metric": "euclidean"}))
        worker_cls = resolve_model_worker_class("CostGrow_pcraster")
        with worker_cls(model_fp=params_fp, logger=logger) as worker:
            with pytest.raises(ValueError, match="distance_metric"):
                worker.run(
                    depth_lr_fp=scene["wse_fp"],
                    dem_hr_fp=scene["dem_fp"],
                    output_fp=tmp_path / "x.tif",
                )

    def test_depth_ingestion_matches_native_wse(self, tmp_path, logger):
        """--input-kind depth must lift BOTH grids to WSE before the phases.

        The PCRaster variant consumes the coarse surface directly (neutral
        fill + cost build), so a depth-domain coarse array would poison the
        friction surface; on a flat DEM (where the lift is exact for both
        grids) depth and native-WSE ingestion must agree. Before the coarse
        lift existed, the depth path built its cost surface from raw depths
        (~2 m) against terrain (~100 m) and diverged wildly.
        """
        import numpy as np

        nodata = -9999.0
        h = w = 64
        dem = np.full((h, w), 100.0, np.float32)
        wse_lr = np.full((8, 8), nodata, np.float32)
        wse_lr[3:5, 2:6] = 102.5
        depth_lr = np.where(np.isclose(wse_lr, nodata), nodata, wse_lr - 100.0)
        base = {
            "count": 1, "dtype": "float32", "crs": "EPSG:32633",
            "nodata": nodata, "compress": "LZW",
        }
        wse_fp = tmp_path / "wse.tif"
        depth_fp = tmp_path / "depth.tif"
        dem_fp = tmp_path / "dem.tif"
        write_raster(wse_fp, wse_lr, dict(base, height=8, width=8,
                     transform=from_origin(0, 512, 64.0, 64.0)))
        write_raster(depth_fp, depth_lr, dict(base, height=8, width=8,
                     transform=from_origin(0, 512, 64.0, 64.0)))
        write_raster(dem_fp, dem, dict(base, height=h, width=w,
                     transform=from_origin(0, 512, 8.0, 8.0)))
        params_fp = tmp_path / "p.json"
        params_fp.write_text(json.dumps({"dp_coarse_pixel_max": 2}))

        worker_cls = resolve_model_worker_class("CostGrow_pcraster")
        outs = {}
        for kind, in_fp in (("wse", wse_fp), ("depth", depth_fp)):
            out_fp = tmp_path / f"grown_{kind}.tif"
            with worker_cls(model_fp=params_fp, logger=logger) as worker:
                worker.run(
                    depth_lr_fp=in_fp,
                    dem_hr_fp=dem_fp,
                    output_fp=out_fp,
                    input_kind=kind,
                )
            outs[kind], _, _ = read_raster(out_fp)
        np.testing.assert_allclose(outs["depth"], outs["wse"], atol=1e-4)

    def test_unknown_params_warn(self, scene, tmp_path, logger, caplog):
        """Cross-variant keys must not be silently ignored."""
        import logging

        params_fp = tmp_path / "p.json"
        params_fp.write_text(
            json.dumps({"max_grow_coarse_pixels": 2, "dp_coarse_pixel_max": 3})
        )
        worker_cls = resolve_model_worker_class("CostGrow_pcraster")
        with caplog.at_level(logging.WARNING):
            with worker_cls(model_fp=params_fp, logger=logger):
                pass
        assert any(
            "max_grow_coarse_pixels" in rec.message and "unrecognized" in rec.message
            for rec in caplog.records
        )

    def test_registry_builtin_fetch(self, tmp_path):
        fp = fetch_model("CostGrow_pcraster", cache_dir=tmp_path / "cache")
        payload = json.loads(fp.read_text())
        assert payload["model_version"] == "CostGrow_pcraster"
        assert payload["distance_metric"] == "chessboard"

    def test_cli_tohr_costgrow_pcraster(self, scene, tmp_path, capsys):
        from floodsr_tpu.cli import main

        out_fp = tmp_path / "cli_costgrow_pcr.tif"
        code = main(
            [
                "tohr",
                "--in", str(scene["wse_fp"]),
                "--dem", str(scene["dem_fp"]),
                "--out", str(out_fp),
                "--model-version", "CostGrow_pcraster",
                "--model-path", str(scene["params_fp"]),
            ]
        )
        assert code == 0
        assert out_fp.exists()
