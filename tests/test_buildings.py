"""Building blocking (reference ADR-0016, planned/unbuilt there).

Covers the GeoJSON loader + scanline rasterizer, the ToHR output mask, the
CostGrow domain blocking, the NRCan STAC fetcher (transport-mocked), and the
CLI plumbing.
"""

import json

import numpy as np
import pytest

from floodsr_tpu.features import (
    building_mask_for_grid,
    load_footprints,
    rasterize_polygons,
)
from floodsr_tpu.io import from_origin, read_raster, write_raster
from floodsr_tpu.tohr import tohr

pytestmark = pytest.mark.unit

NODATA = -9999.0
CRS = "EPSG:32633"


def _square(x1, y1, x2, y2):
    return [[x1, y1], [x2, y1], [x2, y2], [x1, y2], [x1, y1]]


class TestRasterize:
    def test_square_exact_center_containment(self):
        t = from_origin(0, 10, 1.0, 1.0)
        poly = [np.asarray(_square(2.0, 3.0, 7.0, 8.0), float)]
        mask = rasterize_polygons([poly], t, (10, 10))
        want = np.zeros((10, 10), bool)
        want[2:7, 2:7] = True
        np.testing.assert_array_equal(mask, want)

    def test_hole_is_excluded(self):
        t = from_origin(0, 10, 1.0, 1.0)
        poly = [
            np.asarray(_square(2, 3, 7, 8), float),
            np.asarray(_square(4, 5, 5, 6), float),
        ]
        mask = rasterize_polygons([poly], t, (10, 10))
        assert not mask[4, 4]  # the hole's single pixel center
        assert mask.sum() == 24

    def test_overlapping_and_duplicate_polygons_union(self):
        # GDAL burns each geometry independently: overlaps and exact
        # duplicates stay blocked (union), never XOR'd back to unblocked.
        t = from_origin(0, 10, 1.0, 1.0)
        a = [np.asarray(_square(1, 1, 6, 6), float)]
        b = [np.asarray(_square(4, 4, 9, 9), float)]
        mask = rasterize_polygons([a, b, a], t, (10, 10))
        want = rasterize_polygons([a], t, (10, 10)) | rasterize_polygons(
            [b], t, (10, 10)
        )
        np.testing.assert_array_equal(mask, want)
        assert mask[5, 5]  # center of the overlap region

    def test_matches_matplotlib_center_containment(self, rng):
        from matplotlib.path import Path as MplPath

        from floodsr_tpu.io import from_origin

        t = from_origin(0, 20, 1.0, 1.0)
        xs, ys = np.meshgrid(np.arange(20) + 0.5, 20 - (np.arange(20) + 0.5))
        centers = np.column_stack([xs.ravel(), ys.ravel()])
        for _ in range(6):
            pts = rng.uniform(1, 19, (7, 2))
            c = pts.mean(0)
            ang = np.arctan2(pts[:, 1] - c[1], pts[:, 0] - c[0])
            ring = pts[np.argsort(ang)]
            ring = np.vstack([ring, ring[:1]])
            ours = rasterize_polygons([[ring]], t, (20, 20))
            want = MplPath(ring).contains_points(centers).reshape(20, 20)
            np.testing.assert_array_equal(ours, want)

    def test_requires_rectilinear_north_up(self):
        from floodsr_tpu.io.affine import Affine

        with pytest.raises(ValueError, match="north-up"):
            rasterize_polygons(
                [], Affine(-1.0, 0.0, 0.0, 0.0, -1.0, 10.0), (4, 4)
            )


class TestGeoJson:
    def test_feature_collection_and_multipolygon(self):
        doc = {
            "type": "FeatureCollection",
            "features": [
                {
                    "type": "Feature",
                    "geometry": {
                        "type": "Polygon",
                        "coordinates": [_square(0, 0, 1, 1)],
                    },
                },
                {
                    "type": "Feature",
                    "geometry": {
                        "type": "MultiPolygon",
                        "coordinates": [
                            [_square(2, 2, 3, 3)],
                            [_square(4, 4, 5, 5)],
                        ],
                    },
                },
                {"type": "Feature", "geometry": None},
            ],
        }
        polys = load_footprints(doc)
        assert len(polys) == 3

    def test_reprojection_4326_to_utm(self):
        # A small square near the EPSG:32633 natural origin (15E).
        doc = {
            "type": "Polygon",
            "coordinates": [
                [[15.0, 45.0], [15.01, 45.0], [15.01, 45.01], [15.0, 45.01], [15.0, 45.0]]
            ],
        }
        polys = load_footprints(doc, dst_crs=CRS)
        ring = polys[0][0]
        # 15E is the central meridian: easting ~500000, northing ~4983000-4984000.
        assert 499000 < ring[:, 0].min() < 501500
        assert 4.97e6 < ring[:, 1].min() < 5.0e6

    def test_legacy_crs_member_respected(self):
        doc = {
            "type": "Polygon",
            "crs": {"type": "name", "properties": {"name": "urn:ogc:def:crs:EPSG::32633"}},
            "coordinates": [_square(500000, 4000000, 500010, 4000010)],
        }
        polys = load_footprints(doc, dst_crs=CRS)  # same CRS: no transform
        np.testing.assert_allclose(polys[0][0][0], [500000, 4000000])

    def test_from_file(self, tmp_path):
        fp = tmp_path / "b.geojson"
        fp.write_text(json.dumps({"type": "Polygon", "coordinates": [_square(0, 0, 2, 2)]}))
        assert len(load_footprints(fp)) == 1

    def test_missing_file_raises_file_not_found(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            load_footprints(tmp_path / "nope.geojson")

    def test_inline_json_text(self):
        text = json.dumps({"type": "Polygon", "coordinates": [_square(0, 0, 2, 2)]})
        assert len(load_footprints(text)) == 1

    def test_non_finite_vertex_rejected_at_parse(self):
        doc = {
            "type": "Polygon",
            "coordinates": [[[0, 0], [float("nan"), 0], [1, 1], [0, 0]]],
        }
        with pytest.raises(ValueError, match="non-finite"):
            load_footprints(doc)

    def test_top_level_array_rejected(self):
        with pytest.raises(ValueError, match="JSON object"):
            load_footprints('[{"type": "Polygon"}]')

    def test_assumed_4326_guard_rejects_projected_coords(self):
        # Projected coordinates with no declared CRS must not be silently
        # reprojected as lon/lat.
        doc = {
            "type": "Polygon",
            "coordinates": [_square(500000, 4000000, 500010, 4000010)],
        }
        with pytest.raises(ValueError, match="lon/lat"):
            load_footprints(doc, dst_crs=CRS)
        # Declaring the source CRS clears the guard.
        polys = load_footprints(doc, dst_crs=CRS, src_crs=CRS)
        assert len(polys) == 1


def _profile(arr, transform, nodata=NODATA):
    return {
        "height": int(arr.shape[0]), "width": int(arr.shape[1]), "count": 1,
        "dtype": "float32", "crs": CRS, "transform": transform,
        "nodata": float(nodata), "compress": "LZW",
    }


class TestTohrBlocking:
    def test_output_zeroed_inside_footprints(
        self, tiny_model_fp, synthetic_tohr_tiles, tmp_path, logger
    ):
        # Footprint over a block of the 64x64 HR grid (7.5 m pixels from
        # x0=500000, top y=4000000+64*7.5).
        x0, ytop = 500000.0, 4000000.0 + 64 * 7.5
        bfp = tmp_path / "buildings.geojson"
        bfp.write_text(json.dumps({
            "type": "Polygon",
            "crs": {"type": "name", "properties": {"name": "EPSG:32633"}},
            "coordinates": [_square(x0 + 10 * 7.5, ytop - 30 * 7.5,
                                    x0 + 25 * 7.5, ytop - 12 * 7.5)],
        }))
        base_fp = tmp_path / "plain.tif"
        blocked_fp = tmp_path / "blocked.tif"
        common = dict(
            model_version="ResUNet_16x_DEM",
            model_fp=tiny_model_fp,
            depth_lr_fp=synthetic_tohr_tiles["depth_lr_fp"],
            dem_hr_fp=synthetic_tohr_tiles["dem_fp"],
            logger=logger,
        )
        tohr(output_fp=base_fp, **common)
        result = tohr(output_fp=blocked_fp, buildings_fp=bfp, **common)

        base, _, _ = read_raster(base_fp)
        blocked, _, prof = read_raster(blocked_fp)
        mask = building_mask_for_grid(bfp, prof["transform"], blocked.shape, crs=CRS)
        assert mask.any()
        assert (blocked[mask] == 0.0).all()
        np.testing.assert_array_equal(blocked[~mask], base[~mask])
        diag = result["preprocess"]
        assert diag["building_blocked_wet_cells"] == int((base[mask] > 0).sum())

    def test_bad_buildings_file_does_not_clobber_output(
        self, tiny_model_fp, synthetic_tohr_tiles, tmp_path, logger
    ):
        # The footprint mask loads BEFORE the output stream opens: a
        # mistyped --buildings path must fail cleanly without truncating an
        # existing raster at the output path.
        out_fp = tmp_path / "keep.tif"
        out_fp.write_bytes(b"precious previous result")
        with pytest.raises(FileNotFoundError):
            tohr(
                model_version="ResUNet_16x_DEM",
                model_fp=tiny_model_fp,
                depth_lr_fp=synthetic_tohr_tiles["depth_lr_fp"],
                dem_hr_fp=synthetic_tohr_tiles["dem_fp"],
                output_fp=out_fp,
                buildings_fp=tmp_path / "missing.geojson",
                logger=logger,
            )
        assert out_fp.read_bytes() == b"precious previous result"

    def test_no_buildings_diagnostic_is_none(
        self, tiny_model_fp, synthetic_tohr_tiles, tmp_path, logger
    ):
        result = tohr(
            model_version="ResUNet_16x_DEM",
            model_fp=tiny_model_fp,
            depth_lr_fp=synthetic_tohr_tiles["depth_lr_fp"],
            dem_hr_fp=synthetic_tohr_tiles["dem_fp"],
            output_fp=tmp_path / "p.tif",
            logger=logger,
        )
        assert result["preprocess"]["building_blocked_wet_cells"] is None


class TestCostGrowBlocking:
    def test_building_wall_blocks_growth(self, tmp_path, logger):
        from floodsr_tpu.model_registry import resolve_model_worker_class

        h = w = 64
        dem = np.full((h, w), 100.0, np.float32)
        # Anchor water on the left quarter only.
        wse_lr = np.full((8, 8), NODATA, np.float32)
        wse_lr[:, 0] = 102.0
        lr_t = from_origin(0, 512, 64.0, 64.0)
        hr_t = from_origin(0, 512, 8.0, 8.0)
        wse_fp = tmp_path / "wse.tif"
        dem_fp = tmp_path / "dem.tif"
        write_raster(wse_fp, wse_lr, _profile(wse_lr, lr_t))
        write_raster(dem_fp, dem, _profile(dem, hr_t))
        params_fp = tmp_path / "p.json"
        params_fp.write_text(json.dumps({"max_grow_coarse_pixels": 8}))

        # A building wall: a full-height strip at world x in [160, 176)
        # (HR cols 20-21).
        bfp = tmp_path / "wall.geojson"
        bfp.write_text(json.dumps({
            "type": "Polygon",
            "crs": {"type": "name", "properties": {"name": "EPSG:32633"}},
            "coordinates": [_square(160.0, 0.0, 176.0, 512.0)],
        }))

        worker_cls = resolve_model_worker_class("CostGrow")
        outs = {}
        for label, kw in (("plain", {}), ("walled", {"buildings_fp": bfp})):
            out_fp = tmp_path / f"{label}.tif"
            with worker_cls(model_fp=params_fp, logger=logger) as worker:
                res = worker.run(
                    depth_lr_fp=wse_fp, dem_hr_fp=dem_fp, output_fp=out_fp, **kw
                )
            arr, _, _ = read_raster(out_fp)
            outs[label] = ~np.isclose(arr, NODATA)
            if label == "walled":
                assert res["preprocess"]["building_blocked_cells"] == 2 * h
        # Unwalled growth crosses the strip; walled growth cannot.
        assert outs["plain"][:, 22:].any()
        assert not outs["walled"][:, 20:].any()
        # Wall cells themselves are dry.
        assert not outs["walled"][:, 20:22].any()


class TestFetcher:
    def test_stac_fetch_with_mock_transport(self, tmp_path, logger):
        from floodsr_tpu.dem_sources import hrdem_stac
        from floodsr_tpu.features import nrcan_buildings as nb

        # Scene raster whose footprint drives the bbox.
        lr = np.zeros((8, 8), np.float32)
        lr_fp = tmp_path / "lr.tif"
        write_raster(lr_fp, lr, _profile(lr, from_origin(500000, 4000000, 30.0, 30.0)))

        catalog = {
            "type": "FeatureCollection",
            "features": [
                {
                    "id": "tile-1",
                    "assets": {"footprints": {"href": "https://x/a.geojson"}},
                },
                {
                    "id": "tile-2",
                    "assets": {"footprints": {"href": "https://x/b.geojson"}},
                },
            ],
        }
        asset_a = {"type": "FeatureCollection", "features": [
            {"type": "Feature", "geometry": {"type": "Polygon",
                                             "coordinates": [_square(0, 0, 1, 1)]}},
        ]}
        asset_b = {"type": "Feature", "geometry": {"type": "Polygon",
                                                   "coordinates": [_square(2, 2, 3, 3)]}}
        calls = []

        def transport(url, data, headers):
            calls.append(url)
            if url.endswith("/search"):
                body = json.loads(data.decode())
                assert body["collections"] == [nb.COLLECTION]
                assert len(body["bbox"]) == 4
                return json.dumps(catalog).encode()
            if url.endswith("a.geojson"):
                return json.dumps(asset_a).encode()
            if url.endswith("b.geojson"):
                return json.dumps(asset_b).encode()
            raise AssertionError(f"unexpected URL {url}")

        hrdem_stac.set_transport(transport)
        try:
            nb._SESSION_FETCH_CACHE.clear()
            out = nb.fetch_buildings_for_raster(
                raster_fp=lr_fp, output_fp=tmp_path / "b.geojson", logger=logger
            )
            assert out.feature_count == 2
            assert out.item_ids == ["tile-1", "tile-2"]
            doc = json.loads(out.buildings_fp.read_text())
            assert len(doc["features"]) == 2
            n_calls = len(calls)
            # Session memo: a second fetch re-downloads nothing.
            again = nb.fetch_buildings_for_raster(
                raster_fp=lr_fp, output_fp=tmp_path / "b2.geojson", logger=logger
            )
            assert len(calls) == n_calls
            assert again.buildings_fp.exists()
        finally:
            hrdem_stac.set_transport(None)
            nb._SESSION_FETCH_CACHE.clear()


class TestCliPlumbing:
    def test_parse_and_machine_json(self):
        from floodsr_tpu.cli import _build_tohr_machine_cli_tokens, _parse_arguments

        args = _parse_arguments(
            ["tohr", "--in", "a.tif", "--dem", "b.tif",
             "--buildings", "c.geojson"]
        )
        assert str(args.buildings) == "c.geojson"
        assert args.fetch_buildings is False
        args = _parse_arguments(
            ["tohr", "--in", "a.tif", "--dem", "b.tif", "--fetch-buildings"]
        )
        assert args.fetch_buildings is True

        tokens = _build_tohr_machine_cli_tokens(
            {"buildings": "c.geojson", "fetch_buildings": False}, []
        )
        assert tokens == ["--buildings", "c.geojson"]
