"""CRS identity: EPSG codes, WKT-only GeoKeys, and the ingestion edge.

Reference behavior: ``floodsr/preprocessing.py:304-331`` accepts any
GDAL-readable CRS — including GeoTIFFs whose GeoKeys carry only a WKT/ESRI
citation (user-defined code 32767). These tests pin (a) EPSG recovery from a
WKT authority node, (b) opaque-but-comparable identity for WKT-only CRSs,
(c) the GeoTIFF citation round trip, and (d) the full tohr pipeline on a
raster pair with WKT-only CRS.
"""

import numpy as np
import pytest

from floodsr_tpu.io import from_origin, read_raster, write_raster
from floodsr_tpu.io.crs import CRS

# WKT1 for EPSG:32618 (WGS 84 / UTM 18N) with the usual nested component
# authorities (datum/spheroid/unit) AND a top-level authority.
WKT1_UTM18 = """PROJCS["WGS 84 / UTM zone 18N",
    GEOGCS["WGS 84",
        DATUM["WGS_1984",
            SPHEROID["WGS 84",6378137,298.257223563,
                AUTHORITY["EPSG","7030"]],
            AUTHORITY["EPSG","6326"]],
        PRIMEM["Greenwich",0,AUTHORITY["EPSG","8901"]],
        UNIT["degree",0.0174532925199433,AUTHORITY["EPSG","9122"]],
        AUTHORITY["EPSG","4326"]],
    PROJECTION["Transverse_Mercator"],
    PARAMETER["latitude_of_origin",0],
    PARAMETER["central_meridian",-75],
    PARAMETER["scale_factor",0.9996],
    PARAMETER["false_easting",500000],
    PARAMETER["false_northing",0],
    UNIT["metre",1,AUTHORITY["EPSG","9001"]],
    AUTHORITY["EPSG","32618"]]"""

# Same definition with NO top-level authority: only nested component codes
# remain, none of which name the CRS itself → must stay opaque.
WKT1_NO_TOP_AUTHORITY = """PROJCS["Custom TM zone",
    GEOGCS["WGS 84",
        DATUM["WGS_1984",
            SPHEROID["WGS 84",6378137,298.257223563,
                AUTHORITY["EPSG","7030"]]],
        PRIMEM["Greenwich",0],
        UNIT["degree",0.0174532925199433,AUTHORITY["EPSG","9122"]]],
    PROJECTION["Transverse_Mercator"],
    PARAMETER["central_meridian",-74.5],
    PARAMETER["scale_factor",0.9999],
    UNIT["metre",1,AUTHORITY["EPSG","9001"]]]"""

WKT2_NZTM = """PROJCRS["NZGD2000 / New Zealand Transverse Mercator 2000",
    BASEGEOGCRS["NZGD2000",
        DATUM["New Zealand Geodetic Datum 2000",
            ELLIPSOID["GRS 1980",6378137,298.257222101]],
        ID["EPSG",4167]],
    CONVERSION["NZTM",METHOD["Transverse Mercator"]],
    ID["EPSG",2193]]"""


class TestCRSFromWkt:
    def test_top_level_authority_recovers_epsg(self):
        crs = CRS.from_wkt(WKT1_UTM18)
        assert crs.epsg == 32618
        assert crs.is_projected
        assert crs == CRS(32618)

    def test_wkt2_id_recovers_epsg(self):
        crs = CRS.from_wkt(WKT2_NZTM)
        assert crs.epsg == 2193

    def test_nested_authorities_do_not_leak(self):
        """Unit/datum codes (9001/7030/…) must never be taken as the CRS."""
        crs = CRS.from_wkt(WKT1_NO_TOP_AUTHORITY)
        assert crs.epsg is None
        assert crs.is_projected  # PROJCS root

    def test_geographic_root_keyword(self):
        crs = CRS.from_wkt('GEOGCS["Custom geo",DATUM["D",SPHEROID["S",6378137,298.25]]]')
        assert crs.epsg is None
        assert crs.is_geographic

    def test_from_user_input_detects_wkt(self):
        assert CRS.from_user_input(WKT1_UTM18) == CRS(32618)
        assert CRS.from_user_input("EPSG:4326") == CRS(4326)
        assert CRS.from_user_input(32633) == CRS(32633)

    def test_opaque_equality_is_whitespace_insensitive(self):
        a = CRS.from_wkt(WKT1_NO_TOP_AUTHORITY)
        b = CRS.from_wkt(" ".join(WKT1_NO_TOP_AUTHORITY.split()))
        assert a == b
        assert hash(a) == hash(b)

    def test_different_definitions_are_unequal(self):
        a = CRS.from_wkt(WKT1_NO_TOP_AUTHORITY)
        b = CRS.from_wkt(WKT1_NO_TOP_AUTHORITY.replace("-74.5", "-75.5"))
        assert a != b

    def test_epsg_and_opaque_never_equal(self):
        assert CRS.from_wkt(WKT1_NO_TOP_AUTHORITY) != CRS(32618)
        assert CRS(32618) != CRS.from_wkt(WKT1_NO_TOP_AUTHORITY)

    def test_requires_identity(self):
        with pytest.raises(ValueError):
            CRS()


class TestWktGeoTiffRoundTrip:
    def _write(self, fp, crs):
        arr = np.arange(64, dtype=np.float32).reshape(8, 8)
        profile = {
            "driver": "GTiff", "height": 8, "width": 8, "count": 1,
            "dtype": "float32", "crs": crs, "nodata": -9999.0,
            "transform": from_origin(500000.0, 4000080.0, 10.0, 10.0),
            "compress": "LZW",
        }
        write_raster(fp, arr, profile)

    def test_wkt_only_crs_round_trips(self, tmp_path):
        crs = CRS.from_wkt(WKT1_NO_TOP_AUTHORITY)
        fp = tmp_path / "wkt.tif"
        self._write(fp, crs)
        _, _, profile = read_raster(fp)
        got = profile["crs"]
        assert got is not None
        assert got.epsg is None
        assert got == crs
        assert got.is_projected

    def test_wkt_with_authority_reads_back_as_epsg(self, tmp_path):
        fp = tmp_path / "utm.tif"
        self._write(fp, CRS.from_wkt(WKT1_UTM18))
        _, _, profile = read_raster(fp)
        # EPSG was recovered at parse time, so the file carries the code.
        assert profile["crs"] == CRS(32618)

    def test_geographic_wkt_only_round_trips(self, tmp_path):
        crs = CRS.from_wkt('GEOGCS["Custom geo",DATUM["D",SPHEROID["S",6378137,298.25]]]')
        fp = tmp_path / "geo.tif"
        self._write(fp, crs)
        _, _, profile = read_raster(fp)
        assert profile["crs"] == crs
        assert profile["crs"].is_geographic


class TestGeodesyGuard:
    def test_wkt_only_tm_builds_converter_from_parameters(self):
        # Round 4 raised for any WKT-only CRS; the fetch path now builds
        # TM/LCC/WebMercator converters directly from WKT parameters.
        from floodsr_tpu.dem_sources.geodesy import (
            TransverseMercator,
            projection_for,
        )

        proj = projection_for(CRS.from_wkt(WKT1_NO_TOP_AUTHORITY))
        assert isinstance(proj, TransverseMercator)
        assert proj.lon0_deg == -74.5
        assert proj.k0 == 0.9999
        lon, lat = proj.inverse(*proj.forward(-74.2, 41.0))
        assert abs(lon - -74.2) < 1e-9 and abs(lat - 41.0) < 1e-9

    def test_wkt_only_unsupported_method_raises_named(self):
        from floodsr_tpu.dem_sources.geodesy import projection_for

        wkt = WKT1_NO_TOP_AUTHORITY.replace(
            'PROJECTION["Transverse_Mercator"]', 'PROJECTION["Sinusoidal"]'
        )
        with pytest.raises(ValueError, match="unsupported WKT projection method"):
            projection_for(CRS.from_wkt(wkt))


@pytest.mark.e2e
class TestTohrWithWktOnlyCrs:
    def test_end_to_end(self, tiny_model_fp, tmp_path, logger):
        """tohr succeeds on a synthetic pair whose TIFFs carry WKT-only CRS."""
        from floodsr_tpu.tohr import tohr

        crs = CRS.from_wkt(WKT1_NO_TOP_AUTHORITY)
        lr_shape, hr_shape = (16, 16), (64, 64)
        lr_res, hr_res = 30.0, 7.5
        x0, y0 = 500000.0, 4000000.0
        rng = np.random.default_rng(3)
        depth_lr = rng.uniform(0.0, 2.0, lr_shape).astype(np.float32)
        dem = 400.0 + np.cumsum(
            rng.normal(0, 0.5, hr_shape).astype(np.float32), axis=1
        )

        def _write(fp, arr, res, shape):
            profile = {
                "driver": "GTiff", "height": shape[0], "width": shape[1],
                "count": 1, "dtype": "float32", "crs": crs, "nodata": -9999.0,
                "transform": from_origin(x0, y0 + shape[0] * res, res, res),
                "compress": "LZW",
            }
            write_raster(fp, arr, profile)

        depth_fp = tmp_path / "depth_lr.tif"
        dem_fp = tmp_path / "dem.tif"
        _write(depth_fp, depth_lr, lr_res, lr_shape)
        _write(dem_fp, dem, hr_res, hr_shape)

        out_fp = tmp_path / "pred.tif"
        result = tohr(
            model_version="ResUNet_16x_DEM",
            model_fp=tiny_model_fp,
            depth_lr_fp=depth_fp,
            dem_hr_fp=dem_fp,
            output_fp=out_fp,
            logger=logger,
        )
        pred, _, profile = read_raster(result["output_fp"])
        assert pred.shape == hr_shape
        assert np.isfinite(pred).all()
        # The opaque CRS rides through to the output unchanged.
        assert profile["crs"] == crs
