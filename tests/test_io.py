"""Raster I/O: affine math, TIFF codec, GeoTIFF profiles, native fast path."""

import contextlib
import io as _io

import numpy as np
import pytest
from PIL import Image

from floodsr_tpu.io import (
    Affine,
    CRS,
    array_bounds,
    from_bounds,
    from_origin,
    get_geotif_options,
    read_raster,
    write_raster,
)
from floodsr_tpu.io import native
from floodsr_tpu.io.affine import round_window, window_from_bounds, window_transform
from floodsr_tpu.io.geotiff import pixel_size, raster_bounds
from floodsr_tpu.io.tiff import (
    StripStreamWriter,
    TAG_STRIP_BYTE_COUNTS,
    _apply_predictor_encode,
    _read_ifd,
    decode_tiff,
    encode_tiff,
    lzw_decode,
    lzw_encode,
    packbits_decode,
)

pytestmark = pytest.mark.unit


class TestAffine:
    def test_from_origin_maps_corners(self):
        t = from_origin(500000.0, 4000000.0, 30.0, 30.0)
        assert t * (0, 0) == (500000.0, 4000000.0)
        assert t * (10, 5) == (500300.0, 3999850.0)

    def test_from_bounds_roundtrip(self):
        t = from_bounds(0.0, -100.0, 200.0, 0.0, 20, 10)
        assert array_bounds(10, 20, t) == (0.0, -100.0, 200.0, 0.0)

    def test_invert(self):
        t = from_origin(100.0, 50.0, 2.0, 2.0)
        inv = t.invert()
        x, y = t * (7.0, 3.0)
        col, row = inv * (x, y)
        assert col == pytest.approx(7.0)
        assert row == pytest.approx(3.0)

    def test_window_from_bounds(self):
        t = from_origin(0.0, 100.0, 10.0, 10.0)
        win = window_from_bounds(20.0, 40.0, 50.0, 80.0, t)
        assert round_window(win) == (2, 2, 4, 3)

    def test_window_transform(self):
        t = from_origin(0.0, 100.0, 10.0, 10.0)
        sub = window_transform(2, 3, t)
        assert sub * (0, 0) == (30.0, 80.0)


class TestCRS:
    def test_parse_forms(self):
        assert CRS.from_user_input("EPSG:32633") == CRS(32633)
        assert CRS.from_user_input(3979) == CRS(3979)
        assert CRS.from_user_input(CRS(2169)) == CRS(2169)
        assert CRS.from_user_input(None) is None

    def test_projected_classification(self):
        assert CRS(32633).is_projected
        assert CRS(3979).is_projected
        assert CRS(2169).is_projected
        assert CRS(4326).is_geographic
        assert CRS(4269).is_geographic

    def test_to_string(self):
        assert CRS(32633).to_string() == "EPSG:32633"


class TestTiffCodec:
    def test_lzw_roundtrip_python(self, rng):
        data = rng.integers(0, 256, 50000, dtype=np.uint8).tobytes()
        assert lzw_decode(lzw_encode(data)) == data

    def test_lzw_cross_pil_both_directions(self, rng):
        arr = rng.normal(size=(37, 91)).astype(np.float32)
        buf = _io.BytesIO()
        Image.fromarray(arr, mode="F").save(buf, format="TIFF", compression="tiff_lzw")
        got, _ = decode_tiff(buf.getvalue())
        np.testing.assert_array_equal(got, arr)
        data = encode_tiff(arr, compression=5)
        np.testing.assert_array_equal(np.array(Image.open(_io.BytesIO(data))), arr)

    @pytest.mark.parametrize("compression", [1, 5, 8])
    def test_write_compressions_pil_readable(self, rng, compression):
        arr = rng.normal(size=(33, 45)).astype(np.float32)
        data = encode_tiff(arr, compression=compression)
        np.testing.assert_array_equal(np.array(Image.open(_io.BytesIO(data))), arr)

    def test_integer_predictor_roundtrip(self, rng):
        arr = rng.integers(-500, 4000, size=(50, 61)).astype(np.int16)
        data = encode_tiff(arr, compression=5)
        got, _ = decode_tiff(data)
        np.testing.assert_array_equal(got, arr)
        np.testing.assert_array_equal(np.array(Image.open(_io.BytesIO(data))), arr)

    def test_float_predictor_roundtrip_and_libtiff_readable(self, rng):
        """Predictor 3 (byte-split float) writes: our decode AND libtiff
        (via Pillow's compressed-TIFF path) must both recover the array;
        on smooth float fields it must actually shrink the LZW stream."""
        x = np.linspace(0.0, 8.0, 160)
        arr = (
            np.sin(x)[None, :] * np.cos(x)[:, None] * 100.0
            + rng.normal(0.0, 0.01, (160, 160))
        ).astype(np.float32)
        plain = encode_tiff(arr, compression=5)
        p3 = encode_tiff(arr, compression=5, predictor=3)
        got, _ = decode_tiff(p3)
        np.testing.assert_array_equal(got, arr)
        np.testing.assert_array_equal(np.array(Image.open(_io.BytesIO(p3))), arr)
        assert len(p3) < 0.9 * len(plain), (len(p3), len(plain))

    def test_float_predictor_float64_tiled(self, rng):
        arr = rng.normal(size=(80, 70)).astype(np.float64).cumsum(axis=1)
        data = encode_tiff(arr, compression=5, predictor=3, tile=(32, 48))
        got, _ = decode_tiff(data)
        np.testing.assert_array_equal(got, arr)

    def test_predictor_kind_mismatches_raise(self, rng):
        farr = rng.normal(size=(8, 9)).astype(np.float32)
        iarr = rng.integers(0, 100, size=(8, 9)).astype(np.int16)
        with pytest.raises(ValueError, match="predictor 2 requires integer"):
            encode_tiff(farr, compression=5, predictor=2)
        with pytest.raises(ValueError, match="predictor 3 requires floating"):
            encode_tiff(iarr, compression=5, predictor=3)

    def test_stream_writer_float_predictor(self, rng, tmp_path):
        from floodsr_tpu.io.tiff import StripStreamWriter

        arr = rng.normal(size=(90, 64)).astype(np.float32).cumsum(axis=0)
        fp = tmp_path / "pred3_stream.tif"
        with StripStreamWriter(
            fp, 90, 64, np.float32, rows_per_strip=17, predictor=3
        ) as w:
            for r in range(0, 90, 30):
                w.write_rows(arr[r : r + 30])
        got, _ = decode_tiff(fp.read_bytes())
        np.testing.assert_array_equal(got, arr)
        np.testing.assert_array_equal(np.array(Image.open(fp)), arr)

    def test_pil_deflate_and_packbits_readable(self, rng):
        arr = rng.normal(size=(20, 30)).astype(np.float32)
        buf = _io.BytesIO()
        Image.fromarray(arr, mode="F").save(buf, format="TIFF", compression="tiff_adobe_deflate")
        got, _ = decode_tiff(buf.getvalue())
        np.testing.assert_array_equal(got, arr)
        u8 = rng.integers(0, 250, size=(16, 24)).astype(np.uint8)
        buf = _io.BytesIO()
        Image.fromarray(u8).save(buf, format="TIFF", compression="packbits")
        got, _ = decode_tiff(buf.getvalue())
        np.testing.assert_array_equal(got, u8)

    def test_packbits_literal_and_run(self):
        # 3 literal bytes then a 4-byte run of 0xAB
        encoded = bytes([2, 1, 2, 3, 257 - 4, 0xAB])
        assert packbits_decode(encoded) == bytes([1, 2, 3]) + b"\xab" * 4

    def test_packbits_encode_roundtrip_fuzz(self, rng):
        from floodsr_tpu.io.tiff import packbits_encode

        for trial in range(24):
            n = int(rng.integers(1, 700))
            row_bytes = int(rng.integers(1, n + 1))
            # Mix of runs and literals: few distinct values → long runs.
            vals = int(rng.integers(1, 6))
            data = rng.integers(0, vals, size=n).astype(np.uint8).tobytes()
            enc = packbits_encode(data, row_bytes)
            assert packbits_decode(enc) == data, (trial, n, row_bytes)
        # Degenerate shapes.
        assert packbits_decode(packbits_encode(b"", 4)) == b""
        assert packbits_decode(packbits_encode(b"\x00" * 1000, 100)) == b"\x00" * 1000
        one = bytes(range(129))  # literal longer than one 128-byte group
        assert packbits_decode(packbits_encode(one, None)) == one
        run129 = b"\xcc" * 129  # run split 128+1: the 1-tail must be a literal
        assert packbits_decode(packbits_encode(run129, None)) == run129

    def test_packbits_encode_runs_compress(self):
        from floodsr_tpu.io.tiff import packbits_encode

        data = b"\x00" * 4096
        assert len(packbits_encode(data, 512)) <= 2 * (4096 // 128)

    def test_packbits_write_tiff_roundtrip_and_pil_readable(self, rng):
        arr = rng.integers(0, 4, size=(40, 50)).astype(np.uint8)
        data = encode_tiff(arr, compression=32773, rows_per_strip=16)
        got, tags = decode_tiff(data)
        np.testing.assert_array_equal(got, arr)
        assert tags[259] == 32773
        assert 317 not in tags  # no predictor tag with PackBits
        np.testing.assert_array_equal(
            np.array(Image.open(_io.BytesIO(data))), arr
        )

    def test_packbits_write_float_roundtrip(self, rng):
        arr = rng.normal(size=(33, 21)).astype(np.float32)
        data = encode_tiff(arr, compression=32773)
        got, _ = decode_tiff(data)
        np.testing.assert_array_equal(got, arr)

    def test_multi_strip_layout(self, rng):
        arr = rng.normal(size=(700, 300)).astype(np.float32)
        data = encode_tiff(arr, compression=5, rows_per_strip=64)
        got, _ = decode_tiff(data)
        np.testing.assert_array_equal(got, arr)

    def test_not_a_tiff_raises(self):
        with pytest.raises(ValueError):
            decode_tiff(b"XYZ xxxxxxxxxxxx")

    @pytest.mark.parametrize(
        "head,name",
        [
            (b"\x89PNG\r\n\x1a\n" + b"\0" * 64, "PNG"),
            (b"\xff\xd8\xff\xe0" + b"\0" * 64, "JPEG"),
            (b"EHFA_HEADER_TAG" + b"\0" * 64, "ERDAS Imagine"),
            (b"\x89HDF\r\n\x1a\n" + b"\0" * 64, "HDF5"),
            (b"DSBB" + b"\0" * 64, "Surfer binary grid"),
        ],
    )
    def test_known_non_tiff_formats_get_named_capability_error(
        self, head, name, tmp_path
    ):
        """A PNG/IMG/netCDF input names the format and the supported set,
        instead of a bare parse error (reference reads these via GDAL)."""
        with pytest.raises(ValueError, match=f"unsupported raster format: {name}"):
            decode_tiff(head)
        # Same behavior through the file-level read and the window reader.
        from floodsr_tpu.io.geotiff import read_raster
        from floodsr_tpu.io.tiff_window import MemoryByteSource, TiffWindowReader

        fp = tmp_path / "not_a.tif"
        fp.write_bytes(head)
        with pytest.raises(ValueError, match="unsupported raster format"):
            read_raster(fp)
        with pytest.raises(ValueError, match="unsupported raster format"):
            TiffWindowReader(MemoryByteSource(head))

    def test_native_codec_matches_python(self, rng):
        if not native.available():
            from floodsr_tpu.io.build_native import build

            assert build() is not None, "g++ native codec build failed"
        data = rng.integers(0, 256, 200000, dtype=np.uint8).tobytes()
        enc_c = native.lzw_encode(data)
        assert lzw_decode(enc_c) == data
        assert native.lzw_decode(lzw_encode(data), len(data)) == data

    def test_native_builds_on_demand_when_absent(self, tmp_path):
        """A fresh checkout (no .so) must auto-build on first use.

        Without this, every fresh install silently falls back to the
        pure-Python LZW encoder (minutes per 3840² float32 scene — the
        round-4 bench regression). Runs in a subprocess so this process's
        cached ctypes handle is not disturbed.
        """
        import subprocess
        import sys

        from floodsr_tpu.io import native as native_mod

        lib = native_mod._LIB_PATH
        if not lib.exists():  # ensure there is a library to move aside
            from floodsr_tpu.io.build_native import build

            assert build() is not None, "g++ native codec build failed"
        # Back up within the same directory: a rename into pytest's tmp_path
        # fails with EXDEV when /tmp is a different filesystem (tmpfs).
        backup = lib.parent / (lib.name + ".test-backup")
        lib.rename(backup)
        try:
            code = (
                "from floodsr_tpu.io import native; "
                "import sys; sys.exit(0 if native.available() else 1)"
            )
            proc = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True,
                text=True,
                timeout=120,
            )
            assert proc.returncode == 0, proc.stderr
            assert lib.exists(), "loader did not rebuild the missing library"
        finally:
            if lib.exists():
                backup.unlink(missing_ok=True)
            else:
                backup.rename(lib)

    def test_build_march_policy(self, monkeypatch):
        """FLOODSR_NATIVE_MARCH governs -march: native default, portable
        omits the flag (container images deploy the .so to unknown CPUs —
        builder-ISA codegen would SIGILL at runtime, not at compile time)."""
        import subprocess as sp

        from floodsr_tpu.io import build_native as bn

        seen: list[list[str]] = []

        def fake_run(cmd, check, capture_output, text):
            seen.append(cmd)
            raise sp.CalledProcessError(1, cmd, stderr="stub")

        monkeypatch.setattr(bn.subprocess, "run", fake_run)

        monkeypatch.delenv("FLOODSR_NATIVE_MARCH", raising=False)
        assert bn.build(verbose=False, retries=0) is None
        assert any("-march=native" in c for c in seen[0])
        assert not any("-march" in f for f in seen[1])  # rejection fallback

        seen.clear()
        monkeypatch.setenv("FLOODSR_NATIVE_MARCH", "portable")
        assert bn.build(verbose=False, retries=0) is None
        assert len(seen) == 1 and not any("-march" in f for f in seen[0])

        seen.clear()
        monkeypatch.setenv("FLOODSR_NATIVE_MARCH", "x86-64-v3")
        assert bn.build(verbose=False, retries=0) is None
        assert any("-march=x86-64-v3" in f for f in seen[0])

    def test_native_decode_fuzz_matches_python(self, rng):
        """Random/corrupt streams: native decode agrees with the Python twin.

        The native decoder (tiff_codec.cc) must reject exactly the streams
        the behavioral-reference Python codec rejects, and produce identical
        bytes on the ones it accepts — including truncated and bit-flipped
        valid streams, which exercise the mid-table corrupt-code paths.
        """
        if not native.available():
            pytest.skip("native codec unavailable")
        streams = []
        for n in (1, 2, 17, 300):
            streams.append(rng.integers(0, 256, n, dtype=np.uint8).tobytes())
        valid = lzw_encode(rng.integers(0, 256, 4096, dtype=np.uint8).tobytes())
        streams.append(valid[: len(valid) // 2])  # truncated
        for _ in range(20):  # bit flips in a valid stream
            b = bytearray(valid)
            i = int(rng.integers(0, len(b)))
            b[i] ^= 1 << int(rng.integers(0, 8))
            streams.append(bytes(b))
        for s in streams:
            try:
                want = lzw_decode(s)
                want_err = False
            except ValueError:
                want_err = True
            if want_err:
                with pytest.raises(ValueError):
                    native.lzw_decode(s, 1 << 20)
            else:
                assert native.lzw_decode(s, 1 << 20) == want


class TestAsciiGrids:
    """ESRI AAIGrid / Surfer DSAA text grids through the read_raster surface.

    Reference breadth: rasterio/GDAL reads these transparently
    (floodsr/preprocessing.py:247-282); this build dispatches them from
    read_raster to floodsr_tpu.io.ascii_grid.
    """

    ESRI = (
        "ncols 4\n"
        "nrows 3\n"
        "xllcorner 500000\n"
        "yllcorner 4000000\n"
        "cellsize 30\n"
        "NODATA_value -9999\n"
        "1 2 3 4\n"
        "5 6 -9999 8\n"
        "9 10 11 12\n"
    )

    def test_esri_ascii_reads_like_a_geotiff(self, tmp_path):
        from floodsr_tpu.io import read_raster

        fp = tmp_path / "depth.asc"
        fp.write_text(self.ESRI)
        arr, nodata, profile = read_raster(fp)
        assert arr.shape == (3, 4) and arr.dtype == np.float32
        assert arr[0, 0] == 1.0 and arr[1, 2] == -9999.0 and arr[2, 3] == 12.0
        assert nodata == -9999.0
        assert profile["driver"] == "AAIGrid"
        t = profile["transform"]
        # North-up: top edge = yllcorner + nrows*cellsize.
        assert (t.a, t.e, t.c, t.f) == (30.0, -30.0, 500000.0, 4000090.0)
        assert profile["crs"] is None  # no .prj sidecar

    PRJ_32633 = (
        'PROJCS["WGS 84 / UTM zone 33N",GEOGCS["WGS 84",DATUM["WGS_1984",'
        'SPHEROID["WGS 84",6378137,298.257223563]],PRIMEM["Greenwich",0],'
        'UNIT["degree",0.0174532925199433]],PROJECTION["Transverse_Mercator"],'
        'PARAMETER["latitude_of_origin",0],PARAMETER["central_meridian",15],'
        'PARAMETER["scale_factor",0.9996],PARAMETER["false_easting",500000],'
        'PARAMETER["false_northing",0],UNIT["metre",1],'
        'AUTHORITY["EPSG","32633"]]'
    )

    def test_prj_sidecar_resolves_crs(self, tmp_path):
        from floodsr_tpu.io import read_raster

        fp = tmp_path / "depth.asc"
        fp.write_text(self.ESRI)
        (tmp_path / "depth.prj").write_text(self.PRJ_32633)
        _, _, profile = read_raster(fp)
        assert profile["crs"] is not None and profile["crs"].epsg == 32633

    def test_xllcenter_and_dx_dy_variant(self, tmp_path):
        from floodsr_tpu.io import read_raster

        fp = tmp_path / "g.asc"
        fp.write_text(
            "NCOLS 2\nNROWS 2\nXLLCENTER 110\nYLLCENTER 210\n"
            "DX 20\nDY 10\n1 2\n3 4\n"
        )
        arr, nodata, profile = read_raster(fp)
        assert arr.shape == (2, 2) and nodata is None
        t = profile["transform"]
        # Center registration shifts the corner by half a cell.
        assert (t.c, t.f) == (100.0, 225.0)
        assert (t.a, t.e) == (20.0, -10.0)

    def test_window_read_matches_full_read(self, tmp_path):
        from floodsr_tpu.io import read_raster

        fp = tmp_path / "depth.asc"
        fp.write_text(self.ESRI)
        full, _, full_profile = read_raster(fp)
        win, _, win_profile = read_raster(fp, window=(1, 2, 2, 2))
        np.testing.assert_array_equal(win, full[1:3, 2:4])
        ft, wt = full_profile["transform"], win_profile["transform"]
        assert (wt.c, wt.f) == (ft.c + 2 * 30.0, ft.f - 1 * 30.0)
        assert (win_profile["height"], win_profile["width"]) == (2, 2)

    def test_surfer_dsaa_grid(self, tmp_path):
        from floodsr_tpu.io import read_raster

        # 3 cols x 2 rows, node-registered, rows stored south-first;
        # one blanked node.
        fp = tmp_path / "g.grd"
        fp.write_text(
            "DSAA\n3 2\n100 120\n200 210\n0 9\n"
            "1 2 3\n4 1.70141e38 6\n"
        )
        arr, nodata, profile = read_raster(fp)
        assert profile["driver"] == "GSAG"
        assert arr.shape == (2, 3)
        # Top row is the northern (last-stored) row; blank -> nan.
        assert arr[0, 0] == 4.0 and np.isnan(arr[0, 1]) and arr[0, 2] == 6.0
        np.testing.assert_array_equal(arr[1], [1.0, 2.0, 3.0])
        assert nodata is not None and np.isnan(nodata)
        t = profile["transform"]
        assert (t.a, t.e) == (10.0, -10.0)
        # Nodes become pixel centers: west = xlo - dx/2, north = yhi + dy/2.
        assert (t.c, t.f) == (95.0, 215.0)

    @pytest.mark.parametrize(
        "text,match",
        [
            ("ncols 2\nnrows 2\nxllcorner 0\nyllcorner 0\n1 2 3 4\n",
             "need cellsize"),
            ("ncols 2\nnrows 2\nxllcorner 0\nyllcorner 0\ncellsize 1\n1 2 3\n",
             "expected 4 values"),
            ("DSAA\n2 2\n0 1\n0 1\n0 1\n1 2 3\n", "expected 4 values"),
        ],
    )
    def test_malformed_grids_raise_named_errors(self, tmp_path, text, match):
        from floodsr_tpu.io import read_raster

        fp = tmp_path / "bad.asc"
        fp.write_text(text)
        with pytest.raises(ValueError, match=match):
            read_raster(fp)

    def test_window_codec_names_the_text_grid_boundary(self):
        """The streaming TIFF codec can't serve text grids — the error says
        they are readable via read_raster, not 'unsupported'."""
        from floodsr_tpu.io.tiff_window import MemoryByteSource, TiffWindowReader

        with pytest.raises(ValueError, match="readable via"):
            TiffWindowReader(MemoryByteSource(self.ESRI.encode()))


class TestGeoTiff:
    def _profile(self, arr, crs="EPSG:32633", nodata=-9999.0):
        return {
            "driver": "GTiff",
            "dtype": "float32",
            "nodata": nodata,
            "width": arr.shape[1],
            "height": arr.shape[0],
            "count": 1,
            "crs": crs,
            "transform": from_origin(500000.0, 4000000.0, 30.0, 30.0),
            "compress": "LZW",
        }

    def test_write_read_roundtrip(self, tmp_path, rng):
        arr = rng.uniform(0, 5, size=(64, 48)).astype(np.float32)
        fp = tmp_path / "depth.tif"
        write_raster(fp, arr, self._profile(arr))
        got, nodata, profile = read_raster(fp)
        np.testing.assert_array_equal(got, arr)
        assert nodata == -9999.0
        assert profile["crs"] == CRS(32633)
        assert profile["width"] == 48 and profile["height"] == 64
        assert profile["transform"].almost_equals(
            from_origin(500000.0, 4000000.0, 30.0, 30.0)
        )
        assert profile["compress"] == "LZW"

    def test_geographic_crs_roundtrip(self, tmp_path):
        arr = np.zeros((4, 4), np.float32)
        profile = self._profile(arr, crs="EPSG:4326")
        fp = tmp_path / "geo.tif"
        write_raster(fp, arr, profile)
        _, _, got_profile = read_raster(fp)
        assert got_profile["crs"] == CRS(4326)
        assert got_profile["crs"].is_geographic

    def test_no_crs_roundtrip(self, tmp_path):
        arr = np.ones((4, 4), np.float32)
        profile = self._profile(arr, crs=None)
        write_raster(tmp_path / "nocrs.tif", arr, profile)
        _, _, got = read_raster(tmp_path / "nocrs.tif")
        assert got["crs"] is None

    def test_nodata_none(self, tmp_path):
        arr = np.ones((4, 4), np.float32)
        profile = self._profile(arr, nodata=None)
        write_raster(tmp_path / "x.tif", arr, profile)
        _, nodata, _ = read_raster(tmp_path / "x.tif")
        assert nodata is None

    def test_windowed_read(self, tmp_path, rng):
        arr = rng.uniform(0, 5, size=(40, 50)).astype(np.float32)
        fp = tmp_path / "win.tif"
        write_raster(fp, arr, self._profile(arr))
        got, _, profile = read_raster(fp, window=(10, 5, 20, 30))
        np.testing.assert_array_equal(got, arr[10:30, 5:35])
        # Window transform shifts the origin by the offsets.
        assert profile["transform"].c == pytest.approx(500000.0 + 5 * 30.0)
        assert profile["transform"].f == pytest.approx(4000000.0 - 10 * 30.0)

    def test_bounds_and_pixel_size(self, tmp_path):
        arr = np.zeros((10, 20), np.float32)
        fp = tmp_path / "b.tif"
        write_raster(fp, arr, self._profile(arr))
        _, _, profile = read_raster(fp)
        left, bottom, right, top = raster_bounds(profile)
        assert (left, top) == (500000.0, 4000000.0)
        assert right == pytest.approx(500000.0 + 20 * 30.0)
        assert bottom == pytest.approx(4000000.0 - 10 * 30.0)
        assert pixel_size(profile) == (30.0, 30.0)

    def test_profile_shape_mismatch_raises(self, tmp_path):
        arr = np.zeros((4, 4), np.float32)
        profile = self._profile(arr)
        profile["height"] = 8
        with pytest.raises(AssertionError):
            write_raster(tmp_path / "bad.tif", arr, profile)

    def test_missing_file_raises(self, tmp_path):
        with pytest.raises(AssertionError):
            read_raster(tmp_path / "missing.tif")

    def test_default_options(self):
        opts = get_geotif_options()
        assert opts["driver"] == "GTiff"
        assert opts["dtype"] == "float32"
        assert opts["compress"] == "LZW"
        assert opts["nodata"] == -9999
        opts["nodata"] = 0
        assert get_geotif_options()["nodata"] == -9999

    def test_pil_can_read_our_geotiff(self, tmp_path, rng):
        arr = rng.uniform(0, 5, size=(16, 16)).astype(np.float32)
        fp = tmp_path / "pil.tif"
        write_raster(fp, arr, self._profile(arr))
        np.testing.assert_array_equal(np.array(Image.open(fp)), arr)


class TestNonNorthUpTransforms:
    def test_south_up_rectilinear_roundtrip(self, tmp_path):
        # South-up (positive y scale) cannot ride PixelScale+Tiepoint; it
        # must round-trip exactly via ModelTransformation, not flip.
        arr = np.arange(12, dtype=np.float32).reshape(3, 4)
        transform = Affine(30.0, 0.0, 500000.0, 0.0, 30.0, 4000000.0)
        profile = {
            "dtype": "float32", "nodata": None, "width": 4, "height": 3,
            "count": 1, "crs": CRS(32633), "transform": transform,
            "compress": "LZW",
        }
        fp = tmp_path / "southup.tif"
        write_raster(fp, arr, profile)
        got, _, got_profile = read_raster(fp)
        np.testing.assert_array_equal(got, arr)
        assert got_profile["transform"].almost_equals(transform), got_profile["transform"]


class TestStreamingWriter:
    def test_streamed_equals_monolithic(self, tmp_path, rng):
        from floodsr_tpu.io.geotiff import open_raster_stream

        arr = rng.uniform(0, 5, size=(70, 48)).astype(np.float32)
        profile = {
            "dtype": "float32", "nodata": -9999.0, "width": 48, "height": 70,
            "count": 1, "crs": CRS(32633),
            "transform": from_origin(500000.0, 4000000.0, 30.0, 30.0),
            "compress": "LZW",
        }
        mono_fp = tmp_path / "mono.tif"
        stream_fp = tmp_path / "stream.tif"
        write_raster(mono_fp, arr, profile)
        with open_raster_stream(stream_fp, profile) as writer:
            for r in range(0, 70, 13):  # uneven bands vs strip size
                writer.write_rows(arr[r : r + 13])
        a, na, pa = read_raster(mono_fp)
        b, nb, pb = read_raster(stream_fp)
        np.testing.assert_array_equal(a, b)
        assert na == nb
        assert pa["transform"].almost_equals(pb["transform"])
        assert pa["crs"] == pb["crs"]
        assert pa["compress"] == pb["compress"] == "LZW"

    def test_streamed_uncompressed_and_pil_crosscheck(self, tmp_path, rng):
        from PIL import Image

        from floodsr_tpu.io.geotiff import open_raster_stream

        arr = rng.uniform(0, 5, size=(33, 64)).astype(np.float32)
        profile = {
            "dtype": "float32", "nodata": None, "width": 64, "height": 33,
            "count": 1, "crs": CRS(32633),
            "transform": from_origin(0.0, 33.0, 1.0, 1.0), "compress": None,
        }
        fp = tmp_path / "s.tif"
        with open_raster_stream(fp, profile) as writer:
            writer.write_rows(arr[:20])
            writer.write_rows(arr[20:])
        got = np.asarray(Image.open(fp))
        np.testing.assert_array_equal(got, arr)

    def test_row_count_mismatch_raises(self, tmp_path):
        from floodsr_tpu.io.geotiff import open_raster_stream

        profile = {
            "dtype": "float32", "nodata": None, "width": 8, "height": 10,
            "count": 1, "crs": None, "transform": None, "compress": "LZW",
        }
        writer = open_raster_stream(tmp_path / "bad.tif", profile)
        writer.write_rows(np.zeros((4, 8), np.float32))
        with pytest.raises(AssertionError):
            writer.close()


class TestTiledLayout:
    def test_tiled_encode_decode_roundtrip(self, rng):
        arr = rng.normal(300, 20, (100, 130)).astype(np.float32)
        blob = encode_tiff(arr, tile=(32, 48))
        out, tags = decode_tiff(blob)
        np.testing.assert_array_equal(out, arr)

    def test_tiled_lzw_pil_readable(self, rng):
        arr = (rng.random((64, 80)) * 1000).astype(np.uint16)
        blob = encode_tiff(arr, tile=(32, 32))
        pil = np.asarray(Image.open(_io.BytesIO(blob)))
        np.testing.assert_array_equal(pil, arr)

    def test_bad_tile_dims_raise(self, rng):
        with pytest.raises(ValueError, match="multiples of 16"):
            encode_tiff(np.zeros((32, 32), np.float32), tile=(20, 32))


class TestWindowReader:
    def _write(self, tmp_path, rng, **kw):
        from floodsr_tpu.io.geotiff import _geo_tags_for

        arr = rng.normal(300.0, 25.0, (512, 512)).astype(np.float32)
        blob = encode_tiff(arr, **kw)
        fp = tmp_path / "asset.tif"
        fp.write_bytes(blob)
        return arr, fp, len(blob)

    def test_window_matches_full_decode_tiled(self, tmp_path, rng):
        from floodsr_tpu.io.tiff_window import FileByteSource, TiffWindowReader

        arr, fp, total = self._write(tmp_path, rng, tile=(128, 128))
        reader = TiffWindowReader(FileByteSource(fp))
        win = reader.read_window(100, 200, 150, 180)
        np.testing.assert_array_equal(win, arr[100:250, 200:380])
        # one tile row x two tile cols of data, not the whole asset
        assert reader.bytes_fetched < 0.6 * total

    def test_window_matches_full_decode_striped(self, tmp_path, rng):
        from floodsr_tpu.io.tiff_window import FileByteSource, TiffWindowReader

        arr, fp, total = self._write(tmp_path, rng, rows_per_strip=32)
        reader = TiffWindowReader(FileByteSource(fp))
        win = reader.read_window(64, 0, 32, 512)
        np.testing.assert_array_equal(win, arr[64:96])
        assert reader.bytes_fetched < 0.5 * total

    def test_full_read_equals_decode(self, tmp_path, rng):
        from floodsr_tpu.io.tiff_window import FileByteSource, TiffWindowReader

        arr, fp, _ = self._write(tmp_path, rng, tile=(128, 128))
        reader = TiffWindowReader(FileByteSource(fp))
        np.testing.assert_array_equal(reader.read_full(), arr)

    def test_out_of_bounds_window_raises(self, tmp_path, rng):
        from floodsr_tpu.io.tiff_window import FileByteSource, TiffWindowReader

        _, fp, _ = self._write(tmp_path, rng, tile=(128, 128))
        reader = TiffWindowReader(FileByteSource(fp))
        with pytest.raises(ValueError, match="does not intersect"):
            reader.read_window(600, 0, 10, 10)

    def test_range_transport_source_handles_full_body(self, tmp_path, rng):
        """A range-blind (HTTP 200) server still yields correct windows."""
        from floodsr_tpu.io.tiff_window import (
            RangeTransportByteSource,
            TiffWindowReader,
        )

        arr, fp, _ = self._write(tmp_path, rng, tile=(128, 128))
        blob = fp.read_bytes()

        def transport(url, data, headers):
            assert "Range" in headers
            return blob  # ignores the range — full body

        reader = TiffWindowReader(
            RangeTransportByteSource("https://x/asset.tif", transport)
        )
        win = reader.read_window(0, 0, 64, 64)
        np.testing.assert_array_equal(win, arr[:64, :64])


class TestBigTiff:
    def test_forced_bigtiff_roundtrip(self, rng):
        arr = rng.normal(300, 20, (70, 90)).astype(np.float32)
        blob = encode_tiff(arr, bigtiff=True)
        assert blob[2:4] == b"\x2b\x00"  # magic 43
        out, tags = decode_tiff(blob)
        np.testing.assert_array_equal(out, arr)

    def test_bigtiff_geotiff_roundtrip(self, tmp_path, rng):
        """Full GeoTIFF profile survives a BigTIFF container."""
        from floodsr_tpu.io.geotiff import read_raster_header

        arr = rng.normal(300, 20, (40, 50)).astype(np.float32)
        profile = {
            "height": 40, "width": 50, "count": 1, "dtype": "float32",
            "crs": "EPSG:32633", "nodata": -9999.0,
            "transform": from_origin(500000.0, 4100000.0, 2.0, 2.0),
            "compress": "LZW",
        }
        fp = tmp_path / "big.tif"
        write_raster(fp, arr, profile, bigtiff=True)
        back, nodata, prof = read_raster(fp)
        np.testing.assert_array_equal(back, arr)
        assert nodata == -9999.0
        assert prof["crs"].epsg == 32633
        header = read_raster_header(fp)
        assert header["height"] == 40 and header["width"] == 50

    def test_stream_writer_bigtiff_roundtrip(self, tmp_path, rng):
        from floodsr_tpu.io.tiff import StripStreamWriter

        arr = rng.normal(0, 1, (96, 64)).astype(np.float32)
        fp = tmp_path / "stream_big.tif"
        with StripStreamWriter(
            fp, 96, 64, np.float32, rows_per_strip=16, bigtiff=True
        ) as w:
            for r in range(0, 96, 24):
                w.write_rows(arr[r : r + 24])
        out, _ = decode_tiff(fp.read_bytes())
        np.testing.assert_array_equal(out, arr)

    def test_stream_writer_auto_switches_on_projected_size(self, tmp_path):
        from floodsr_tpu.io.tiff import StripStreamWriter

        w = StripStreamWriter(tmp_path / "huge.tif", 40000, 30000, np.float32)
        try:
            assert w._bigtiff is True  # 4.8 GB projected > classic limit
        finally:
            w._handle.close()
        s = StripStreamWriter(tmp_path / "small.tif", 100, 100, np.float32)
        try:
            assert s._bigtiff is False
        finally:
            s._handle.close()

    def test_stream_writer_classic_overflow_raises_cleanly(
        self, tmp_path, rng, monkeypatch
    ):
        """Offsets past the classic 32-bit limit fail as a clean ValueError.

        The check covers the IFD and its out-of-line payload offsets (which
        land AFTER the strip data), not just the last strip — shrunk limit
        stands in for a real 4 GiB file. The failure must be an exception,
        never a half-written IFD or struct.error.
        """
        from floodsr_tpu.io import tiff as tiff_mod
        from floodsr_tpu.io.tiff import StripStreamWriter

        arr = rng.normal(0, 1, (64, 64)).astype(np.float32)
        fp = tmp_path / "overflow.tif"
        # Strip data fits under the shrunk limit; the trailing IFD does not.
        w = StripStreamWriter(fp, 64, 64, np.float32, bigtiff=False)
        w.write_rows(arr)
        monkeypatch.setattr(
            tiff_mod, "_MAX_CLASSIC_OFFSET", w._handle.tell() + 8
        )
        with pytest.raises(ValueError, match="classic TIFF"):
            w.close()
        assert w._handle.closed

    def test_stream_writer_auto_heuristic_carries_lzw_expansion(self, tmp_path):
        """LZW can EXPAND incompressible data; the auto-BigTIFF bound must
        carry that factor (GDAL BIGTIFF=IF_SAFER behavior) so a ~3.5 GB
        uncompressed scene of incompressible data cannot overflow classic."""
        from floodsr_tpu.io.tiff import COMPRESSION_NONE, StripStreamWriter

        # ~3.44 GiB uncompressed: under the classic limit alone, over it
        # with the 1.5x LZW expansion bound.
        h, w_ = 34000, 27160
        w = StripStreamWriter(tmp_path / "mid.tif", h, w_, np.float32)
        try:
            assert w._bigtiff is True
        finally:
            w._handle.close()
        u = StripStreamWriter(
            tmp_path / "mid_u.tif", h, w_, np.float32,
            compression=COMPRESSION_NONE,
        )
        try:
            assert u._bigtiff is False  # uncompressed size is exact
        finally:
            u._handle.close()

    def test_sparse_over_4gib_offsets_window_read(self, tmp_path, rng):
        """Chunks relocated past 4 GiB (sparse file) read back correctly —
        the 8-byte-offset path is exercised with real >2^32 values."""
        import struct as _struct

        from floodsr_tpu.io.geotiff import open_raster_window_reader
        from floodsr_tpu.io.tiff import (
            COMPRESSION_NONE,
            TAG_STRIP_OFFSETS,
            _ifd_size,
            _serialize_ifd,
            _sample_format_for,
        )
        from floodsr_tpu.io import tiff as _t

        arr = rng.normal(5.0, 1.0, (64, 64)).astype(np.float32)
        far = 5 * 1024**3  # 5 GiB
        tags = [
            (_t.TAG_IMAGE_WIDTH, 4, (64,)),
            (_t.TAG_IMAGE_LENGTH, 4, (64,)),
            (_t.TAG_BITS_PER_SAMPLE, 3, (32,)),
            (_t.TAG_COMPRESSION, 3, (COMPRESSION_NONE,)),
            (_t.TAG_PHOTOMETRIC, 3, (1,)),
            (TAG_STRIP_OFFSETS, 16, (far,)),
            (_t.TAG_SAMPLES_PER_PIXEL, 3, (1,)),
            (_t.TAG_ROWS_PER_STRIP, 4, (64,)),
            (_t.TAG_STRIP_BYTE_COUNTS, 16, (arr.nbytes,)),
            (_t.TAG_PLANAR_CONFIG, 3, (1,)),
            (_t.TAG_SAMPLE_FORMAT, 3, (_sample_format_for(arr.dtype),)),
        ]
        tags.sort(key=lambda t: t[0])
        fp = tmp_path / "sparse_big.tif"
        with open(fp, "wb") as fh:
            fh.write(_struct.pack("<2sHHHQ", b"II", 43, 8, 0, 16))
            ifd, payloads = _serialize_ifd(
                tags, bigtiff=True, payload_base=16 + _ifd_size(tags, True)
            )
            fh.write(ifd)
            fh.write(payloads)
            fh.seek(far)
            fh.write(arr.tobytes())
        reader, _, profile = open_raster_window_reader(fp)
        assert profile["height"] == 64
        win = reader.read_window(10, 10, 20, 20)
        np.testing.assert_array_equal(win, arr[10:30, 10:30])
        # window read never touched most of the 5 GiB address space
        assert reader.bytes_fetched < 1024**2


class TestTagAndCodecEdgeCases:
    def test_rational_extra_tag_roundtrips(self, tmp_path, rng):
        """RATIONAL (type 5) values are (num, den) pairs — one logical value
        packs TWO longs (count = number of rationals, not of longs)."""
        from floodsr_tpu.io.tiff import decode_tiff, encode_tiff

        arr = rng.normal(0, 1, (8, 8)).astype(np.float32)
        # XResolution / YResolution, standard TIFF rationals.
        blob = encode_tiff(arr, extra_tags=[(282, 5, ((72, 1),)), (283, 5, (300, 100))])
        out, tags = decode_tiff(blob)
        np.testing.assert_array_equal(out, arr)
        # The reader materializes rationals as computed floats.
        assert np.asarray(tags[282]).reshape(-1).tolist() == [72.0]
        assert np.asarray(tags[283]).reshape(-1).tolist() == [3.0]

    def test_corrupt_lzw_first_code_raises_valueerror(self):
        """A first code after CLEAR beyond the table must raise the codec's
        own ValueError, not an IndexError from deep inside."""
        from floodsr_tpu.io.tiff import lzw_decode

        # 9-bit codes, MSB-first: CLEAR(256) then 400 (> 257, undefined).
        bits = "100000000" + format(400, "09b")
        bits += "0" * (-len(bits) % 8)
        data = int(bits, 2).to_bytes(len(bits) // 8, "big")
        with pytest.raises(ValueError, match="corrupt LZW"):
            lzw_decode(data)


class TestSparseChunks:
    """GDAL SPARSE_OK convention: a chunk with byte count 0 holds no data
    and reads back as zeros (real HRDEM mosaic COGs carry sparse nodata
    tiles over ocean). Reference counterpart: GDAL's sparse-block reads
    under ``floodsr/dem_sources/hrdem_stac.py:117-219``."""

    @staticmethod
    def _write_classic(fp, arr, chunk_blobs, layout_tags):
        """Craft a classic striped/tiled TIFF where blobs[i] is None for a
        sparse chunk (offset 0, count 0)."""
        import struct as _struct

        from floodsr_tpu.io import tiff as _t
        from floodsr_tpu.io.tiff import _ifd_size, _sample_format_for, _serialize_ifd

        offsets, counts, payload = [], [], b""
        for blob in chunk_blobs:
            if blob is None:
                offsets.append(0)
                counts.append(0)
            else:
                offsets.append(len(payload))  # relative; rebased below
                counts.append(len(blob))
                payload += blob
        tags = [
            (_t.TAG_IMAGE_WIDTH, 4, (arr.shape[1],)),
            (_t.TAG_IMAGE_LENGTH, 4, (arr.shape[0],)),
            (_t.TAG_BITS_PER_SAMPLE, 3, (32,)),
            (_t.TAG_COMPRESSION, 3, (_t.COMPRESSION_NONE,)),
            (_t.TAG_PHOTOMETRIC, 3, (1,)),
            (_t.TAG_SAMPLES_PER_PIXEL, 3, (1,)),
            (_t.TAG_PLANAR_CONFIG, 3, (1,)),
            (_t.TAG_SAMPLE_FORMAT, 3, (_sample_format_for(arr.dtype),)),
        ] + layout_tags(offsets, counts)
        # Two serialization passes: sizes are value-independent, so pass 1
        # yields the data offset and pass 2 writes rebased chunk offsets.
        tags.sort(key=lambda t: t[0])
        payload_base = 8 + _ifd_size(tags, False)
        probe_ifd, probe_payloads = _serialize_ifd(
            tags, bigtiff=False, payload_base=payload_base
        )
        data0 = payload_base + len(probe_payloads)
        rebased = [o + data0 if c else 0 for o, c in zip(offsets, counts)]
        tags = [
            (t, ft, tuple(rebased) if t in (_t.TAG_STRIP_OFFSETS, _t.TAG_TILE_OFFSETS) else v)
            for (t, ft, v) in tags
        ]
        ifd, payloads = _serialize_ifd(tags, bigtiff=False, payload_base=payload_base)
        with open(fp, "wb") as fh:
            fh.write(_struct.pack("<2sHI", b"II", 42, 8))
            fh.write(ifd)
            fh.write(payloads)
            fh.write(payload)
        return fp

    def test_sparse_strip_reads_as_zeros(self, tmp_path, rng):
        from floodsr_tpu.io import tiff as _t
        from floodsr_tpu.io.geotiff import open_raster_window_reader
        from floodsr_tpu.io.tiff import decode_tiff

        arr = rng.normal(3.0, 1.0, (64, 64)).astype(np.float32)
        expected = arr.copy()
        expected[32:] = 0.0
        fp = self._write_classic(
            tmp_path / "sparse_strips.tif",
            arr,
            [arr[:32].tobytes(), None],
            lambda offs, cnts: [
                (_t.TAG_STRIP_OFFSETS, 4, tuple(offs)),
                (_t.TAG_ROWS_PER_STRIP, 4, (32,)),
                (_t.TAG_STRIP_BYTE_COUNTS, 4, tuple(cnts)),
            ],
        )
        out, _ = decode_tiff(fp.read_bytes())
        np.testing.assert_array_equal(out, expected)
        reader, _, _ = open_raster_window_reader(fp)
        win = reader.read_window(16, 8, 32, 16)  # crosses the sparse seam
        np.testing.assert_array_equal(win, expected[16:48, 8:24])

    def test_sparse_tile_reads_as_zeros_and_fetches_nothing(self, tmp_path, rng):
        from floodsr_tpu.io import tiff as _t
        from floodsr_tpu.io.geotiff import open_raster_window_reader
        from floodsr_tpu.io.tiff import decode_tiff

        arr = rng.normal(3.0, 1.0, (32, 32)).astype(np.float32)
        th = tw = 16
        blobs = []
        for ty in range(2):
            for tx in range(2):
                if (ty, tx) == (1, 1):
                    blobs.append(None)  # sparse tile
                else:
                    blobs.append(
                        np.ascontiguousarray(
                            arr[ty * th : (ty + 1) * th, tx * tw : (tx + 1) * tw]
                        ).tobytes()
                    )
        expected = arr.copy()
        expected[16:, 16:] = 0.0
        fp = self._write_classic(
            tmp_path / "sparse_tiles.tif",
            arr,
            blobs,
            lambda offs, cnts: [
                (_t.TAG_TILE_WIDTH, 4, (tw,)),
                (_t.TAG_TILE_LENGTH, 4, (th,)),
                (_t.TAG_TILE_OFFSETS, 4, tuple(offs)),
                (_t.TAG_TILE_BYTE_COUNTS, 4, tuple(cnts)),
            ],
        )
        out, _ = decode_tiff(fp.read_bytes())
        np.testing.assert_array_equal(out, expected)
        # Window entirely inside the sparse tile: zeros, zero extra fetches.
        reader, _, _ = open_raster_window_reader(fp)
        fetched_after_header = reader.bytes_fetched
        win = reader.read_window(20, 20, 8, 8)
        np.testing.assert_array_equal(win, np.zeros((8, 8), np.float32))
        assert reader.bytes_fetched == fetched_after_header


class TestZstd:
    """ZSTD TIFF chunks (GDAL COMPRESS=ZSTD, tag 50000) via system libzstd.

    The reference inherits this codec from GDAL (reference:
    ``floodsr/io/rasterio_io.py:4-14``); modern cloud COGs — including DEM
    mosaics of the kind the HRDEM fetcher reads — commonly use it.
    """

    @pytest.fixture(autouse=True)
    def _require_libzstd(self):
        from floodsr_tpu.io import zstd_codec

        if not zstd_codec.available():
            pytest.skip("libzstd not present on this system")

    def test_codec_roundtrip_and_corrupt(self, rng):
        from floodsr_tpu.io import zstd_codec

        data = rng.integers(0, 256, 100000, dtype=np.uint8).tobytes()
        enc = zstd_codec.compress(data)
        assert zstd_codec.decompress(enc, len(data)) == data
        # Magic check: a zstd frame starts with 28 B5 2F FD.
        assert enc[:4] == bytes.fromhex("28b52ffd")
        with pytest.raises(ValueError):
            zstd_codec.decompress(b"not a zstd frame", 100)
        # A frame larger than the declared chunk size must error, not truncate.
        with pytest.raises(ValueError):
            zstd_codec.decompress(enc, len(data) // 2)

    def test_tiff_roundtrip_float32(self, rng):
        from floodsr_tpu.io.tiff import COMPRESSION_ZSTD

        arr = rng.normal(size=(70, 53)).astype(np.float32)
        data = encode_tiff(arr, compression=COMPRESSION_ZSTD)
        got, tags = decode_tiff(data)
        np.testing.assert_array_equal(got, arr)
        assert tags[259] == COMPRESSION_ZSTD  # single values are unwrapped

    def test_tiff_roundtrip_integer_predictor(self, rng):
        from floodsr_tpu.io.tiff import COMPRESSION_ZSTD

        arr = rng.integers(-500, 4000, size=(40, 81)).astype(np.int16)
        data = encode_tiff(arr, compression=COMPRESSION_ZSTD)
        got, _ = decode_tiff(data)
        np.testing.assert_array_equal(got, arr)

    def test_window_reader_tiled_zstd(self, rng):
        from floodsr_tpu.io.tiff import COMPRESSION_ZSTD
        from floodsr_tpu.io.tiff_window import MemoryByteSource, TiffWindowReader

        arr = rng.normal(size=(96, 128)).astype(np.float32)
        data = encode_tiff(arr, compression=COMPRESSION_ZSTD, tile=(32, 32))
        reader = TiffWindowReader(MemoryByteSource(data))
        got = reader.read_window(17, 40, 43, 30)
        np.testing.assert_array_equal(got, arr[17:60, 40:70])

    def test_geotiff_profile_compress_string(self, tmp_path, rng):
        arr = rng.normal(size=(24, 31)).astype(np.float32)
        profile = dict(get_geotif_options())
        profile.update(
            height=24, width=31, count=1, dtype="float32",
            crs="EPSG:32633", transform=from_origin(0, 24 * 2.0, 2.0, 2.0),
            compress="ZSTD",
        )
        fp = tmp_path / "z.tif"
        write_raster(fp, arr, profile)
        got, _nodata, prof = read_raster(fp)
        np.testing.assert_array_equal(got, arr)
        assert prof["compress"] == "ZSTD"

    def test_missing_library_error_names_zstd(self, rng, monkeypatch):
        from floodsr_tpu.io import zstd_codec
        from floodsr_tpu.io.tiff import COMPRESSION_ZSTD

        arr = rng.normal(size=(8, 8)).astype(np.float32)
        data = encode_tiff(arr, compression=COMPRESSION_ZSTD)
        monkeypatch.setattr(zstd_codec, "available", lambda: False)
        with pytest.raises(ValueError, match="libzstd"):
            decode_tiff(data)
        with pytest.raises(ValueError, match="libzstd"):
            encode_tiff(arr, compression=COMPRESSION_ZSTD)


class TestWindowReaderDifferential:
    """Randomized differential: TiffWindowReader ≡ decode_tiff + numpy slice.

    The windowed reader is the path real remote COGs take (HRDEM fetch);
    this pins it to the in-memory codec across layouts × compressions ×
    dtypes × window geometries, the way the LZW fuzz test pins the native
    codec to the Python twin.
    """

    def test_random_layouts_and_windows(self):
        from floodsr_tpu.io import zstd_codec
        from floodsr_tpu.io.tiff import (
            COMPRESSION_DEFLATE_ADOBE,
            COMPRESSION_LZW,
            COMPRESSION_NONE,
            COMPRESSION_ZSTD,
        )
        from floodsr_tpu.io.tiff_window import MemoryByteSource, TiffWindowReader

        rng = np.random.default_rng(20260818)
        compressions = [COMPRESSION_NONE, COMPRESSION_LZW, COMPRESSION_DEFLATE_ADOBE]
        if zstd_codec.available():
            compressions.append(COMPRESSION_ZSTD)
        dtypes = [np.float32, np.int16, np.uint8, np.float64]
        for trial in range(40):
            h = int(rng.integers(1, 180))
            w = int(rng.integers(1, 180))
            dtype = dtypes[trial % len(dtypes)]
            if np.issubdtype(dtype, np.floating):
                arr = rng.normal(size=(h, w)).astype(dtype)
            else:
                info = np.iinfo(dtype)
                arr = rng.integers(info.min, info.max, size=(h, w)).astype(dtype)
            comp = compressions[trial % len(compressions)]
            if trial % 2:
                kw = {"tile": (16 * int(rng.integers(1, 4)),) * 2}
            else:
                kw = {"rows_per_strip": int(rng.integers(1, h + 1))}
            if trial % 5 == 0:
                kw["bigtiff"] = True  # 8-byte-offset container path
            if trial % 3 == 0 and comp != COMPRESSION_NONE:
                # spec-valid predictor for the sample kind
                kw["predictor"] = 3 if np.issubdtype(dtype, np.floating) else 2
            data = encode_tiff(arr, compression=comp, **kw)

            full, _ = decode_tiff(data)
            np.testing.assert_array_equal(full, arr, err_msg=f"trial {trial} full")

            reader = TiffWindowReader(MemoryByteSource(data))
            for _ in range(4):
                r0 = int(rng.integers(0, h))
                c0 = int(rng.integers(0, w))
                rh = int(rng.integers(1, h - r0 + 1))
                cw = int(rng.integers(1, w - c0 + 1))
                got = reader.read_window(r0, c0, rh, cw)
                np.testing.assert_array_equal(
                    got,
                    arr[r0 : r0 + rh, c0 : c0 + cw],
                    err_msg=f"trial {trial} window {(r0, c0, rh, cw)} "
                    f"comp={comp} kw={kw}",
                )


class TestProfilePredictor:
    """`predictor` rides the profile surface like `compress` does.

    Read: recorded when a file carries one (omitted for 1). Write: applied
    when valid for the output dtype; silently dropped on a kind mismatch —
    profiles are commonly copied from an input of a different dtype (int
    DEM profile → float depth output), and GDAL treats creation options
    the same way.
    """

    def test_roundtrip_through_profile(self, rng, tmp_path):
        from floodsr_tpu.io.geotiff import read_raster, write_raster

        arr = rng.normal(size=(40, 50)).astype(np.float32).cumsum(axis=1)
        src = tmp_path / "p3.tif"
        src.write_bytes(encode_tiff(arr, compression=5, predictor=3))
        got, _, prof = read_raster(src)
        np.testing.assert_array_equal(got, arr)
        assert prof["predictor"] == 3
        prof["crs"] = "EPSG:32633"
        prof["transform"] = (2.0, 0.0, 0.0, 0.0, -2.0, 0.0)
        dst = tmp_path / "copy.tif"
        write_raster(dst, arr, prof)
        got2, _, prof2 = read_raster(dst)
        np.testing.assert_array_equal(got2, arr)
        assert prof2["predictor"] == 3

    def test_kind_mismatch_dropped_not_fatal(self, rng, tmp_path):
        from floodsr_tpu.io.geotiff import read_raster, write_raster

        # int-predictor profile reused for a float output: predictor dropped
        prof = {
            "dtype": "float32", "nodata": None, "crs": "EPSG:32633",
            "transform": (2.0, 0.0, 0.0, 0.0, -2.0, 0.0),
            "compress": "LZW", "predictor": 2,
            "height": 12, "width": 15,
        }
        arr = rng.normal(size=(12, 15)).astype(np.float32)
        dst = tmp_path / "sanitized.tif"
        write_raster(dst, arr, prof)
        got, _, prof2 = read_raster(dst)
        np.testing.assert_array_equal(got, arr)
        assert "predictor" not in prof2

    def test_default_writes_unchanged(self, rng, tmp_path):
        from floodsr_tpu.io.geotiff import read_raster, write_raster

        prof = {
            "dtype": "float32", "nodata": -9999.0, "crs": "EPSG:32633",
            "transform": (2.0, 0.0, 0.0, 0.0, -2.0, 0.0),
            "compress": "LZW", "height": 9, "width": 9,
        }
        arr = rng.normal(size=(9, 9)).astype(np.float32)
        fp = tmp_path / "plain.tif"
        write_raster(fp, arr, prof)
        _, _, prof2 = read_raster(fp)
        assert "predictor" not in prof2  # float default remains predictor-free


class TestLzwEndgameEarlyChange:
    """Encoder endgame early-change (found by the differential fuzz).

    When the FINAL data code lands the decoder's table on 2^width - 1
    entries, the decoder widens before reading EOI; the encoder must emit
    EOI at the new width. The pre-fix encoder emitted it at the old width:
    depending on byte alignment the decoder then either read a spurious
    code before EOI (junk bytes, silently truncated by the chunk reader)
    or hit end-of-stream without ever seeing EOI. A strict decoder that
    requires EOI catches both shapes.
    """

    @staticmethod
    def _strict_decode(data: bytes) -> bytes:
        """Reference decoder that REQUIRES the EOI code (no exhaustion exit)."""
        out = bytearray()
        nbits = len(data) * 8
        bitpos = 0
        width = 9
        base = [bytes([i]) for i in range(256)] + [b"", b""]
        table = list(base)
        prev = None
        while True:
            if bitpos + width > nbits:
                raise ValueError("stream ended without EOI")
            byte_idx = bitpos >> 3
            chunk = int.from_bytes(data[byte_idx : byte_idx + 4].ljust(4, b"\0"), "big")
            code = (chunk >> (32 - (bitpos & 7) - width)) & ((1 << width) - 1)
            bitpos += width
            if code == 257:  # EOI
                return bytes(out)
            if code == 256:  # Clear
                table = list(base)
                width = 9
                prev = None
                continue
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError(f"code {code} beyond table {len(table)}")
            out += entry
            prev = entry
            if len(table) == (1 << width) - 1 and width < 12:
                width += 1

    @staticmethod
    def _de_bruijn_prefix(n: int) -> bytes:
        """First ``n`` bytes of a B(256, 2) de Bruijn walk: all adjacent
        byte pairs distinct, so every byte adds one encoder table entry —
        lets a test land the final code on any exact table count."""
        # Martin's algorithm: always take the LARGEST unused out-edge —
        # proven to trace a full Eulerian (de Bruijn) walk, so any prefix
        # has all-distinct adjacent pairs.
        out = bytearray([0])
        used = set()
        while len(out) < n:
            a = out[-1]
            for b in range(255, -1, -1):
                if (a, b) not in used:
                    used.add((a, b))
                    out.append(b)
                    break
            else:
                raise AssertionError("walk exhausted (n too large)")
        return bytes(out)

    def test_width_change_boundaries_strict(self):
        from floodsr_tpu.io import native

        # Boundary sizes: final next_code == 2^w - 1 for w = 9, 10, 11
        # (n = 254 / 766 / 1790 with all-fresh pairs), swept ±2.
        sizes = []
        for center in (254, 766, 1790):
            sizes += [center - 2, center - 1, center, center + 1, center + 2]
        for n in sizes:
            data = self._de_bruijn_prefix(n)
            enc = lzw_encode(data)
            assert self._strict_decode(enc) == data, f"n={n}"
            assert lzw_decode(enc) == data, f"n={n} (lenient)"
            if native.available():
                assert native.lzw_encode(data) == enc, f"n={n} (native enc)"
                assert native.lzw_decode(enc, n) == data, f"n={n} (native dec)"

    def test_legacy_malformed_stream_still_reads(self):
        """Files written by the pre-fix encoder must keep decoding.

        The chunk reader falls back from the strict native decoder to the
        lenient Python one and truncates to the expected size.
        """
        from floodsr_tpu.io import native
        from floodsr_tpu.io.tiff import _decompress_chunk

        data = self._de_bruijn_prefix(254)

        # Re-create the pre-fix stream: EOI at the stale width.
        out = bytearray()
        bitbuf = 0
        bitcnt = 0

        def emit(code, width):
            nonlocal bitbuf, bitcnt
            bitbuf = (bitbuf << width) | code
            bitcnt += width
            while bitcnt >= 8:
                bitcnt -= 8
                out.append((bitbuf >> bitcnt) & 0xFF)

        table = {}
        next_code = 258
        width = 9
        emit(256, width)
        w = -1
        for b in data:
            if w < 0:
                w = b
                continue
            key = (w, b)
            code = table.get(key)
            if code is not None:
                w = code
                continue
            emit(w, width)
            table[key] = next_code
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
            w = b
        emit(w, width)
        emit(257, width)  # pre-fix: EOI at the stale width
        if bitcnt:
            out.append((bitbuf << (8 - bitcnt)) & 0xFF)
        legacy = bytes(out)

        assert lzw_encode(data) != legacy  # the fixed encoder differs
        got = _decompress_chunk(legacy, 5, len(data))[: len(data)]
        assert got == data
        if native.available():
            # and the strict native path alone may reject it — that's the
            # reason the fallback exists.
            try:
                native.lzw_decode(legacy, len(data))
            except ValueError:
                pass


class TestNativeStripBatch:
    """Round-4 native fast paths: strip-batch codec + predictor transforms.

    The C++ batch entry points (``fsr_lzw_{encode,decode}_strips``,
    ``fsr_predictor{2,3}_{undo,apply}``) fold the per-strip Python loop into
    one call — the reference delegates this work to GDAL's C++ core
    (reference ``floodsr/preprocessing.py:247-282``). Every test pins the
    native result against the pure-Python behavioral twin.
    """

    @pytest.fixture(autouse=True)
    def _need_native(self):
        if not (native.available() and native.strips_available()):
            pytest.skip("native strip codec unavailable")

    def _force_python(self):
        import contextlib

        @contextlib.contextmanager
        def ctx():
            orig = native._lib._fsr_has_strips
            native._lib._fsr_has_strips = False
            try:
                yield
            finally:
                native._lib._fsr_has_strips = orig

        return ctx()

    def test_run_fast_path_stream_identical_to_python_twin(self):
        # Run-heavy payloads drive the encoder's byte-run fast path through
        # chain growth, table resets mid-run, tails, and EOF-in-run.
        rng = np.random.default_rng(11)
        noise = rng.integers(0, 256, 6000).astype(np.uint8).tobytes()
        payloads = [
            b"\x00" * 9000,
            bytes([5]) * 3 + noise[:100] + bytes([5]) * 5000,
            noise + b"\x00" * 8000 + noise[:500] + b"\xff" * 3000,
            (np.clip(rng.gamma(0.6, 0.8, (16, 512)), 0, 5)
             * (rng.random((16, 512)) > 0.6)).astype(np.float32).tobytes(),
            b"\x00" * 7,   # run shorter than a cycle
            b"A" * 2,      # below the fast-path trigger
        ]
        for data in payloads:
            enc = native.lzw_encode(data)
            assert enc == lzw_encode(data)  # byte-identical stream
            assert native.lzw_decode(enc, len(data)) == data

    def test_stream_writer_batch_file_bytes_identical(self, tmp_path):
        rng = np.random.default_rng(7)
        for arr, pred in [
            ((rng.gamma(0.5, 1, (300, 257)) * (rng.random((300, 257)) > 0.5))
             .astype(np.float32), None),
            (rng.integers(0, 50000, (300, 257)).astype(np.uint16), 2),
            (np.cumsum(rng.normal(0, 0.01, (300, 257)), axis=1)
             .astype(np.float32), 3),
        ]:
            fa, fb = tmp_path / "a.tif", tmp_path / "b.tif"
            for fp, force in ((fa, False), (fb, True)):
                ctx = self._force_python() if force else contextlib.nullcontext()
                with ctx:
                    w = StripStreamWriter(
                        fp, arr.shape[0], arr.shape[1], arr.dtype, predictor=pred
                    )
                    w.write_rows(arr[:111])   # uneven bands: pending carry
                    w.write_rows(arr[111:118])
                    w.write_rows(arr[118:])
                    w.close()
            assert fa.read_bytes() == fb.read_bytes()
            dec, _ = decode_tiff(fa.read_bytes())
            np.testing.assert_array_equal(dec, arr)

    def test_decode_strips_matches_python_loop(self):
        rng = np.random.default_rng(5)
        for arr, pred in [
            (rng.normal(0, 1, (123, 77)).astype(np.float32), None),
            (rng.integers(0, 60000, (123, 77)).astype(np.uint16), 2),
            (np.cumsum(rng.normal(0, 0.01, (123, 77)), axis=0)
             .astype(np.float32), 3),
        ]:
            blob = encode_tiff(arr, predictor=pred)
            got_native, _ = decode_tiff(blob)
            with self._force_python():
                got_py, _ = decode_tiff(blob)
            np.testing.assert_array_equal(got_native, got_py)
            np.testing.assert_array_equal(got_native, arr)

    def test_decode_strips_sparse_zero_count(self):
        # A zero byte count marks a sparse strip (GDAL SPARSE_OK): the
        # native batch path must zero-fill it, same as the Python loop.
        arr = np.ones((64, 32), np.float32)
        blob = bytearray(encode_tiff(arr, rows_per_strip=16))
        page = _read_ifd(bytes(blob), "II")
        assert len(page.chunk_offsets) == 4
        # zero out the second strip's byte count in the IFD
        import struct as _struct
        (ifd_off,) = _struct.unpack_from("<I", blob, 4)
        (n_entries,) = _struct.unpack_from("<H", blob, ifd_off)
        for k in range(n_entries):
            pos = ifd_off + 2 + 12 * k
            tag, ftype, count = _struct.unpack_from("<HHI", blob, pos)
            if tag == TAG_STRIP_BYTE_COUNTS:
                (arr_off,) = _struct.unpack_from("<I", blob, pos + 8)
                _struct.pack_into("<I", blob, arr_off + 4, 0)
        got, _ = decode_tiff(bytes(blob))
        expected = arr.copy()
        expected[16:32] = 0.0
        np.testing.assert_array_equal(got, expected)

    def test_native_predictor_twins(self):
        rng = np.random.default_rng(9)
        # predictor 2 (integers): apply+undo against the numpy twins
        for dt in (np.uint8, np.uint16, np.uint32):
            a = rng.integers(0, np.iinfo(dt).max, (40, 33)).astype(dt)
            buf = a.copy()
            native.predictor2_apply(buf)
            expected = _apply_predictor_encode(a[:, :, None], 2)[:, :, 0]
            np.testing.assert_array_equal(buf, expected)
            native.predictor2_undo(buf)
            np.testing.assert_array_equal(buf, a)
        # predictor 3 (floats): plane-split bytes against the numpy twin
        for dt in (np.float32, np.float64):
            a = rng.normal(0, 1, (17, 29)).astype(dt)
            planes = np.empty(
                (a.shape[0], a.shape[1] * a.dtype.itemsize), np.uint8
            )
            native.predictor3_apply(np.ascontiguousarray(a), planes)
            expected = _apply_predictor_encode(a[:, :, None], 3)
            np.testing.assert_array_equal(planes, expected)
            back = np.empty_like(a)
            native.predictor3_undo(np.ascontiguousarray(planes), back)
            np.testing.assert_array_equal(back, a)


class TestOverviewReads:
    """Internal-overview COGs: multi-page container + overview-served windows.

    Reference role: GDAL serves windowed reads from reduced-resolution
    overview levels when the target grid is coarser than the asset
    (/root/reference/floodsr/dem_sources/hrdem_stac.py:117-219).
    """

    def _cog_with_overviews(self):
        from floodsr_tpu.io.tiff import encode_tiff_overviews

        rng = np.random.default_rng(13)
        arr = np.cumsum(rng.normal(0, 1, (1024, 768)).astype(np.float32), axis=1)
        blob = encode_tiff_overviews(
            arr, overview_levels=(2, 4, 8), min_size=32, tile=(256, 256)
        )
        return arr, blob

    def test_overview_chain_parsed_and_flagged(self):
        from floodsr_tpu.io.tiff_window import MemoryByteSource, TiffWindowReader

        arr, blob = self._cog_with_overviews()
        reader = TiffWindowReader(MemoryByteSource(blob))
        assert (reader.page.height, reader.page.width) == (1024, 768)
        sizes = [(p.height, p.width) for p in reader.overview_pages()]
        assert sizes == [(512, 384), (256, 192), (128, 96)]
        assert all(int(p.tags.get(254, 0)) & 1 for p in reader.overview_pages())

    def test_overview_values_match_decimation(self):
        from floodsr_tpu.io.tiff import decimate_for_overview
        from floodsr_tpu.io.tiff_window import MemoryByteSource, TiffWindowReader

        arr, blob = self._cog_with_overviews()
        reader = TiffWindowReader(MemoryByteSource(blob))
        got, (dy, dx), (r0, c0) = reader.read_window_decimated(
            100, 60, 300, 200, max_decimation=4.2
        )
        assert (dy, dx) == (4.0, 4.0)
        want = decimate_for_overview(arr, 4)
        np.testing.assert_array_equal(
            got, want[r0 : r0 + got.shape[0], c0 : c0 + got.shape[1]]
        )
        # window covers the request: origin at/before, end at/after
        assert r0 * dy <= 100 and c0 * dx <= 60
        assert (r0 + got.shape[0]) * dy >= 400
        assert (c0 + got.shape[1]) * dx >= 260

    def test_decimation_below_two_serves_full_res(self):
        from floodsr_tpu.io.tiff_window import MemoryByteSource, TiffWindowReader

        arr, blob = self._cog_with_overviews()
        reader = TiffWindowReader(MemoryByteSource(blob))
        got, (dy, dx), (r0, c0) = reader.read_window_decimated(
            10, 10, 50, 50, max_decimation=1.9
        )
        assert (dy, dx) == (1.0, 1.0)
        np.testing.assert_array_equal(got, arr[r0:r0+got.shape[0], c0:c0+got.shape[1]])

    def test_overview_read_fetches_fewer_bytes(self):
        from floodsr_tpu.io.tiff_window import MemoryByteSource, TiffWindowReader

        arr, blob = self._cog_with_overviews()
        full = TiffWindowReader(MemoryByteSource(blob))
        full.read_window(0, 0, 1024, 768)
        ov = TiffWindowReader(MemoryByteSource(blob))
        ov.read_window_decimated(0, 0, 1024, 768, max_decimation=4.0)
        assert ov.bytes_fetched < full.bytes_fetched / 4


class TestThreadedStripCodec:
    def test_threaded_encode_decode_byte_identical(self):
        if not (native.available() and native.strips_available()):
            pytest.skip("native strip codec unavailable")
        rng = np.random.default_rng(17)
        arr = (np.clip(rng.gamma(0.6, 0.8, (700, 481)), 0, 5)
               * (rng.random((700, 481)) > 0.5)).astype(np.float32)
        src = np.ascontiguousarray(arr).reshape(-1).view(np.uint8)
        kw = dict(strip_bytes=17 * 481 * 4, n_strips=-(-700 // 17),
                  cols=481, itemsize=4, predictor=1)
        b1, c1 = native.lzw_encode_strips(src, threads=1, **kw)
        b4, c4 = native.lzw_encode_strips(src, threads=4, **kw)
        assert c1 == c4 and bytes(b1) == bytes(b4)
        blob = encode_tiff(arr)
        page = _read_ifd(blob, "II")
        ob, row = [], 0
        for _ in page.chunk_offsets:
            nr = min(page.rows_per_strip, 700 - row)
            ob.append(nr * 481 * 4)
            row += nr
        outs = []
        for threads in (1, 4):
            dst = np.empty(700 * 481 * 4, np.uint8)
            native.lzw_decode_strips(
                blob, page.chunk_offsets, page.chunk_byte_counts, ob,
                cols=481, itemsize=4, predictor=1, dst=dst, threads=threads,
            )
            outs.append(dst)
        np.testing.assert_array_equal(outs[0], outs[1])
        np.testing.assert_array_equal(
            outs[0].view(np.float32).reshape(700, 481), arr
        )
