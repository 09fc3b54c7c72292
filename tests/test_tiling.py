"""Tiling math: starts, ramps, grid construction, device mosaic."""

import numpy as np
import pytest

import jax.numpy as jnp

from floodsr_tpu.tiling import (
    build_feather_ramp,
    build_tile_starts,
    build_window_grid,
    feather_weights_for_grid,
    iter_window_origins,
    mosaic_scatter_add,
)

pytestmark = pytest.mark.unit


class TestTileStarts:
    def test_exact_cover(self):
        assert build_tile_starts(1024, 512, 512) == [0, 512]

    def test_trailing_edge_forced(self):
        starts = build_tile_starts(1000, 512, 384)
        assert starts[-1] == 1000 - 512
        assert starts[0] == 0
        assert all(b > a for a, b in zip(starts, starts[1:]))

    def test_single_tile(self):
        assert build_tile_starts(512, 512, 384) == [0]

    def test_tile_equals_total_with_any_stride(self):
        assert build_tile_starts(64, 64, 16) == [0]

    @pytest.mark.parametrize("total,tile,stride", [(0, 4, 2), (8, 0, 2), (8, 4, 0)])
    def test_invalid_args_raise(self, total, tile, stride):
        with pytest.raises(ValueError):
            build_tile_starts(total, tile, stride)

    def test_full_coverage_property(self):
        for total in (513, 700, 1023, 2048):
            starts = build_tile_starts(total, 512, 384)
            covered = np.zeros(total, dtype=bool)
            for s in starts:
                covered[s : s + 512] = True
            assert covered.all()


class TestFeatherRamp:
    def test_no_overlap_all_ones(self):
        np.testing.assert_array_equal(build_feather_ramp(16, 0), np.ones(16, np.float32))

    def test_ramp_shape_and_symmetry(self):
        r = build_feather_ramp(512, 128)
        assert r.shape == (512,)
        assert r.dtype == np.float32
        np.testing.assert_allclose(r, r[::-1], rtol=1e-6)
        np.testing.assert_array_equal(r[128:-128], 1.0)
        assert r.min() >= 1e-3
        # Ramp excludes the exact endpoints 0 and 1.
        assert 0 < r[0] < r[127] < 1.0

    def test_overlap_ge_tile_raises(self):
        with pytest.raises(ValueError):
            build_feather_ramp(8, 8)


class TestWindowOrigins:
    def test_row_major_indexing(self):
        out = list(iter_window_origins([0, 10], [0, 5, 9], use_progress=False))
        assert out[0] == (0, 0, 0, 0)
        assert out[1] == (0, 1, 0, 5)
        assert out[-1] == (1, 2, 10, 9)
        assert len(out) == 6


class TestWindowGrid:
    def test_grid_matches_iterator(self):
        grid = build_window_grid(1024, 1536, 512, 384)
        origins = list(
            iter_window_origins(
                build_tile_starts(1024, 512, 384),
                build_tile_starts(1536, 512, 384),
                use_progress=False,
            )
        )
        assert grid["ny"] * grid["nx"] == len(origins)
        for k, (yi, xi, y0, x0) in enumerate(origins):
            assert grid["yi"][k] == yi
            assert grid["xi"][k] == xi
            assert grid["y0"][k] == y0
            assert grid["x0"][k] == x0


class TestDeviceMosaic:
    def _reference_feather_mosaic(self, preds, grid, tile, overlap, out_shape):
        """Numpy mirror of the reference accumulate loop for parity checks."""
        feather_1d = build_feather_ramp(tile, overlap)
        accum = np.zeros(out_shape, np.float32)
        wsum = np.zeros(out_shape, np.float32)
        ny, nx = grid["ny"], grid["nx"]
        for k in range(len(grid["y0"])):
            yi, xi = int(grid["yi"][k]), int(grid["xi"][k])
            y0, x0 = int(grid["y0"][k]), int(grid["x0"][k])
            wy = feather_1d.copy()
            wx = feather_1d.copy()
            if overlap > 0:
                if yi == 0:
                    wy[:overlap] = 1.0
                if yi == ny - 1:
                    wy[-overlap:] = 1.0
                if xi == 0:
                    wx[:overlap] = 1.0
                if xi == nx - 1:
                    wx[-overlap:] = 1.0
            w = np.outer(wy, wx).astype(np.float32)
            accum[y0 : y0 + tile, x0 : x0 + tile] += preds[k] * w
            wsum[y0 : y0 + tile, x0 : x0 + tile] += w
        return np.divide(
            accum, np.maximum(wsum, 1e-6), out=np.zeros_like(accum), where=wsum > 0
        )

    def test_feather_mosaic_matches_reference_loop(self, rng):
        tile, overlap = 64, 16
        out_shape = (192, 256)
        grid = build_window_grid(*out_shape, tile, tile - overlap)
        n = len(grid["y0"])
        preds = rng.normal(size=(n, tile, tile)).astype(np.float32)

        weights = feather_weights_for_grid(
            tile, overlap, jnp.asarray(grid["yi"]), jnp.asarray(grid["xi"]), grid["ny"], grid["nx"]
        )
        got = np.asarray(
            mosaic_scatter_add(
                jnp.asarray(preds), weights, jnp.asarray(grid["y0"]), jnp.asarray(grid["x0"]), out_shape
            )
        )
        want = self._reference_feather_mosaic(preds, grid, tile, overlap, out_shape)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_hard_mosaic_is_exact_paste(self, rng):
        tile = 32
        out_shape = (64, 96)
        grid = build_window_grid(*out_shape, tile, tile)
        n = len(grid["y0"])
        preds = rng.normal(size=(n, tile, tile)).astype(np.float32)
        weights = feather_weights_for_grid(
            tile, 0, jnp.asarray(grid["yi"]), jnp.asarray(grid["xi"]), grid["ny"], grid["nx"]
        )
        got = np.asarray(
            mosaic_scatter_add(
                jnp.asarray(preds), weights, jnp.asarray(grid["y0"]), jnp.asarray(grid["x0"]), out_shape
            )
        )
        want = np.zeros(out_shape, np.float32)
        for k in range(n):
            y0, x0 = int(grid["y0"][k]), int(grid["x0"][k])
            want[y0 : y0 + tile, x0 : x0 + tile] = preds[k]
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_interior_weight_sum_continuity(self):
        # Constant tiles must blend back to the same constant everywhere.
        tile, overlap = 64, 16
        out_shape = (256, 256)
        grid = build_window_grid(*out_shape, tile, tile - overlap)
        n = len(grid["y0"])
        preds = np.full((n, tile, tile), 2.5, np.float32)
        weights = feather_weights_for_grid(
            tile, overlap, jnp.asarray(grid["yi"]), jnp.asarray(grid["xi"]), grid["ny"], grid["nx"]
        )
        got = np.asarray(
            mosaic_scatter_add(
                jnp.asarray(preds), weights, jnp.asarray(grid["y0"]), jnp.asarray(grid["x0"]), out_shape
            )
        )
        np.testing.assert_allclose(got, 2.5, atol=1e-5)
