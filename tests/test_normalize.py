"""Normalization math: numpy/JAX twins must agree and match reference semantics."""

import numpy as np
import pytest

import jax.numpy as jnp

from floodsr_tpu.ops import (
    dem_tile_stats,
    invert_depth_log1p,
    invert_depth_log1p_np,
    normalize_dem,
    normalize_dem_batch,
    normalize_dem_with_stats_np,
    replace_nodata_with_zero,
    scale_depth_log1p,
    scale_depth_log1p_np,
)

pytestmark = pytest.mark.unit


class TestDepthScaling:
    def test_roundtrip(self, rng):
        depth = rng.uniform(0, 5, size=(32, 32)).astype(np.float32)
        norm = scale_depth_log1p_np(depth, max_depth=5.0)
        back = invert_depth_log1p_np(norm, max_depth=5.0)
        np.testing.assert_allclose(back, depth, atol=1e-5)

    def test_clipping_and_range(self):
        arr = np.array([-1.0, 0.0, 2.5, 5.0, 99.0], dtype=np.float32)
        norm = scale_depth_log1p_np(arr, max_depth=5.0)
        assert norm.min() >= 0.0 and norm.max() <= 1.0
        assert norm[0] == 0.0
        assert norm[3] == norm[4] == 1.0

    def test_none_passthrough(self):
        assert scale_depth_log1p_np(None, 5.0) is None
        assert invert_depth_log1p_np(None, 5.0) is None

    @pytest.mark.parametrize("bad", [0.0, -1.0, np.inf, np.nan])
    def test_invalid_max_depth(self, bad):
        with pytest.raises(AssertionError):
            scale_depth_log1p_np(np.ones(4, np.float32), bad)

    def test_nonfinite_input_rejected(self):
        with pytest.raises(AssertionError):
            scale_depth_log1p_np(np.array([1.0, np.nan]), 5.0)

    def test_jax_matches_numpy(self, rng):
        # XLA's log1p/expm1 approximations differ from numpy's by ~4e-5 in
        # float32; the pipeline parity budget is 1e-3 m so this is negligible.
        depth = rng.uniform(-1, 8, size=(16, 16)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(scale_depth_log1p(jnp.asarray(depth), 5.0)),
            scale_depth_log1p_np(depth, 5.0),
            atol=2e-4,
        )
        norm = rng.uniform(0, 1, size=(16, 16)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(invert_depth_log1p(jnp.asarray(norm), 5.0)),
            invert_depth_log1p_np(norm, 5.0),
            atol=5e-4,
        )


class TestDemNormalization:
    def test_tile_local_stats(self, rng):
        dem = rng.uniform(500, 1000, size=(64, 64)).astype(np.float32)
        norm, stats = normalize_dem(dem, pct_clip=95.0)
        assert norm.min() >= 0.0 and norm.max() <= 1.0
        assert stats["dem_min"] <= stats["dem_max"] <= stats["p_clip"] + 1e-3
        # p95 clip: ~5% of pixels should sit at exactly 1.0.
        frac_at_one = float((norm >= 1.0 - 1e-6).mean())
        assert 0.03 < frac_at_one < 0.08

    def test_explicit_ref_stats(self):
        dem = np.array([[0.0, 50.0], [100.0, 200.0]], dtype=np.float32)
        norm, stats = normalize_dem(
            dem, ref_stats={"p_clip": 100.0, "dem_min": 0.0, "dem_max": 100.0}
        )
        np.testing.assert_allclose(norm, [[0.0, 0.5], [1.0, 1.0]])
        assert stats == {"p_clip": 100.0, "dem_min": 0.0, "dem_max": 100.0}

    def test_zero_range_zero_min_returns_zeros(self):
        dem = np.zeros((8, 8), dtype=np.float32)
        norm, stats = normalize_dem(dem)
        np.testing.assert_array_equal(norm, 0.0)

    def test_zero_range_positive_min_raises(self):
        with pytest.raises(AssertionError):
            normalize_dem_with_stats_np(np.ones((4, 4), np.float32), 10.0, 5.0, 5.0)

    def test_negative_values_clipped_before_stats(self):
        dem = np.array([[-100.0, 0.0], [50.0, 100.0]], dtype=np.float32)
        norm, stats = normalize_dem(dem, pct_clip=100.0)
        assert stats["dem_min"] == 0.0
        assert norm[0, 0] == 0.0

    def test_invalid_pct_clip(self):
        with pytest.raises(AssertionError):
            normalize_dem(np.ones((4, 4), np.float32), pct_clip=0.0)
        with pytest.raises(AssertionError):
            normalize_dem(np.ones((4, 4), np.float32), pct_clip=101.0)

    def test_batched_jax_matches_per_tile_numpy(self, rng):
        tiles = rng.uniform(200, 900, size=(5, 32, 32)).astype(np.float32)
        tiles[2] = 0.0  # padded tile: benign zero-range case
        norm_b, stats_b = normalize_dem_batch(jnp.asarray(tiles), 95.0)
        for i in range(tiles.shape[0]):
            if i == 2:
                np.testing.assert_array_equal(np.asarray(norm_b[i]), 0.0)
                continue
            want, stats = normalize_dem(tiles[i], pct_clip=95.0)
            np.testing.assert_allclose(np.asarray(norm_b[i]), want, atol=2e-5)
            np.testing.assert_allclose(float(stats_b["p_clip"][i]), stats["p_clip"], rtol=1e-5)
            np.testing.assert_allclose(float(stats_b["dem_min"][i]), stats["dem_min"], rtol=1e-5)
            np.testing.assert_allclose(float(stats_b["dem_max"][i]), stats["dem_max"], rtol=1e-5)

    def test_device_percentile_matches_nanpercentile(self, rng):
        tiles = rng.normal(600, 150, size=(3, 48, 48)).astype(np.float32)
        p_clip, _, _ = dem_tile_stats(jnp.asarray(tiles), 95.0)
        for i in range(3):
            want = float(np.nanpercentile(np.clip(tiles[i], 0, None), 95.0))
            np.testing.assert_allclose(float(p_clip[i]), want, rtol=1e-6)

    def test_pallas_tile_stats_matches_unfused(self, rng):
        from floodsr_tpu.ops.pallas.tile_stats import dem_tile_stats_pallas

        for shape, pct in [((5, 64, 64), 95.0), ((2, 33, 47), 87.3)]:
            tiles = (
                rng.normal(300, 40, size=shape) * (rng.random(shape) > 0.05)
            ).astype(np.float32)
            p, lo, hi = dem_tile_stats_pallas(
                jnp.asarray(tiles), pct, interpret=True
            )
            p_ref, lo_ref, hi_ref = dem_tile_stats(jnp.asarray(tiles), pct)
            np.testing.assert_allclose(np.asarray(p), np.asarray(p_ref), rtol=1e-6)
            np.testing.assert_allclose(np.asarray(lo), np.asarray(lo_ref), rtol=1e-6)
            np.testing.assert_allclose(np.asarray(hi), np.asarray(hi_ref), rtol=1e-6)
            flat = np.maximum(tiles.reshape(shape[0], -1), 0.0)
            want_p = np.percentile(flat, pct, axis=1)
            np.testing.assert_allclose(np.asarray(p), want_p, rtol=1e-5)


class TestNodataReplacement:
    def test_exact_and_close_values(self):
        arr = np.array([-9999.0, -9999.0000001, 1.5], dtype=np.float32)
        out = replace_nodata_with_zero(arr, -9999.0)
        np.testing.assert_array_equal(out, [0.0, 0.0, 1.5])

    def test_none_nodata_passthrough(self):
        arr = np.array([1.0, -9999.0], dtype=np.float32)
        np.testing.assert_array_equal(replace_nodata_with_zero(arr, None), arr)


class TestQuantizedTransfer:
    def test_small_arrays_bypass_exactly(self):
        from floodsr_tpu.ops.transfer import device_put_dem_quantized

        arr = np.random.default_rng(0).normal(500, 30, (64, 64)).astype(np.float32)
        out = np.asarray(device_put_dem_quantized(arr, None))
        np.testing.assert_array_equal(out, arr)

    def test_large_array_quantizes_within_step(self):
        from floodsr_tpu.ops.transfer import device_put_dem_quantized

        rng = np.random.default_rng(1)
        arr = rng.uniform(200.0, 800.0, (1536, 1536)).astype(np.float32)
        out = np.asarray(device_put_dem_quantized(arr, None))
        step = (800.0 - 200.0) / 65534.0
        assert np.abs(out - arr).max() <= step * 0.51 + 1e-4

    def test_nodata_roundtrips_exactly(self):
        from floodsr_tpu.ops.transfer import device_put_dem_quantized

        rng = np.random.default_rng(2)
        arr = rng.uniform(0.0, 100.0, (1536, 1536)).astype(np.float32)
        mask = rng.random((1536, 1536)) < 0.1
        arr[mask] = -9999.0
        out = np.asarray(device_put_dem_quantized(arr, -9999.0))
        np.testing.assert_array_equal(out[mask], -9999.0)
        step = 100.0 / 65534.0
        assert np.abs(out[~mask] - arr[~mask]).max() <= step * 0.51 + 1e-5

    def test_disabled_is_exact(self):
        from floodsr_tpu.ops.transfer import device_put_dem_quantized

        arr = np.random.default_rng(3).uniform(0, 1, (1536, 1536)).astype(np.float32)
        out = np.asarray(device_put_dem_quantized(arr, None, enabled=False))
        np.testing.assert_array_equal(out, arr)

    def test_constant_dem_bypasses(self):
        from floodsr_tpu.ops.transfer import device_put_dem_quantized

        arr = np.full((1536, 1536), 42.0, np.float32)
        out = np.asarray(device_put_dem_quantized(arr, None))
        np.testing.assert_array_equal(out, arr)
