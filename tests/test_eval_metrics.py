"""Evaluation metric semantics (host + device twins)."""

import numpy as np
import pytest

import jax.numpy as jnp

from floodsr_tpu.eval import compute_depth_error_metrics, depth_metrics_jax

pytestmark = pytest.mark.unit


class TestHostMetrics:
    def test_perfect_match(self):
        ref = np.full((16, 16), 1.0, np.float32)
        m = compute_depth_error_metrics(ref, ref.copy(), max_depth=5.0)
        assert m["rmse_m"] == 0.0
        assert m["mase_m"] == 0.0
        assert m["psnr"] == np.inf
        assert m["wet_pixel_count"] == 256
        assert m["dry_pixel_count"] == 0
        np.testing.assert_allclose(m["ssim"], 1.0, atol=1e-9)

    def test_known_bias(self):
        ref = np.zeros((8, 8), np.float32)
        est = np.full((8, 8), 0.5, np.float32)
        m = compute_depth_error_metrics(ref, est, max_depth=5.0)
        assert m["bias_m"] == pytest.approx(0.5)
        assert m["rmse_m"] == pytest.approx(0.5)
        assert m["mae_m"] == m["mase_m"] == pytest.approx(0.5)
        assert np.isnan(m["rmse_wet_m"])  # all-dry reference

    def test_psnr_formula(self):
        ref = np.zeros((4, 4), np.float32)
        est = np.full((4, 4), 1.0, np.float32)
        m = compute_depth_error_metrics(ref, est, max_depth=5.0)
        assert m["psnr"] == pytest.approx(20 * np.log10(5.0) - 10 * np.log10(1.0))

    def test_shape_mismatch_raises(self):
        with pytest.raises(AssertionError):
            compute_depth_error_metrics(
                np.zeros((4, 4), np.float32), np.zeros((4, 5), np.float32), 5.0
            )

    def test_wet_dry_partition(self, rng):
        ref = rng.uniform(0, 2, size=(32, 32)).astype(np.float32)
        ref[:16] = 0.0
        est = ref + rng.normal(0, 0.1, size=ref.shape).astype(np.float32)
        m = compute_depth_error_metrics(ref, est, max_depth=5.0)
        assert m["wet_pixel_count"] + m["dry_pixel_count"] == ref.size
        wet = ref >= 1e-3
        assert m["rmse_wet_m"] == pytest.approx(
            float(np.sqrt(np.mean((est - ref)[wet] ** 2))), rel=1e-5
        )


class TestDeviceMetrics:
    def test_matches_host_metrics(self, rng):
        ref = rng.uniform(0, 3, size=(24, 24)).astype(np.float32)
        ref[ref < 0.5] = 0.0
        est = np.clip(ref + rng.normal(0, 0.2, ref.shape), 0, 5).astype(np.float32)
        host = compute_depth_error_metrics(ref, est, max_depth=5.0)
        dev = depth_metrics_jax(jnp.asarray(ref), jnp.asarray(est), max_depth=5.0)
        for key in ("rmse_m", "mase_m", "bias_m", "ssim", "psnr", "rmse_wet_m"):
            np.testing.assert_allclose(float(dev[key]), host[key], rtol=1e-4)

    def test_batched_shapes(self, rng):
        ref = rng.uniform(0, 3, size=(4, 16, 16)).astype(np.float32)
        est = ref + 0.1
        dev = depth_metrics_jax(jnp.asarray(ref), jnp.asarray(est), max_depth=5.0)
        assert dev["rmse_m"].shape == (4,)
        assert dev["csi"].shape == (4,)

    def test_csi_definition(self):
        ref = np.array([[1.0, 0.0], [1.0, 0.0]], np.float32)
        est = np.array([[1.0, 1.0], [0.0, 0.0]], np.float32)
        dev = depth_metrics_jax(jnp.asarray(ref), jnp.asarray(est), max_depth=5.0)
        # hits=1, misses=1, false_alarms=1 -> csi = 1/3
        np.testing.assert_allclose(float(dev["csi"]), 1 / 3, rtol=1e-6)
