"""Row-band-sharded CostGrow wavefront: dp=8 equals the unsharded fill.

Runs on the suite's virtual 8-device CPU mesh (conftest forces
``xla_force_host_platform_device_count=8``). The sharded fill must be a
pure layout change: distances exactly reproduce the single-device
relaxation (same arithmetic), values match wherever the nearest seed is
unambiguous, and propagation crosses band seams.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from floodsr_tpu.ops.costgrow import mcp_fill_jax, mcp_fill_numpy
from floodsr_tpu.ops.costgrow_banded import mcp_fill_sharded
from floodsr_tpu.parallel.mesh import make_mesh

pytestmark = [pytest.mark.unit, pytest.mark.multidev]


@pytest.fixture(scope="module")
def dp_mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    return make_mesh(dp=8, tp=1)


def _random_problem(rng, h, w, n_seeds=5):
    domain = rng.random((h, w)) > 0.05
    cost = rng.uniform(1.0, 5.0, (h, w)).astype(np.float32)
    seeds = np.zeros((h, w), bool)
    rows = rng.integers(0, h, n_seeds)
    cols = rng.integers(0, w, n_seeds)
    seeds[rows, cols] = True
    seeds &= domain
    if not seeds.any():
        seeds[h // 2, w // 2] = True
        domain[h // 2, w // 2] = True
    seed_values = np.full((h, w), np.nan, np.float32)
    seed_values[seeds] = rng.normal(size=int(seeds.sum())).astype(np.float32) * 10
    return seed_values, seeds, cost, domain


class TestBandedEqualsUnsharded:
    @pytest.mark.parametrize("h,w", [(64, 48), (40, 40)])
    def test_matches_single_device(self, rng, dp_mesh, h, w):
        seed_values, seeds, cost, domain = _random_problem(rng, h, w)
        want_fill, want_dist = mcp_fill_jax(
            jnp.asarray(seed_values), jnp.asarray(seeds),
            jnp.asarray(cost), jnp.asarray(domain),
            use_pallas=False,
        )
        got_fill, got_dist = mcp_fill_sharded(
            seed_values, seeds, cost, domain, dp_mesh
        )
        want_dist = np.asarray(want_dist)
        finite = np.isfinite(want_dist)
        np.testing.assert_array_equal(np.isfinite(got_dist), finite)
        np.testing.assert_allclose(got_dist[finite], want_dist[finite], rtol=1e-5)
        want_fill = np.asarray(want_fill)
        agree = (got_fill == want_fill) | (np.isnan(got_fill) & np.isnan(want_fill))
        # Ties between equidistant seeds may break differently; everything
        # else must match bit-for-bit.
        assert agree.mean() > 0.99

    def test_height_not_divisible_pads(self, rng, dp_mesh):
        # 42 rows over 8 bands exercises the impassable-padding wrapper.
        seed_values, seeds, cost, domain = _random_problem(rng, 42, 24)
        want_fill, want_dist = mcp_fill_jax(
            jnp.asarray(seed_values), jnp.asarray(seeds),
            jnp.asarray(cost), jnp.asarray(domain),
            use_pallas=False,
        )
        got_fill, got_dist = mcp_fill_sharded(
            seed_values, seeds, cost, domain, dp_mesh
        )
        assert got_dist.shape == (42, 24)
        want_dist = np.asarray(want_dist)
        finite = np.isfinite(want_dist)
        np.testing.assert_allclose(got_dist[finite], want_dist[finite], rtol=1e-5)

    def test_propagation_crosses_band_seams(self, dp_mesh):
        """One seed in the top band must fill the whole domain (exact
        Dijkstra distances), crossing all 7 seam exchanges."""
        h, w = 64, 16
        domain = np.ones((h, w), bool)
        cost = np.ones((h, w), np.float32)
        seeds = np.zeros((h, w), bool)
        seeds[0, 0] = True
        seed_values = np.where(seeds, 7.0, np.nan).astype(np.float32)
        got_fill, got_dist = mcp_fill_sharded(
            seed_values, seeds, cost, domain, dp_mesh
        )
        _, want_dist = mcp_fill_numpy(seed_values, seeds, cost, domain)
        np.testing.assert_allclose(got_dist, want_dist, rtol=1e-5)
        assert np.isfinite(got_fill).all()
        np.testing.assert_allclose(got_fill, 7.0)

    def test_serpentine_across_bands(self, dp_mesh):
        """A least-cost path that snakes through every band several times —
        convergence needs many more blocks than bands."""
        h, w = 16, 16
        domain = np.zeros((h, w), bool)
        for r in range(0, h, 2):
            domain[r, :] = True
        for j, r in enumerate(range(1, h, 2)):
            domain[r, w - 1 if j % 2 == 0 else 0] = True
        seeds = np.zeros((h, w), bool)
        seeds[0, 0] = True
        seed_values = np.where(seeds, 3.0, np.nan).astype(np.float32)
        cost = np.ones((h, w), np.float32)
        _, want_dist = mcp_fill_numpy(seed_values, seeds, cost, domain)
        got_fill, got_dist = mcp_fill_sharded(
            seed_values, seeds, cost, domain, dp_mesh
        )
        finite = np.isfinite(want_dist)
        np.testing.assert_allclose(got_dist[finite], want_dist[finite], rtol=1e-5)
        np.testing.assert_allclose(got_fill[domain], 3.0)

    def test_unreachable_cells_stay_untouched(self, dp_mesh):
        h, w = 32, 8
        domain = np.ones((h, w), bool)
        domain[16, :] = False  # full wall between bands
        seeds = np.zeros((h, w), bool)
        seeds[0, 0] = True
        seed_values = np.where(seeds, 1.0, np.nan).astype(np.float32)
        got_fill, got_dist = mcp_fill_sharded(
            seed_values, seeds, np.ones((h, w), np.float32), domain, dp_mesh
        )
        assert np.isfinite(got_dist[:16]).all()
        assert not np.isfinite(got_dist[17:]).any()
        assert np.isnan(got_fill[17:]).all()


class TestBuildCache:
    def test_repeat_builds_reuse_the_compiled_fn(self, dp_mesh):
        from floodsr_tpu.ops.costgrow_banded import build_banded_mcp_fill

        a = build_banded_mcp_fill(dp_mesh, (64, 32))
        b = build_banded_mcp_fill(dp_mesh, (64, 32))
        assert a is b  # second call must not re-trace/compile
        c = build_banded_mcp_fill(dp_mesh, (64, 32), relaxations_per_check=4)
        assert c is not a
