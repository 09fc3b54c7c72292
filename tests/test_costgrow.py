"""CostGrow: wavefront kernels vs Dijkstra oracle, and the worker end-to-end."""

import json

import numpy as np
import pytest

import jax.numpy as jnp

from floodsr_tpu.io import from_origin, read_raster, write_raster
from floodsr_tpu.model_registry import fetch_model, resolve_model_worker_class
from floodsr_tpu.ops.costgrow import (
    keep_components_connected_to_anchor_jax,
    mcp_distance_jax,
    mcp_fill_jax,
    mcp_fill_numpy,
)

pytestmark = pytest.mark.unit


class TestWavefrontKernels:
    def test_distance_matches_dijkstra_unit_cost(self, rng):
        h = w = 24
        domain = np.ones((h, w), bool)
        domain[10:14, 2:20] = False  # a wall with a gap
        domain[10:14, 20:22] = True
        seeds = np.zeros((h, w), bool)
        seeds[2, 2] = True
        _, want = mcp_fill_numpy(
            np.zeros((h, w), np.float32), seeds, np.ones((h, w)), domain
        )
        got = np.asarray(mcp_distance_jax(jnp.asarray(seeds), jnp.asarray(domain)))
        finite = np.isfinite(want)
        np.testing.assert_allclose(got[finite], want[finite], atol=1e-4)
        np.testing.assert_array_equal(np.isfinite(got), finite)

    def test_fill_values_match_dijkstra_weighted(self, rng):
        h = w = 20
        domain = np.ones((h, w), bool)
        cost = rng.uniform(1.0, 5.0, (h, w))
        seeds = np.zeros((h, w), bool)
        seeds[0, 0] = True
        seeds[h - 1, w - 1] = True
        seed_values = np.full((h, w), np.nan, np.float32)
        seed_values[0, 0] = 100.0
        seed_values[h - 1, w - 1] = 200.0
        want_fill, want_dist = mcp_fill_numpy(seed_values, seeds, cost, domain)
        got_fill, got_dist = mcp_fill_jax(
            jnp.asarray(seed_values),
            jnp.asarray(seeds),
            jnp.asarray(cost, dtype=jnp.float32),
            jnp.asarray(domain),
        )
        np.testing.assert_allclose(np.asarray(got_dist), want_dist, rtol=1e-4)
        # Values match wherever the nearest seed is unambiguous (distance gap).
        d_a = want_dist  # to nearest seed
        got_fill = np.asarray(got_fill)
        agree = got_fill == want_fill
        both_nan = np.isnan(got_fill) & np.isnan(want_fill)
        assert (agree | both_nan).mean() > 0.95

    def test_target_mask_restricts_fill(self):
        h = w = 12
        domain = np.ones((h, w), bool)
        seeds = np.zeros((h, w), bool)
        seeds[0, 0] = True
        seed_values = np.where(seeds, 7.0, np.nan).astype(np.float32)
        target = np.zeros((h, w), bool)
        target[:4, :4] = True
        filled, _ = mcp_fill_jax(
            jnp.asarray(seed_values),
            jnp.asarray(seeds),
            jnp.ones((h, w), jnp.float32),
            jnp.asarray(domain),
            target_mask=jnp.asarray(target),
        )
        filled = np.asarray(filled)
        assert np.isfinite(filled[:4, :4]).all()
        assert np.isnan(filled[6:, 6:]).all()

    def test_domain_blocks_propagation(self):
        h = w = 16
        domain = np.ones((h, w), bool)
        domain[:, 8] = False  # full vertical wall
        seeds = np.zeros((h, w), bool)
        seeds[8, 2] = True
        dist = np.asarray(mcp_distance_jax(jnp.asarray(seeds), jnp.asarray(domain)))
        assert np.isfinite(dist[:, :8]).all()
        assert not np.isfinite(dist[:, 9:]).any()

    def test_connected_components_filter(self):
        wet = np.zeros((16, 16), bool)
        wet[2:6, 2:6] = True     # blob A (anchored)
        wet[10:14, 10:14] = True  # blob B (isolated)
        anchors = np.zeros((16, 16), bool)
        anchors[3, 3] = True
        keep = np.asarray(
            keep_components_connected_to_anchor_jax(jnp.asarray(wet), jnp.asarray(anchors))
        )
        assert keep[2:6, 2:6].all()
        assert not keep[10:14, 10:14].any()

    def test_diagonal_connectivity(self):
        # The reference labels components with connectivity=1 (orthogonal
        # only — both CostGrow notebooks), so a diagonal-only chain is
        # disconnected by default; connectivity=2 opts into diagonals.
        wet = np.zeros((8, 8), bool)
        wet[0, 0] = wet[1, 1] = wet[2, 2] = True  # diagonal chain
        anchors = np.zeros((8, 8), bool)
        anchors[0, 0] = True
        keep = np.asarray(
            keep_components_connected_to_anchor_jax(jnp.asarray(wet), jnp.asarray(anchors))
        )
        assert keep[0, 0] and not keep[1, 1] and not keep[2, 2]
        keep8 = np.asarray(
            keep_components_connected_to_anchor_jax(
                jnp.asarray(wet), jnp.asarray(anchors), connectivity=2
            )
        )
        assert keep8[2, 2]


class TestPallasStencil:
    """Interpret-mode exactness of the Pallas relaxation vs the jnp reference."""

    def _setup(self, rng, h=16, w=24):
        dist = np.full((h, w), np.inf, np.float32)
        value = np.full((h, w), np.nan, np.float32)
        dist[3, 5] = 0.0
        value[3, 5] = 10.0
        dist[h - 4, w - 4] = 0.0
        value[h - 4, w - 4] = 20.0
        cost = rng.uniform(1, 4, (h, w)).astype(np.float32)
        return dist, value, cost

    def test_single_step_matches_reference(self, rng):
        from floodsr_tpu.ops.costgrow import _relax_distance_value
        from floodsr_tpu.ops.pallas.costgrow_stencil import relax_step_pallas

        dist, value, cost = self._setup(rng)
        want_d, want_v = _relax_distance_value(
            jnp.asarray(dist), jnp.asarray(value), jnp.asarray(cost)
        )
        got_d, got_v = relax_step_pallas(
            jnp.asarray(dist), jnp.asarray(value), jnp.asarray(cost),
            block_rows=8, interpret=True,
        )
        wd, gd = np.asarray(want_d), np.asarray(got_d)
        finite = np.isfinite(wd)
        np.testing.assert_allclose(gd[finite], wd[finite], atol=1e-5)
        assert ((gd > 1e37) == ~finite).all()
        wv, gv = np.asarray(want_v), np.asarray(got_v)
        both = np.isfinite(wv) & np.isfinite(gv)
        np.testing.assert_allclose(gv[both], wv[both], atol=1e-5)
        assert (np.isnan(wv) == np.isnan(gv)).all()

    def test_multi_step_across_block_boundaries(self, rng):
        from floodsr_tpu.ops.costgrow import _relax_distance_value
        from floodsr_tpu.ops.pallas.costgrow_stencil import relax_step_pallas

        dist, value, cost = self._setup(rng, h=24, w=16)
        d_ref, v_ref = jnp.asarray(dist), jnp.asarray(value)
        d_pl, v_pl = jnp.asarray(dist), jnp.asarray(value)
        for _ in range(10):  # wavefront crosses the block_rows=8 boundaries
            d_ref, v_ref = _relax_distance_value(d_ref, v_ref, jnp.asarray(cost))
            d_pl, v_pl = relax_step_pallas(
                d_pl, v_pl, jnp.asarray(cost), block_rows=8, interpret=True
            )
        wd, gd = np.asarray(d_ref), np.asarray(d_pl)
        finite = np.isfinite(wd)
        assert (finite == (gd < 1e37)).all()
        np.testing.assert_allclose(gd[finite], wd[finite], atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(v_pl)[finite], np.asarray(v_ref)[finite], atol=1e-4
        )

    def test_block_rows_sizing(self):
        from floodsr_tpu.ops.costgrow import _pallas_block_rows

        assert _pallas_block_rows(4096, 4096) % 8 == 0
        assert 8 <= _pallas_block_rows(4096, 4096) <= 256
        assert _pallas_block_rows(64, 64) == 256


class TestCostGrowWorker:
    @pytest.fixture(scope="class")
    def costgrow_scene(self, tmp_path_factory):
        """A valley DEM with a coarse WSE covering the channel."""
        root = tmp_path_factory.mktemp("costgrow")
        h = w = 64
        yy = np.abs(np.arange(h) - h / 2)[:, None]
        dem = (100.0 + yy * 0.5 + np.linspace(0, 3, w)[None, :]).astype(np.float32)
        # Coarse WSE (8x coarser): water at 102.5 m over the channel.
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
        params_fp = root / "costgrow_params.json"
        params_fp.write_text(
            json.dumps({"model_version": "CostGrow", "max_grow_coarse_pixels": 2})
        )
        return {"wse_fp": wse_fp, "dem_fp": dem_fp, "params_fp": params_fp, "dem": dem}

    def test_worker_end_to_end(self, costgrow_scene, tmp_path, logger):
        worker_cls = resolve_model_worker_class("CostGrow")
        out_fp = tmp_path / "wse_grown.tif"
        with worker_cls(model_fp=costgrow_scene["params_fp"], logger=logger) as worker:
            result = worker.run(
                depth_lr_fp=costgrow_scene["wse_fp"],
                dem_hr_fp=costgrow_scene["dem_fp"],
                output_fp=out_fp,
            )
        out, nodata, profile = read_raster(out_fp)
        assert out.shape == (64, 64)
        wet = ~np.isclose(out, nodata)
        assert wet.any()
        # Output WSE clears the terrain wherever wet.
        assert (out[wet] > costgrow_scene["dem"][wet]).all()
        diag = result["preprocess"]
        assert diag["downscale"] == 8
        assert diag["max_grow_fine_pixels"] == 16.0
        assert diag["wet_pixel_count"] == int(wet.sum())

    def test_depth_output_kind(self, costgrow_scene, tmp_path, logger):
        params_fp = tmp_path / "p.json"
        params_fp.write_text(json.dumps({"output_kind": "depth", "max_grow_coarse_pixels": 2}))
        worker_cls = resolve_model_worker_class("CostGrow")
        out_fp = tmp_path / "depth.tif"
        with worker_cls(model_fp=params_fp, logger=logger) as worker:
            worker.run(
                depth_lr_fp=costgrow_scene["wse_fp"],
                dem_hr_fp=costgrow_scene["dem_fp"],
                output_fp=out_fp,
                max_depth=5.0,
            )
        out, nodata, _ = read_raster(out_fp)
        wet = ~np.isclose(out, nodata)
        assert (out[wet] >= 0).all() and (out[wet] <= 5.0).all()

    def test_registry_builtin_fetch(self, tmp_path):
        fp = fetch_model("CostGrow", cache_dir=tmp_path / "cache")
        payload = json.loads(fp.read_text())
        assert payload["model_version"] == "CostGrow"

    def test_cli_tohr_costgrow(self, costgrow_scene, tmp_path, capsys):
        from floodsr_tpu.cli import main

        out_fp = tmp_path / "cli_costgrow.tif"
        code = main(
            [
                "tohr",
                "--in", str(costgrow_scene["wse_fp"]),
                "--dem", str(costgrow_scene["dem_fp"]),
                "--out", str(out_fp),
                "--model-version", "CostGrow",
                "--model-path", str(costgrow_scene["params_fp"]),
            ]
        )
        assert code == 0
        assert out_fp.exists()


class TestLongPathConvergence:
    def test_serpentine_path_longer_than_h_plus_w(self):
        # A serpentine corridor forces a least-cost path of ~h*w/2 cells,
        # far beyond the old h+w iteration cap; the default bound must
        # still converge to the Dijkstra oracle.
        h, w = 12, 12
        domain = np.zeros((h, w), bool)
        for r in range(0, h, 2):
            domain[r, :] = True
        for k, r in enumerate(range(1, h, 2)):
            domain[r, w - 1 if k % 2 == 0 else 0] = True
        seeds = np.zeros((h, w), bool)
        seeds[0, 0] = True
        seed_values = np.where(seeds, 42.0, np.nan).astype(np.float32)
        cost = np.ones((h, w), np.float32)
        want_fill, want_dist = mcp_fill_numpy(seed_values, seeds, cost, domain)
        got_fill, got_dist = mcp_fill_jax(
            jnp.asarray(seed_values), jnp.asarray(seeds),
            jnp.asarray(cost), jnp.asarray(domain),
        )
        finite = np.isfinite(want_dist)
        assert want_dist[finite].max() > h + w  # the old cap would truncate
        np.testing.assert_allclose(np.asarray(got_dist)[finite], want_dist[finite], rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(got_fill)[domain], want_fill[domain], atol=1e-5
        )
