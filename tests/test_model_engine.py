"""Model core + JAX engine: shapes, checkpoint roundtrip, engine contract."""

import numpy as np
import pytest

from floodsr_tpu.engine import EngineBase, EngineJAX, ModelIOContract
from floodsr_tpu.nn import ResUNetConfig, count_params, init_resunet, resunet_apply
from floodsr_tpu.nn.checkpoint import load_artifact, save_artifact

pytestmark = pytest.mark.unit

TINY_CFG = ResUNetConfig(
    base_filters=8,
    levels=2,
    enc_blocks=1,
    dec_blocks=1,
    fuse_filters=8,
    fuse_blocks=1,
    scale=4,
    lr_tile=8,
)


@pytest.fixture(scope="session")
def tiny_artifact(tmp_path_factory):
    params, state = init_resunet(1234, TINY_CFG)
    fp = tmp_path_factory.mktemp("artifact") / "tiny_model.fsrz"
    save_artifact(fp, TINY_CFG, params, state, {"seed": 1234})
    return fp


@pytest.fixture(scope="session")
def tiny_engine(tiny_artifact):
    return EngineJAX(tiny_artifact, max_batch=4)


class TestModelCore:
    def test_default_config_param_count(self):
        # Pinned: f=32, 2 blocks/stage, hr_s2d=4 layout (reference artifact is
        # 12,045,568 in its own unrecoverable layout; ours is a documented
        # superset; hr_s2d=1 reproduces the reference-prose HR layout).
        params, state = init_resunet(0, ResUNetConfig())
        assert count_params(params) == 16_661_616
        params2, _ = init_resunet(0, ResUNetConfig(hr_s2d=2))
        assert count_params(params2) == 16_184_420
        params1, _ = init_resunet(0, ResUNetConfig(hr_s2d=1))
        assert count_params(params1) == 16_067_169

    def test_s2d_variant_output_shape(self):
        cfg = ResUNetConfig(
            base_filters=8, levels=2, enc_blocks=1, dec_blocks=1,
            fuse_filters=8, fuse_blocks=1, scale=4, lr_tile=8, hr_s2d=2,
        )
        params, state = init_resunet(3, cfg)
        depth = np.zeros((2, 8, 8, 1), np.float32)
        dem = np.zeros((2, 32, 32, 1), np.float32)
        out, _ = resunet_apply(params, state, depth, dem, cfg)
        assert out.shape == (2, 32, 32, 1)

    def test_forward_shapes_and_dtype(self):
        params, state = init_resunet(7, TINY_CFG)
        depth = np.random.default_rng(0).random((2, 8, 8, 1), dtype=np.float32)
        dem = np.random.default_rng(1).random((2, 32, 32, 1), dtype=np.float32)
        out, new_state = resunet_apply(params, state, depth, dem, TINY_CFG)
        assert out.shape == (2, 32, 32, 1)
        assert out.dtype == np.float32
        assert np.isfinite(np.asarray(out)).all()

    def test_init_is_deterministic(self):
        p1, _ = init_resunet(42, TINY_CFG)
        p2, _ = init_resunet(42, TINY_CFG)
        for a, b in zip(
            np.asarray(p1["stem"]["w"]).ravel(), np.asarray(p2["stem"]["w"]).ravel()
        ):
            assert a == b
        p3, _ = init_resunet(43, TINY_CFG)
        assert not np.array_equal(p1["stem"]["w"], p3["stem"]["w"])

    def test_train_mode_updates_state(self):
        params, state = init_resunet(7, TINY_CFG)
        depth = np.random.default_rng(0).random((2, 8, 8, 1), dtype=np.float32)
        dem = np.random.default_rng(1).random((2, 32, 32, 1), dtype=np.float32)
        _, new_state = resunet_apply(params, state, depth, dem, TINY_CFG, train=True)
        before = np.asarray(state["enc"][0][0]["bn1"]["mean"])
        after = np.asarray(new_state["enc"][0][0]["bn1"]["mean"])
        assert not np.array_equal(before, after)

    def test_config_roundtrip(self):
        cfg = ResUNetConfig(base_filters=16, scale=8)
        assert ResUNetConfig.from_dict(cfg.to_dict()) == cfg

    def test_widths(self):
        assert ResUNetConfig(base_filters=32).widths == (32, 64, 128, 256, 512)


class TestPrecisionPolicy:
    def test_resolve_named_and_dict(self):
        import jax.numpy as jnp

        from floodsr_tpu.nn.resunet import resolve_precision_policy

        f32 = resolve_precision_policy("f32")
        assert all(dt == jnp.float32 for dt in f32.values())
        mixed = resolve_precision_policy("mixed")
        assert mixed["trunk"] == jnp.bfloat16
        assert mixed["sr_up"] == jnp.bfloat16
        assert mixed["tail"] == jnp.float32
        assert mixed["head"] == jnp.float32
        # dict spec: unnamed stages default to f32
        partial = resolve_precision_policy({"trunk": "bf16"})
        assert partial["trunk"] == jnp.bfloat16
        assert partial["tail"] == jnp.float32
        # back-compat: derive from compute_dtype when policy is None
        assert resolve_precision_policy(None, jnp.bfloat16)["trunk"] == jnp.bfloat16
        assert resolve_precision_policy(None, jnp.float32)["trunk"] == jnp.float32

    def test_resolve_rejects_bad_specs(self):
        from floodsr_tpu.nn.resunet import resolve_precision_policy

        with pytest.raises(AssertionError):
            resolve_precision_policy("fp8")
        with pytest.raises(AssertionError):
            resolve_precision_policy({"not_a_stage": "bf16"})
        with pytest.raises(AssertionError):
            resolve_precision_policy({"head": "bf16"})  # head must stay f32

    def test_f32_policy_matches_legacy_path_exactly(self):
        params, state = init_resunet(7, TINY_CFG)
        depth = np.random.default_rng(0).random((2, 8, 8, 1), dtype=np.float32)
        dem = np.random.default_rng(1).random((2, 32, 32, 1), dtype=np.float32)
        legacy, _ = resunet_apply(params, state, depth, dem, TINY_CFG)
        via_policy, _ = resunet_apply(
            params, state, depth, dem, TINY_CFG, precision="f32"
        )
        np.testing.assert_array_equal(np.asarray(legacy), np.asarray(via_policy))

    def test_policies_change_numerics_and_match_legacy_paths(self):
        """Stage knobs are live, and named policies equal the legacy paths.

        Absolute parity margins of the mixed policy are a property of the
        TRAINED flagship (activation scales), measured on hardware and
        recorded in docs/perf/precision_study.json — an untrained He-init
        net has unrealistically large trunk activations, so no absolute
        closeness gate here.
        """
        import jax.numpy as jnp

        params, state = init_resunet(7, TINY_CFG)
        rng = np.random.default_rng(2)
        depth = rng.random((2, 8, 8, 1), dtype=np.float32)
        dem = rng.random((2, 32, 32, 1), dtype=np.float32)
        ref, _ = resunet_apply(params, state, depth, dem, TINY_CFG, precision="f32")
        mixed, _ = resunet_apply(params, state, depth, dem, TINY_CFG, precision="mixed")
        bf16, _ = resunet_apply(params, state, depth, dem, TINY_CFG, precision="bf16")
        assert mixed.dtype == np.float32 and bf16.dtype == np.float32
        assert np.isfinite(np.asarray(mixed)).all()
        # each knob produces a distinct computation
        assert not np.array_equal(np.asarray(ref), np.asarray(mixed))
        assert not np.array_equal(np.asarray(mixed), np.asarray(bf16))
        # the bf16 named policy IS the legacy compute_dtype=bfloat16 path
        legacy_bf16, _ = resunet_apply(
            params, state, depth, dem, TINY_CFG, compute_dtype=jnp.bfloat16
        )
        np.testing.assert_array_equal(np.asarray(bf16), np.asarray(legacy_bf16))
        # trunk-only override differs from both uniform policies
        trunk_only, _ = resunet_apply(
            params, state, depth, dem, TINY_CFG, precision={"trunk": "bf16"}
        )
        assert not np.array_equal(np.asarray(trunk_only), np.asarray(ref))
        assert not np.array_equal(np.asarray(trunk_only), np.asarray(bf16))

    def test_engine_accepts_mixed(self, tiny_artifact):
        eng = EngineJAX(tiny_artifact, compute_dtype="mixed", max_batch=2)
        depth = np.random.default_rng(0).random((2, 8, 8), dtype=np.float32)
        dem = 100.0 + np.random.default_rng(1).random((2, 32, 32), dtype=np.float32)
        out = eng.run_tiles(depth, dem)
        assert out["predictions_m"].shape == (2, 32, 32)
        assert np.isfinite(out["predictions_m"]).all()
        eng.close()

    def test_engine_rejects_unknown_dtype(self, tiny_artifact):
        with pytest.raises(AssertionError):
            EngineJAX(tiny_artifact, compute_dtype="float16")


class TestCheckpoint:
    def test_roundtrip_identity(self, tiny_artifact):
        art = load_artifact(tiny_artifact)
        params, state = init_resunet(1234, TINY_CFG)
        import jax

        for got, want in zip(jax.tree.leaves(art["params"]), jax.tree.leaves(params)):
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        assert art["config"] == TINY_CFG
        assert art["manifest"]["metadata"] == {"seed": 1234}

    def test_bad_artifact_raises(self, tmp_path):
        fp = tmp_path / "junk.fsrz"
        fp.write_bytes(b"not a zip at all")
        with pytest.raises(ValueError):
            load_artifact(fp)

    def test_missing_artifact_raises(self, tmp_path):
        with pytest.raises(AssertionError):
            load_artifact(tmp_path / "missing.fsrz")


class TestEngineContract:
    def test_abc_cannot_instantiate(self):
        with pytest.raises(TypeError):
            EngineBase()

    def test_contract_resolution(self, tiny_engine):
        c = tiny_engine.contract
        assert isinstance(c, ModelIOContract)
        assert c.depth_input_name == "depth_lr"
        assert c.dem_input_name == "dem_hr"
        assert c.depth_lr_hwc == (8, 8, 1)
        assert c.dem_hr_hwc == (32, 32, 1)
        assert c.output_hwc == (32, 32, 1)
        assert c.scale == 4

    def test_missing_model_raises(self, tmp_path):
        with pytest.raises(AssertionError):
            EngineJAX(tmp_path / "none.fsrz")


class TestEngineRunTile:
    def _inputs(self, seed=0):
        rng = np.random.default_rng(seed)
        depth = rng.uniform(0, 3, (8, 8)).astype(np.float32)
        dem = rng.uniform(500, 1000, (32, 32)).astype(np.float32)
        return depth, dem

    def test_result_keys_and_ranges(self, tiny_engine):
        depth, dem = self._inputs()
        r = tiny_engine.run_tile(depth, dem)
        assert set(r) == {"prediction_m", "prediction_norm", "dem_stats_used", "runtime_s"}
        assert r["prediction_m"].shape == (32, 32)
        assert r["prediction_m"].dtype == np.float32
        assert r["prediction_m"].min() >= 0.0
        assert r["prediction_m"].max() <= 5.0
        assert r["dem_stats_used"]["dem_min"] <= r["dem_stats_used"]["dem_max"]
        assert r["runtime_s"] > 0

    def test_determinism_on_repeat(self, tiny_engine):
        depth, dem = self._inputs(3)
        r1 = tiny_engine.run_tile(depth, dem)
        r2 = tiny_engine.run_tile(depth, dem)
        np.testing.assert_array_equal(r1["prediction_m"], r2["prediction_m"])

    def test_nodata_replacement(self, tiny_engine):
        depth, dem = self._inputs(4)
        depth[0, :4] = -9999.0
        r = tiny_engine.run_tile(depth, dem, depth_lr_nodata=-9999.0)
        assert np.isfinite(r["prediction_m"]).all()

    def test_normalized_passthrough_validates_range(self, tiny_engine):
        depth = np.full((8, 8), 1.5, np.float32)  # out of [0,1]
        dem = np.full((32, 32), 0.5, np.float32)
        with pytest.raises(AssertionError):
            tiny_engine.run_tile(depth, dem, normalize_inputs=False)

    def test_normalized_passthrough_runs(self, tiny_engine):
        depth = np.full((8, 8), 0.5, np.float32)
        dem = np.full((32, 32), 0.5, np.float32)
        r = tiny_engine.run_tile(depth, dem, normalize_inputs=False)
        assert r["dem_stats_used"] == {"p_clip": 95.0, "dem_min": 0.0, "dem_max": 1.0}

    def test_ref_stats_path(self, tiny_engine):
        depth, dem = self._inputs(5)
        stats = {"p_clip": 1000.0, "dem_min": 500.0, "dem_max": 1000.0}
        r = tiny_engine.run_tile(depth, dem, dem_ref_stats=stats)
        assert r["dem_stats_used"] == stats

    def test_wrong_tile_shape_raises(self, tiny_engine):
        with pytest.raises(AssertionError):
            tiny_engine.run_tile(
                np.zeros((16, 16), np.float32), np.zeros((32, 32), np.float32)
            )

    def test_nonfinite_rejected(self, tiny_engine):
        depth, dem = self._inputs(6)
        depth[0, 0] = np.nan
        with pytest.raises(AssertionError):
            tiny_engine.run_tile(depth, dem)


class TestEngineRunTiles:
    def test_batched_matches_single(self, tiny_engine):
        rng = np.random.default_rng(9)
        depth = rng.uniform(0, 3, (5, 8, 8)).astype(np.float32)
        dem = rng.uniform(400, 900, (5, 32, 32)).astype(np.float32)
        batched = tiny_engine.run_tiles(depth, dem)
        for i in range(5):
            single = tiny_engine.run_tile(depth[i], dem[i])
            # Batch-size-dependent XLA scheduling reorders f32 accumulation;
            # 5e-5 m is 20x inside the 1e-3 m parity budget.
            np.testing.assert_allclose(
                batched["predictions_m"][i], single["prediction_m"], atol=5e-5
            )
            np.testing.assert_allclose(
                batched["dem_stats_used"]["p_clip"][i],
                single["dem_stats_used"]["p_clip"],
                rtol=1e-6,
            )

    def test_bf16_path_runs(self, tiny_artifact):
        eng = EngineJAX(tiny_artifact, compute_dtype="bfloat16", max_batch=2)
        rng = np.random.default_rng(9)
        depth = rng.uniform(0, 3, (2, 8, 8)).astype(np.float32)
        dem = rng.uniform(400, 900, (2, 32, 32)).astype(np.float32)
        r = eng.run_tiles(depth, dem)
        assert r["predictions_m"].dtype == np.float32
        assert np.isfinite(r["predictions_m"]).all()
        eng.close()

    def test_uint16_transfer_matches_f32_within_quantization(self, tiny_artifact):
        rng = np.random.default_rng(12)
        depth = rng.uniform(0, 3, (16, 16)).astype(np.float32)
        dem = rng.uniform(300, 800, (64, 64)).astype(np.float32)

        outs = {}
        for transfer in ("float32", "uint16"):
            eng = EngineJAX(tiny_artifact, max_batch=4, output_transfer=transfer)
            out, _ = eng.run_scene(
                depth, dem,
                stride_hr=24, overlap_hr=8,
                max_depth=5.0, dem_pct_clip=95.0, crop_shape=(64, 64),
            )
            outs[transfer] = out
            eng.close()
        # Quantization step is 5/65535 ≈ 7.6e-5 m; half-step rounding error.
        assert np.abs(outs["uint16"] - outs["float32"]).max() <= 5.0 / 65535.0
        # Low-depth mask holds in both paths.
        for out in outs.values():
            nonzero = out[out > 0]
            assert (nonzero >= 1e-3).all()

    @pytest.mark.parametrize("crop_w", [64, 63])
    def test_uint12_transfer_matches_f32_within_quantization(
        self, tiny_artifact, crop_w
    ):
        """Packed 12-bit D2H (engine/jax_engine.py::_row_slice_pack12_fn).

        Reference contract: same output as the reference worker's float path
        (/root/reference/floodsr/models/ResUNet_16x_DEM.py:250-294) up to the
        declared quantization step. The odd ``crop_w`` exercises the pad
        column inside the pack program. ``low_depth_mask_m=0`` keeps the
        bound clean of mask-threshold flips right at 1e-3 m.
        """
        rng = np.random.default_rng(12)
        depth = rng.uniform(0, 3, (16, 16)).astype(np.float32)
        dem = rng.uniform(300, 800, (64, crop_w)).astype(np.float32)

        outs = {}
        for transfer in ("float32", "uint12"):
            eng = EngineJAX(tiny_artifact, max_batch=4, output_transfer=transfer)
            out, _ = eng.run_scene(
                depth, dem,
                stride_hr=24, overlap_hr=8,
                max_depth=5.0, dem_pct_clip=95.0, crop_shape=(64, crop_w),
                low_depth_mask_m=0.0,
            )
            outs[transfer] = out
            eng.close()
        assert outs["uint12"].shape == (64, crop_w)
        # 12-bit step is 5/4095 ≈ 1.22e-3 m; half-step rounding plus the
        # uint16 intermediate's half-step — allow one full 12-bit step.
        assert np.abs(outs["uint12"] - outs["float32"]).max() <= 5.0 / 4095.0

    def test_unpack12_inverts_reference_packing(self):
        """Host unpack is the exact inverse of the device pack layout."""
        rng = np.random.default_rng(3)
        codes = rng.integers(0, 4096, (7, 10), np.uint16)
        a, b = codes[:, 0::2].astype(np.uint16), codes[:, 1::2].astype(np.uint16)
        packed = np.stack(
            [
                (a >> 4).astype(np.uint8),
                (((a & 0xF) << 4) | (b >> 8)).astype(np.uint8),
                (b & 0xFF).astype(np.uint8),
            ],
            axis=-1,
        ).reshape(7, -1)
        out = EngineJAX._unpack12(packed, 9, 2.0)  # odd cols: drop pad column
        np.testing.assert_array_equal(out, codes[:, :9].astype(np.float32) * 2.0)

    def test_close_releases(self, tiny_artifact):
        eng = EngineJAX(tiny_artifact)
        eng.close()
        with pytest.raises(AssertionError):
            eng.run_tiles(np.zeros((1, 8, 8), np.float32), np.zeros((1, 32, 32), np.float32))


class TestTileSizeOverride:
    """Fully-convolutional window override (tile_lr != trained tile).

    The native ResUNet applies the same weights at any LR window divisible
    by 2^levels — the reference's fixed-shape tf2onnx graph cannot. Parity
    anchor: a scene that is EXACTLY ONE override window must equal the
    direct normalize → forward → invert → clip composition.
    """

    def test_single_window_scene_matches_direct_forward(self, tiny_artifact):
        import jax.numpy as jnp

        from floodsr_tpu.ops.normalize import (
            invert_depth_log1p,
            normalize_dem_batch,
            scale_depth_log1p,
        )

        tile_lr, scale = 16, TINY_CFG.scale  # one 64x64 HR window
        crop = (tile_lr * scale, tile_lr * scale)
        rng = np.random.default_rng(7)
        depth = rng.uniform(0, 3, (tile_lr, tile_lr)).astype(np.float32)
        dem = rng.uniform(300, 800, crop).astype(np.float32)

        eng = EngineJAX(tiny_artifact, max_batch=4, output_transfer="float32")
        out, stats = eng.run_scene(
            depth, dem, stride_hr=crop[0], overlap_hr=0,
            max_depth=5.0, dem_pct_clip=95.0, crop_shape=crop,
            tile_lr=tile_lr, low_depth_mask_m=0.0,
        )
        assert len(stats["p_clip"]) == 1  # exactly one window

        depth_n = scale_depth_log1p(jnp.asarray(depth)[None], 5.0)
        dem_n, _ = normalize_dem_batch(jnp.asarray(dem)[None], 95.0)
        pred, _ = resunet_apply(
            *_load_pytrees(tiny_artifact), depth_n[..., None],
            dem_n[..., None], TINY_CFG, train=False,
            precision="f32",  # the engine's default policy
        )
        expected = np.clip(
            np.asarray(invert_depth_log1p(pred[0, ..., 0], 5.0)), 0.0, 5.0
        )
        # atol 1e-4: the two-phase executor's trunk/tail split reassociates
        # f32 ops vs the fused apply (measured ~3e-5); far under the 1e-3 m
        # pipeline gate.
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-4, rtol=0)
        eng.close()

    def test_override_changes_window_count(self, tiny_artifact):
        rng = np.random.default_rng(8)
        depth = rng.uniform(0, 3, (16, 16)).astype(np.float32)
        dem = rng.uniform(300, 800, (64, 64)).astype(np.float32)
        eng = EngineJAX(tiny_artifact, max_batch=4)
        _, stats8 = eng.run_scene(
            depth, dem, stride_hr=32, overlap_hr=0,
            max_depth=5.0, dem_pct_clip=95.0, crop_shape=(64, 64),
        )
        _, stats16 = eng.run_scene(
            depth, dem, stride_hr=64, overlap_hr=0,
            max_depth=5.0, dem_pct_clip=95.0, crop_shape=(64, 64),
            tile_lr=16,
        )
        assert len(stats8["p_clip"]) == 4 and len(stats16["p_clip"]) == 1
        eng.close()

    def test_non_divisible_override_raises(self, tiny_engine):
        with pytest.raises(AssertionError, match="2\\^levels"):
            tiny_engine.scene_config(10)  # divisor is 2^2=4

    def test_graph_executor_rejects_override(self, tiny_engine, monkeypatch):
        monkeypatch.setattr(
            tiny_engine, "_forward_override", lambda *a: None, raising=False
        )
        assert not tiny_engine.supports_tile_override()
        with pytest.raises(AssertionError, match="fully-convolutional"):
            tiny_engine.scene_config(16)


def _load_pytrees(artifact_fp):
    art = load_artifact(artifact_fp)
    return art["params"], art["state"]


class TestRunTilesRefStatsValidation:
    def test_zero_range_ref_stats_raise(self, tiny_engine):
        depth = np.zeros((1, 8, 8), np.float32)
        dem = np.zeros((1, 32, 32), np.float32)
        bad = {"p_clip": 5.0, "dem_min": 5.0, "dem_max": 5.0}
        with pytest.raises(AssertionError, match="range"):
            tiny_engine.run_tiles(depth, dem, dem_ref_stats=bad)

    def test_non_finite_ref_stats_raise(self, tiny_engine):
        depth = np.zeros((1, 8, 8), np.float32)
        dem = np.zeros((1, 32, 32), np.float32)
        bad = {"p_clip": float("nan"), "dem_min": 0.0, "dem_max": 1.0}
        with pytest.raises(AssertionError, match="finite"):
            tiny_engine.run_tiles(depth, dem, dem_ref_stats=bad)


class TestSceneBucketing:
    def test_second_geometry_reuses_executable(self, tiny_artifact):
        # Two distinct scene geometries landing in the same bucket must hit
        # the same compiled executable (no new compile for scene #2).
        rng = np.random.default_rng(3)
        eng = EngineJAX(tiny_artifact, max_batch=4)
        for crop in ((64, 64), (56, 48)):
            depth = rng.uniform(0, 3, (crop[0] // 4, crop[1] // 4)).astype(np.float32)
            dem = rng.uniform(300, 800, crop).astype(np.float32)
            out, _ = eng.run_scene(
                depth, dem, stride_hr=24, overlap_hr=8,
                max_depth=5.0, dem_pct_clip=95.0, crop_shape=crop,
            )
            assert out.shape == crop
        scene_keys = [k for k in eng._jit_cache if k[0] == "scene"]
        assert len(scene_keys) == 1, scene_keys
        assert eng.scene_bucket_for((64, 64)) == eng.scene_bucket_for((56, 48))
        eng.close()

    def test_bucketed_output_matches_content(self, tiny_artifact):
        # A non-bucket-aligned crop: output values on shared pixels must be
        # close to the bucket-aligned run (tiling grids coincide here).
        rng = np.random.default_rng(4)
        depth = rng.uniform(0, 3, (16, 16)).astype(np.float32)
        dem = rng.uniform(300, 800, (64, 64)).astype(np.float32)
        eng = EngineJAX(tiny_artifact, max_batch=4)
        full, _ = eng.run_scene(
            depth, dem, stride_hr=24, overlap_hr=8,
            max_depth=5.0, dem_pct_clip=95.0, crop_shape=(64, 64),
        )
        assert np.isfinite(full).all() and full.shape == (64, 64)
        eng.close()


class TestTwoPhaseSceneExecutor:
    def _run(self, tiny_artifact, trunk_chunk):
        rng = np.random.default_rng(11)
        depth = rng.uniform(0, 3, (16, 16)).astype(np.float32)
        dem = rng.uniform(300, 800, (64, 64)).astype(np.float32)
        eng = EngineJAX(
            tiny_artifact, max_batch=4, scene_trunk_chunk=trunk_chunk,
            output_transfer="float32",
        )
        out, stats = eng.run_scene(
            depth, dem, stride_hr=24, overlap_hr=8,
            max_depth=5.0, dem_pct_clip=95.0, crop_shape=(64, 64),
        )
        eng.close()
        return out, stats

    def test_two_phase_matches_single_phase(self, tiny_artifact):
        """Trunk-wide phase 1 + tail phase 2 ≡ fused single-scan executor.

        The math is identical op-for-op (phase 2 reuses phase-1 stats via
        normalize_dem_with_stats, the exact function normalize_dem_batch
        composes), so outputs must agree to float rounding.
        """
        single, stats_s = self._run(tiny_artifact, trunk_chunk=0)
        double, stats_d = self._run(tiny_artifact, trunk_chunk=8)
        # 1e-4: XLA CPU emits slightly different conv reductions per batch
        # size (trunk runs batch 8 here vs the fused scan's full chunk);
        # measured worst-case 1.8e-5 m on this fixture.
        np.testing.assert_allclose(double, single, atol=1e-4, rtol=0)
        for k in stats_s:
            np.testing.assert_allclose(stats_d[k], stats_s[k], atol=1e-5)

    def test_trunk_chunk_rounds_to_capacity_divisor(self, tiny_artifact):
        # capacity here is small; an oversized trunk_chunk must still work.
        out, _ = self._run(tiny_artifact, trunk_chunk=1000)
        assert np.isfinite(out).all()


class TestHalfPrecisionStorage:
    def test_float16_artifact_roundtrip(self, tmp_path):
        from floodsr_tpu.nn import ResUNetConfig, init_resunet
        from floodsr_tpu.nn.checkpoint import load_artifact, save_artifact

        cfg = ResUNetConfig(
            base_filters=8, levels=2, enc_blocks=1, dec_blocks=1,
            fuse_filters=8, fuse_blocks=1, scale=4, lr_tile=8,
        )
        params, state = init_resunet(3, cfg)
        f32_fp = tmp_path / "w32.fsrz"
        f16_fp = tmp_path / "w16.fsrz"
        save_artifact(f32_fp, cfg, params, state)
        save_artifact(f16_fp, cfg, params, state, store_dtype="float16")
        assert f16_fp.stat().st_size < f32_fp.stat().st_size * 0.75

        art = load_artifact(f16_fp)
        assert art["manifest"]["store_dtype"] == "float16"
        import jax
        for got, want in zip(jax.tree.leaves(art["params"]), jax.tree.leaves(params)):
            assert got.dtype == np.float32
            np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-4)


class TestArtifactDeterminism:
    """Artifact bytes must be a pure function of the weights.

    The sha256 digest keys both registry checksums and the AOT executable
    cache (engine/aot_cache.py); a wall-clock timestamp anywhere in the zip
    (outer members or the nested npz members) would give every process a
    fresh digest — which silently defeated cross-process executable reuse
    for freshly-written artifacts (bench.py paid a full scene compile every
    run despite a populated cache).
    """

    def _save(self, fp):
        from floodsr_tpu.nn import ResUNetConfig, init_resunet
        from floodsr_tpu.nn.checkpoint import save_artifact

        cfg = ResUNetConfig(
            base_filters=8, levels=2, enc_blocks=1, dec_blocks=1,
            fuse_filters=8, fuse_blocks=1, scale=4, lr_tile=8,
        )
        params, state = init_resunet(7, cfg)
        save_artifact(fp, cfg, params, state, {"seed": 7, "purpose": "det"})
        return cfg, params

    def test_repeat_saves_are_byte_identical(self, tmp_path):
        a, b = tmp_path / "a.fsrz", tmp_path / "b.fsrz"
        self._save(a)
        self._save(b)
        assert a.read_bytes() == b.read_bytes()

    def test_all_zip_members_carry_epoch_timestamps(self, tmp_path):
        # Byte-equality within one process can pass spuriously (zip time
        # resolution is 2 s); pin the mechanism itself: every member header,
        # outer and nested, must carry the fixed zip-epoch timestamp.
        import io
        import zipfile

        fp = tmp_path / "a.fsrz"
        self._save(fp)
        with zipfile.ZipFile(fp) as zf:
            for info in zf.infolist():
                assert info.date_time == (1980, 1, 1, 0, 0, 0), info.filename
                if info.filename.endswith(".npz"):
                    with zipfile.ZipFile(io.BytesIO(zf.read(info))) as inner:
                        for m in inner.infolist():
                            assert m.date_time == (1980, 1, 1, 0, 0, 0), m.filename

    def test_roundtrip_after_determinism_change(self, tmp_path):
        import jax

        from floodsr_tpu.nn.checkpoint import load_artifact

        fp = tmp_path / "a.fsrz"
        cfg, params = self._save(fp)
        art = load_artifact(fp)
        assert art["config"] == cfg
        for got, want in zip(jax.tree.leaves(art["params"]), jax.tree.leaves(params)):
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


class TestDevicePostprocess:
    """Device-side crop→dequant→resample→clip→mask→requant (round 4).

    The host streaming resample (ops.resample.StreamingSeparableResampler)
    is the behavioral twin; both paths share the _axis_interp_indices plan,
    so values agree to f32 lerp rounding plus one uint16 quantization
    round-trip (max_depth/65535 ≈ 7.6e-5 m steps).
    """

    def _run(self, tiny_artifact, monkeypatch, enabled, transfer="float32"):
        monkeypatch.setenv("FLOODSR_DEVICE_POSTPROC", "1" if enabled else "0")
        from floodsr_tpu.io.affine import from_origin

        rng = np.random.default_rng(21)
        depth = rng.uniform(0, 3, (16, 16)).astype(np.float32)
        dem = rng.uniform(300, 800, (64, 64)).astype(np.float32)
        # model space 64x64 @1.875 m -> raw grid 60x60 @2.0 m (bench shape)
        src_t = from_origin(0.0, 120.0, 1.875, 1.875)
        dst_t = from_origin(0.0, 120.0, 2.0, 2.0)
        eng = EngineJAX(tiny_artifact, max_batch=4, output_transfer=transfer)
        out, _ = eng.run_scene(
            depth, dem, stride_hr=24, overlap_hr=8,
            max_depth=5.0, dem_pct_clip=95.0, crop_shape=(64, 64),
            post_resample=((60, 60), src_t, dst_t),
        )
        eng.close()
        return out

    def test_device_postproc_matches_host_resampler_f32(
        self, tiny_artifact, monkeypatch
    ):
        dev = self._run(tiny_artifact, monkeypatch, enabled=True)
        host = self._run(tiny_artifact, monkeypatch, enabled=False)
        assert dev.shape == host.shape == (60, 60)
        np.testing.assert_allclose(dev, host, atol=1e-5, rtol=0)

    def test_device_postproc_matches_host_resampler_uint16(
        self, tiny_artifact, monkeypatch
    ):
        dev = self._run(tiny_artifact, monkeypatch, enabled=True, transfer="uint16")
        host = self._run(tiny_artifact, monkeypatch, enabled=False, transfer="uint16")
        # one extra quantization round-trip on the device path
        np.testing.assert_allclose(dev, host, atol=2 * 5.0 / 65535.0, rtol=0)

    def test_device_postproc_applies_low_depth_mask(
        self, tiny_artifact, monkeypatch
    ):
        out = self._run(tiny_artifact, monkeypatch, enabled=True)
        tiny = (out > 0) & (out < 1e-3)
        assert not tiny.any()  # sub-threshold depths were zeroed on device
