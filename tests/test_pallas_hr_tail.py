"""Fused HR-tail Pallas kernel vs the unfused resunet chain (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from floodsr_tpu.nn.resunet import ResUNetConfig, _conv, _res_block, init_resunet
from floodsr_tpu.ops.pallas.hr_tail import hr_tail_pallas, pack_hr_tail_weights

pytestmark = pytest.mark.unit


def _setup(f=8, seed=4):
    cfg = ResUNetConfig(
        base_filters=f, levels=2, enc_blocks=1, dec_blocks=1,
        fuse_filters=f, fuse_blocks=2, scale=4, lr_tile=16, hr_s2d=2,
    )
    params, state = init_resunet(seed, cfg)
    return cfg, params, state


def _reference_tail(cfg, params, state, sr_feat, dem_feat):
    x = jnp.concatenate([sr_feat, dem_feat], axis=-1)
    for bp, bs in zip(params["fuse"], state["fuse"]):
        x, _ = _res_block(bp, bs, x, cfg, train=False)
    return _conv(params["head"], x.astype(jnp.float32))


def _pack(cfg, params, state):
    f1 = {"params": params["fuse"][0], "state": state["fuse"][0]}
    f2 = {"params": params["fuse"][1], "state": state["fuse"][1]}
    return pack_hr_tail_weights(f1, f2, params["head"], bn_eps=cfg.bn_eps)


class TestHrTailKernel:
    def test_matches_unfused_chain(self):
        cfg, params, state = _setup()
        hr_w = cfg.base_filters * cfg.hr_s2d
        rng = np.random.default_rng(0)
        b, h, w = 2, 64, 128
        sr = jnp.asarray(rng.normal(0, 1, (b, h, w, hr_w)).astype(np.float32))
        dem = jnp.asarray(rng.normal(0, 1, (b, h, w, cfg.fuse_filters)).astype(np.float32))

        want = np.asarray(_reference_tail(cfg, params, state, sr, dem))
        got = np.asarray(
            hr_tail_pallas(sr, dem, *_pack(cfg, params, state), band=16, interpret=True)
        )
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)

    def test_bf16_mode_close_to_f32(self):
        # The single-pass bf16 mode (opt-in fast path) must track the f32
        # result within bf16 resolution; the head stays high-precision.
        cfg, params, state = _setup()
        hr_w = cfg.base_filters * cfg.hr_s2d
        rng = np.random.default_rng(2)
        b, h, w = 2, 32, 128
        sr = jnp.asarray(rng.normal(0, 1, (b, h, w, hr_w)).astype(np.float32))
        dem = jnp.asarray(rng.normal(0, 1, (b, h, w, cfg.fuse_filters)).astype(np.float32))
        weights = _pack(cfg, params, state)
        exact = np.asarray(hr_tail_pallas(sr, dem, *weights, band=16, interpret=True))
        got = np.asarray(
            hr_tail_pallas(sr, dem, *weights, band=16, interpret=True, mode="bf16")
        )
        assert got.shape == exact.shape
        scale = max(1.0, float(np.abs(exact).max()))
        assert float(np.abs(got - exact).max()) / scale < 0.15  # bf16-resolution drift
        assert float(np.sqrt(np.mean((got - exact) ** 2))) / scale < 0.02

    def test_formulations_agree(self):
        # im2col and preshift must agree to f32 rounding in every mode that
        # runs on hardware, including the paired-weight bf16-pass modes and
        # the whole-tile band (band == h: halo views clamp, affine_relu
        # zeroes the out-of-image rows).
        cfg, params, state = _setup(seed=7)
        hr_w = cfg.base_filters * cfg.hr_s2d
        rng = np.random.default_rng(3)
        b, h, w = 1, 32, 128
        sr = jnp.asarray(rng.normal(0, 1, (b, h, w, hr_w)).astype(np.float32))
        dem = jnp.asarray(rng.normal(0, 1, (b, h, w, cfg.fuse_filters)).astype(np.float32))
        weights = _pack(cfg, params, state)
        want = np.asarray(_reference_tail(cfg, params, state, sr, dem))
        for mode, tol in (("f32", 3e-5), ("x3", 3e-3), ("x2", 0.2), ("bf16", 0.5)):
            outs = {}
            for formulation in ("im2col", "preshift", "winograd"):
                # Winograd's F(2×2,3×3) transform adds ~1.7× the direct
                # formulations' f32/bf16x3 rounding (measured in the numerics
                # prototype; docstring) — same order, slightly looser gate.
                ftol = tol * (4 if formulation == "winograd" else 1)
                for band in (8, h):
                    got = np.asarray(
                        hr_tail_pallas(
                            sr, dem, *weights, band=band, interpret=True,
                            mode=mode, formulation=formulation,
                        )
                    )
                    np.testing.assert_allclose(
                        got, want, atol=ftol, rtol=ftol,
                        err_msg=f"{mode}/{formulation}/band={band} vs f32 chain",
                    )
                    outs[formulation, band] = got
            # The formulations differ only in f32 summation order (im2col
            # sums taps inside each pass's matmul accumulator; preshift
            # accumulates tap partials; winograd sums in the transformed
            # domain) — in the non-compounding modes they must agree to that
            # rounding, far tighter than the chain tolerance. The lossy
            # x2/bf16 modes re-split activations per layer, so a 1-ulp order
            # difference flips bf16 roundings whose dropped low terms land
            # in the output — only the chain check above is meaningful there.
            if mode in ("f32", "x3"):
                np.testing.assert_allclose(
                    outs["im2col", 8], outs["preshift", 8], atol=5e-4, rtol=5e-4,
                    err_msg=f"formulation mismatch in mode {mode}",
                )
                np.testing.assert_allclose(
                    outs["winograd", 8], outs["preshift", 8], atol=2e-3, rtol=2e-3,
                    err_msg=f"winograd formulation mismatch in mode {mode}",
                )

    def test_unknown_formulation_rejected(self):
        cfg, params, state = _setup()
        hr_w = cfg.base_filters * cfg.hr_s2d
        sr = jnp.zeros((1, 16, 128, hr_w), jnp.float32)
        dem = jnp.zeros((1, 16, 128, cfg.fuse_filters), jnp.float32)
        with pytest.raises(ValueError, match="formulation"):
            hr_tail_pallas(
                sr, dem, *_pack(cfg, params, state),
                band=16, interpret=True, formulation="strassen",
            )

    def test_band_edges_and_single_band(self):
        # One band (no interior halo) and tall-many-bands must both match.
        cfg, params, state = _setup(seed=9)
        hr_w = cfg.base_filters * cfg.hr_s2d
        rng = np.random.default_rng(1)
        weights = _pack(cfg, params, state)
        for b, h, w, band in ((1, 16, 128, 16), (1, 96, 128, 8)):
            sr = jnp.asarray(rng.normal(0, 1, (b, h, w, hr_w)).astype(np.float32))
            dem = jnp.asarray(
                rng.normal(0, 1, (b, h, w, cfg.fuse_filters)).astype(np.float32)
            )
            want = np.asarray(_reference_tail(cfg, params, state, sr, dem))
            got = np.asarray(hr_tail_pallas(sr, dem, *weights, band=band, interpret=True))
            np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5, err_msg=str((h, band)))


class TestResunetIntegration:
    def test_apply_with_pallas_tail_matches(self):
        from floodsr_tpu.nn.resunet import resunet_apply

        cfg, params, state = _setup(seed=3)
        rng = np.random.default_rng(5)
        depth = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 1)).astype(np.float32))
        dem = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 1)).astype(np.float32))
        want, _ = resunet_apply(params, state, depth, dem, cfg, pallas_tail=False)
        got, _ = resunet_apply(params, state, depth, dem, cfg, pallas_tail=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)
