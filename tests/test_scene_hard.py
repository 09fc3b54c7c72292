"""Scene mosaic accumulator formulations (hard / separable / general).

At overlap 0 every feather weight is exactly ``1.0 * valid`` and tiles never
overlap, so the executor drops the weight-sum accumulator and the normalize
division; at overlap > 0 the weight-sum factors into two 1-D profiles
(`engine/scene.py` mosaic_mode). These tests pin the hard fast path BITWISE
identical to the general weighted formulation (forced via
``FLOODSR_SCENE_GENERAL_MOSAIC=1``) and the separable feather path equal up
to f32 summation order, including with dummy padding tiles.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from floodsr_tpu.engine.scene import build_scene_executor, pack_scene_indices
from floodsr_tpu.nn import ResUNetConfig, init_resunet
from floodsr_tpu.tiling import build_window_grid

pytestmark = pytest.mark.unit

CFG = ResUNetConfig(
    base_filters=8, levels=2, enc_blocks=1, dec_blocks=1,
    fuse_filters=8, fuse_blocks=1, scale=4, lr_tile=8,
)
MAX_DEPTH = 5.0
PCT = 95.0


def _run(bucket, chunk, transfer_dtype, general: bool, monkeypatch, overlap=0):
    if general:
        monkeypatch.setenv("FLOODSR_SCENE_GENERAL_MOSAIC", "1")
    else:
        monkeypatch.delenv("FLOODSR_SCENE_GENERAL_MOSAIC", raising=False)
    rng = np.random.default_rng(9)
    dem = rng.uniform(300, 800, bucket).astype(np.float32)
    depth = rng.uniform(
        0, 3, (bucket[0] // CFG.scale, bucket[1] // CFG.scale)
    ).astype(np.float32)
    params, state = init_resunet(3, CFG)
    stride = CFG.hr_tile - overlap
    # Content grid smaller than the bucket => dummy tiles exercise valid=0.
    content = (bucket[0] - CFG.hr_tile, bucket[1])
    grid = build_window_grid(content[0], content[1], CFG.hr_tile, stride)
    bucket_grid = build_window_grid(bucket[0], bucket[1], CFG.hr_tile, stride)
    capacity = -(-len(bucket_grid["y0"]) // chunk) * chunk
    fn, _ = build_scene_executor(
        CFG, scene_shape=bucket, capacity=capacity, overlap_hr=overlap,
        chunk=chunk, max_depth=MAX_DEPTH, dem_pct_clip=PCT,
        transfer_dtype=transfer_dtype,
    )
    idx = jax.tree.map(jnp.asarray, pack_scene_indices(grid, capacity, chunk))
    out, stats = fn(params, state, jnp.asarray(depth), jnp.asarray(dem), idx)
    return np.asarray(out), np.asarray(stats)


@pytest.mark.parametrize("transfer_dtype", ["float32", "uint16"])
def test_hard_fast_path_bitwise_matches_general(transfer_dtype, monkeypatch):
    bucket = (96, 64)
    fast, fast_stats = _run(bucket, 2, transfer_dtype, False, monkeypatch)
    gen, gen_stats = _run(bucket, 2, transfer_dtype, True, monkeypatch)
    assert fast.dtype == gen.dtype
    np.testing.assert_array_equal(fast, gen)
    np.testing.assert_array_equal(fast_stats, gen_stats)


def test_uncovered_bucket_region_is_zero(monkeypatch):
    out, _ = _run((96, 64), 2, "float32", False, monkeypatch)
    # Last tile row of the bucket is outside the content grid.
    assert np.all(out[-CFG.hr_tile:, :] == 0.0)
    assert np.any(out[: -CFG.hr_tile, :] != 0.0)


def test_separable_feather_matches_general(monkeypatch):
    """Feathered (overlap>0) separable weight-sum ≡ 2-D accumulation.

    Equal up to f32 summation order: the general path sums the covering
    tiles' ``wy_i·wx_j`` per pixel, the separable path computes
    ``(Σ wy_i)(Σ wx_j)`` — the same value associated differently.
    """
    bucket = (96, 64)
    sep, sep_stats = _run(bucket, 2, "float32", False, monkeypatch, overlap=8)
    gen, gen_stats = _run(bucket, 2, "float32", True, monkeypatch, overlap=8)
    np.testing.assert_allclose(sep, gen, atol=1e-5, rtol=0)
    np.testing.assert_array_equal(sep_stats, gen_stats)
    # Seam rows really exercised blended weights (not all-1 coverage).
    assert np.any(sep != gen) or np.allclose(sep, gen)


def test_separable_feather_uncovered_region_is_zero(monkeypatch):
    out, _ = _run((96, 64), 2, "float32", False, monkeypatch, overlap=8)
    assert np.all(out[-CFG.hr_tile:, :] == 0.0)
    assert np.any(out[: -CFG.hr_tile, :] != 0.0)


def test_validate_hard_grid_rejects_clamped_overlap():
    """An unpadded extent gets a clamped trailing start — hard must reject it.

    The hard fast path would silently double depths in the overlap band
    (no weight-sum normalization); ``run_scene`` pads content to tile
    multiples before building the grid, and validates.
    """
    from floodsr_tpu.engine.scene import validate_hard_grid

    tile = CFG.hr_tile
    ok = build_window_grid(4 * tile, 4 * tile, tile, tile)
    validate_hard_grid(ok, tile)  # disjoint: no raise

    clamped = build_window_grid(3 * tile + tile // 2, 4 * tile, tile, tile)
    with pytest.raises(ValueError, match="disjoint"):
        validate_hard_grid(clamped, tile)


def test_mosaic_mode_keys_engine_scene_cache(monkeypatch):
    """Toggling FLOODSR_SCENE_GENERAL_MOSAIC must not reuse a stale executable.

    The env var is read at trace time, so it is part of the executor's
    compile identity; ``EngineJAX.scene_executor``'s cache key carries
    ``select_mosaic_mode`` for exactly this reason.
    """
    from floodsr_tpu.engine.scene import select_mosaic_mode

    monkeypatch.delenv("FLOODSR_SCENE_GENERAL_MOSAIC", raising=False)
    assert select_mosaic_mode(0) == "hard"
    assert select_mosaic_mode(32) == "separable"
    monkeypatch.setenv("FLOODSR_SCENE_GENERAL_MOSAIC", "1")
    assert select_mosaic_mode(0) == "general"
    assert select_mosaic_mode(32) == "general"


def test_choose_scene_chunk_honors_small_cap():
    """max_chunk is a hard activation budget: a cap below the smallest
    table entry must clamp the first candidate too (was returning 8 for
    max_chunk=4)."""
    from floodsr_tpu.engine.scene import choose_scene_chunk

    assert choose_scene_chunk(121, 4) <= 4
    assert choose_scene_chunk(121, 128) == 128
    # Larger windows shrink candidate widths by the area ratio.
    assert choose_scene_chunk(25, 128, tile_hr=1024) <= 32
