"""Round-4 HR-tail kernel A/B: preshift vs im2col vs XLA at flagship geometry.

VERDICT round-3 #3 asks for a second focused attempt at the fused tail
before accepting 54% whole-pipeline MFU as the ceiling. This study times,
on the real TPU:

1. the tail in isolation (concat + fuse blocks + head at 128² × 128ch, the
   96%-of-MACs stage) — stock XLA (Precision.HIGH) vs the Pallas kernel in
   both formulations across row-band sizes;
2. the full two-phase scene composition (production executor geometry:
   4096² bucket, 3840² content, feather 121 tiles / hard 64 tiles) with the
   winning kernel variants vs the shipped XLA default.

Results print as one JSON line per segment; paste the summary into
``docs/perf/kernel_study.json`` (round-4 section) and ``docs/perf/ceiling.md``.

Run on the TPU host: ``python bin/hr_tail_study.py``.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _force(out) -> float:
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def best_of(fn, *args, reps: int = 5, iters: int = 16) -> float:
    """Best per-call wall time; queued async dispatch, one readback per trial."""
    _force(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        _force(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--skip-scene", action="store_true")
    args = ap.parse_args()

    from floodsr_tpu.nn import ResUNetConfig, init_resunet
    from floodsr_tpu.nn.resunet import _conv, _res_block
    from floodsr_tpu.ops.pallas.hr_tail import hr_tail_pallas, pack_hr_tail_weights

    print(f"backend: {jax.default_backend()} {jax.devices()}", file=sys.stderr)

    cfg = ResUNetConfig()  # flagship defaults: f=32, s2d=4, scale=16
    params, state = init_resunet(0, cfg)
    params = jax.device_put(params)
    state = jax.device_put(state)

    tile = cfg.hr_tile
    s2d = cfg.hr_s2d
    th = tile // s2d  # 128
    hrw = cfg.base_filters * s2d  # 128 sr-feature channels
    rng = np.random.default_rng(0)

    weights = pack_hr_tail_weights(
        {"params": params["fuse"][0], "state": state["fuse"][0]},
        {"params": params["fuse"][1], "state": state["fuse"][1]},
        params["head"],
        bn_eps=cfg.bn_eps,
    )

    results: dict[str, float] = {}

    def report(name, dt, mp=None):
        results[name] = dt
        line = {"segment": name, "ms": round(dt * 1e3, 2)}
        if mp is not None:
            line["mp_per_s"] = round(mp / dt, 1)
        print(json.dumps(line))
        sys.stdout.flush()

    # MAC floor for context: per tile the tail is ~10.712 GMAC (ceiling.md);
    # bf16x3 => 3 passes; v5e peak 197 TF/s of bf16 MACs*2.
    def floor_ms(batch):
        return 3 * 2 * 10.712e9 * batch / 197e12 * 1e3

    # ---- tail isolation ---------------------------------------------------
    def tail_xla(a, b):
        x = jnp.concatenate([a, b], axis=-1)
        for bp, bs in zip(params["fuse"], state["fuse"]):
            x, _ = _res_block(bp, bs, x, cfg, train=False)
        return _conv(params["head"], x.astype(jnp.float32))

    for batch in (64, 128):
        sr_feat = jnp.asarray(rng.normal(0, 1, (batch, th, th, hrw)).astype(np.float32))
        dem_feat = jnp.asarray(
            rng.normal(0, 1, (batch, th, th, cfg.fuse_filters)).astype(np.float32)
        )
        mp = batch * tile * tile / 1e6
        print(
            json.dumps({"segment": f"tail_b{batch}_mac_floor", "ms": round(floor_ms(batch), 2)})
        )

        f = jax.jit(tail_xla)
        print(f"# compiling tail b{batch} xla...", file=sys.stderr)
        report(f"tail_b{batch}_xla", best_of(f, sr_feat, dem_feat, reps=args.reps), mp)

        for formulation in ("preshift", "im2col"):
            bands = (16, 32, 64) if formulation == "preshift" else (32,)
            for band in bands:
                f = jax.jit(
                    lambda a, b, _b=band, _f=formulation: hr_tail_pallas(
                        a, b, *weights, band=_b, formulation=_f
                    )
                )
                name = f"tail_b{batch}_{formulation}_band{band}"
                print(f"# compiling {name}...", file=sys.stderr)
                try:
                    dt = best_of(f, sr_feat, dem_feat, reps=args.reps)
                except Exception as e:  # VMEM overflow etc: record, keep going
                    print(json.dumps({"segment": name, "error": str(e)[:200]}))
                    continue
                report(name, dt, mp)

        # numeric agreement (hardware, x3 vs XLA HIGH)
        a = np.asarray(hr_tail_pallas(sr_feat, dem_feat, *weights, band=32))
        b = np.asarray(jax.jit(tail_xla)(sr_feat, dem_feat))
        print(
            json.dumps(
                {
                    f"tail_b{batch}_pallas_vs_xla": {
                        "max_abs": float(np.max(np.abs(a - b))),
                        "rmse": float(np.sqrt(np.mean((a - b) ** 2))),
                    }
                }
            )
        )

    if args.skip_scene:
        return 0

    # ---- scene composition (two-phase production executor) ----------------
    import os

    from floodsr_tpu.engine.scene import build_scene_executor, pack_scene_indices
    from floodsr_tpu.nn.resunet import resunet_tail_apply, resunet_trunk_apply
    from floodsr_tpu.tiling import build_window_grid

    bucket = (4096, 4096)
    content = 3840  # rss_mersch_A content; grid is tile-padded to the bucket
    scale = cfg.scale
    dem = jnp.asarray(rng.normal(300, 20, bucket).astype(np.float32))
    depth = jnp.asarray(
        rng.uniform(0, 3, (bucket[0] // scale, bucket[1] // scale)).astype(np.float32)
    )
    out_mp = content * content / 1e6

    def trunk(p, s, d, m):
        feat, _ = resunet_trunk_apply(
            p, s, d, m, cfg, train=False, compute_dtype=jnp.float32
        )
        return feat

    def make_tail(pallas: bool):
        def tail(p, s, feat, m):
            out, _ = resunet_tail_apply(
                p, s, feat, m, cfg, train=False, compute_dtype=jnp.float32,
                pallas_tail=pallas,
            )
            return out

        return tail

    for mode_name, overlap in (("feather", 8 * scale), ("hard", 0)):
        stride = tile - overlap
        # Production geometry: content is tile-padded to the bucket, so the
        # grid IS the bucket grid (feather: 121 tiles; hard: 64).
        grid = build_window_grid(bucket[0], bucket[1], tile, stride)
        n_tiles = len(grid["y0"])
        variants = [("xla", False, None, None)]
        for form in ("preshift", "im2col"):
            for band in ((16, 32) if form == "preshift" else (32,)):
                variants.append((f"{form}_band{band}", True, form, band))
        for label, pallas, form, band in variants:
            if form:
                os.environ["FLOODSR_HR_TAIL_FORMULATION"] = form
                os.environ["FLOODSR_HR_TAIL_BAND"] = str(band)
            # PRODUCTION chunk (128 for the feather grid). An earlier
            # revision used min(128, n_tiles)=121, which silently measured a
            # non-production config — and uncovered that XLA's tail conv
            # collapses at odd batch (121: 106 ms vs 78.6 at 128) while the
            # Pallas kernel is immune (its grid iterates per tile). See
            # docs/perf/kernel_study.json round_4 section.
            from floodsr_tpu.engine.scene import choose_scene_chunk

            chunk = choose_scene_chunk(n_tiles, 128)
            capacity = -(-n_tiles // chunk) * chunk
            idx = jax.tree.map(jnp.asarray, pack_scene_indices(grid, capacity, chunk))
            fn, _ = build_scene_executor(
                cfg,
                scene_shape=bucket,
                capacity=capacity,
                overlap_hr=overlap,
                chunk=chunk,
                max_depth=5.0,
                dem_pct_clip=95.0,
                split_forward=(trunk, make_tail(pallas)),
                trunk_chunk=capacity,
                transfer_dtype="uint16",
            )
            name = f"scene_{mode_name}_{n_tiles}t_{label}"
            print(f"# compiling {name}...", file=sys.stderr)
            try:
                dt = best_of(fn, params, state, depth, dem, idx, reps=args.reps)
            except Exception as e:
                print(json.dumps({"segment": name, "error": str(e)[:200]}))
                continue
            report(name, dt, out_mp)
            os.environ.pop("FLOODSR_HR_TAIL_FORMULATION", None)
            os.environ.pop("FLOODSR_HR_TAIL_BAND", None)

    return 0


if __name__ == "__main__":
    raise SystemExit(main())
