"""In-program cost of each hard-scene component via lax.scan repetition.

Decomposes the hard-window flagship scene's sustained device time
(barrier_sweep: T_dev = 40.6 ms, 64 tiles) into true in-program component
costs, using the launch-floor-cancelling (T(K)-T(1))/(K-1) scan method from
``bin/trunk_profile.py`` (one-dispatch-per-iter timings bottom out at the
~5 ms dispatch floor and ~27 ms readback RTT).

Components (hard-scene shapes: batch 64, 512^2 tiles, 4096^2 bucket):
- forward: full ResUNet f32/HIGH (trunk+tail) at b64
- tail: resunet_tail_apply only (the MAC-dominant half)
- normalize: normalize_dem_batch on [64,512,512] (percentile bisection /
  Pallas tile-stats path, whichever the pipeline picks)
- gather: 64 dynamic-slice 512^2 windows from the 4096^2 scene DEM
  (phase 1 and phase 2 each pay one)

Run on the TPU host: ``python bin/scene_segment_scan.py``. Appends a
``segment_scan`` entry to docs/perf/structure_study.json.
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402


def _force(out) -> float:
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def best_of(fn, *args, reps: int = 4, iters: int = 4) -> float:
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


def scan_cost_ms(make_body, *args, k: int = 8, reps: int = 4) -> float:
    """(T(k) - T(1)) / (k - 1) for a carry-perturbed scan of ``make_body``."""

    def repeated(*a, n):
        def body(carry, _):
            out = make_body(carry, *a)
            return jnp.sum(out).astype(jnp.float32) * 1e-30, None

        c, _ = lax.scan(body, jnp.float32(0.0), None, length=n)
        return c

    t1 = best_of(jax.jit(partial(repeated, n=1)), *args, reps=reps)
    tk = best_of(jax.jit(partial(repeated, n=k)), *args, reps=reps)
    return (tk - t1) / (k - 1) * 1e3


def main() -> int:
    from floodsr_tpu.engine.scene import _gather_tiles
    from floodsr_tpu.nn import ResUNetConfig, init_resunet
    from floodsr_tpu.nn.resunet import (
        resunet_apply,
        resunet_tail_apply,
        resunet_trunk_apply,
    )
    from floodsr_tpu.ops.normalize import normalize_dem_batch

    print(f"backend: {jax.default_backend()} {jax.devices()}", file=sys.stderr)
    cfg = ResUNetConfig()
    params, state = init_resunet(0, cfg)
    params = jax.device_put(params)
    state = jax.device_put(state)

    n = 64
    rng = np.random.default_rng(0)
    depth = jnp.asarray(rng.random((n, cfg.lr_tile, cfg.lr_tile, 1), np.float32))
    dem = jnp.asarray(rng.random((n, cfg.hr_tile, cfg.hr_tile, 1), np.float32))
    dem3 = dem[..., 0]
    scene_dem = jnp.asarray(
        rng.normal(300, 20, (4096, 4096)).astype(np.float32)
    )
    y0 = jnp.asarray((rng.integers(0, 7, n) * 512).astype(np.int32))
    x0 = jnp.asarray((rng.integers(0, 7, n) * 512).astype(np.int32))

    results: dict[str, float] = {}

    def run(label, fn, *args, k=8):
        t0 = time.perf_counter()
        ms = scan_cost_ms(fn, *args, k=k)
        print(
            f"# {label}: {ms:.3f} ms/iter in-program "
            f"[compile+measure {time.perf_counter() - t0:.0f}s]",
            file=sys.stderr,
        )
        results[label] = round(ms, 3)

    # gather: perturb the scene so the slices can't be hoisted
    run(
        "gather64",
        lambda c, sd, yy, xx: _gather_tiles(sd + c, yy, xx, 512),
        scene_dem, y0, x0,
    )
    run(
        "normalize64",
        lambda c, d: normalize_dem_batch(d + c, 95.0)[0],
        dem3,
    )
    run(
        "trunk_b64",
        lambda c, p, s, dl, dh: resunet_trunk_apply(p, s, dl + c, dh, cfg, train=False, precision="f32")[0],
        params, state, depth, dem,
    )
    run(
        "tail_b64",
        lambda c, p, s, f, dh: resunet_tail_apply(p, s, f + c, dh, cfg, train=False, precision="f32")[0],
        params, state,
        jnp.asarray(rng.random((n, cfg.lr_tile, cfg.lr_tile, cfg.base_filters), np.float32)),
        dem,
        k=4,
    )
    run(
        "forward_b64",
        lambda c, p, s, dl, dh: resunet_apply(p, s, dl + c, dh, cfg, train=False, precision="f32")[0],
        params, state, depth, dem,
        k=4,
    )

    out_fp = REPO / "docs/perf/structure_study.json"
    payload = json.loads(out_fp.read_text()) if out_fp.exists() else {}
    payload["segment_scan"] = {
        "date": "2026-08-17",
        "hardware": str(jax.devices()[0]),
        "note": (
            "true in-program component costs at hard-scene shapes (batch "
            "64) via scan repetition; compare against barrier_sweep hard "
            "T_dev=40.6 ms and the 21.8 ms bf16x3 MAC floor. The scene "
            "pays gather twice (phase 1 + phase 2) and normalize once."
        ),
        "ms": results,
    }
    out_fp.write_text(json.dumps(payload, indent=1) + "\n")
    print(json.dumps(payload["segment_scan"]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
