"""Cumulative-depth TPU profile of the ResUNet trunk (flagship config).

The two-phase scene executor made the trunk a ~10 ms FLAT cost from batch 8
to 128 (docs/perf/structure_study.json: isolation_ms) — ~6x its bf16x3 MAC
floor — so the trunk is latency/serial-chain-bound, not MAC-bound. Before
touching anything, locate the milliseconds: this script times cumulative
prefixes of the trunk (stem, +enc stage 0..4, +dec stage 0..3) at the
hard-scene batch (64), each as its own jitted program, using the queued-
dispatch timing recipe from bin/profile_scene.py.

Run on the TPU host: ``python bin/trunk_profile.py [--batch 64]``.
Appends a ``trunk_depth`` entry to docs/perf/structure_study.json.
"""

from __future__ import annotations

import argparse
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


def _force(out) -> float:
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def best_of(fn, *args, reps: int = 4, iters: int = 8) -> float:
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
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    from floodsr_tpu.nn import ResUNetConfig, init_resunet
    from floodsr_tpu.nn.resunet import (
        _conv,
        _conv_transpose,
        _res_block,
        resolve_precision_policy,
    )

    cfg = ResUNetConfig()
    params, state = init_resunet(0, cfg)
    # init_resunet returns numpy leaves; stage them to HBM ONCE. Passing
    # numpy pytrees straight into the jitted calls re-uploads ~64 MB of
    # weights per dispatch through the tunnel, swamping the measurement.
    params = jax.device_put(params)
    state = jax.device_put(state)
    print(f"backend: {jax.default_backend()} {jax.devices()}", file=sys.stderr)

    n = args.batch
    rng = np.random.default_rng(0)
    depth_lr = jnp.asarray(rng.random((n, cfg.lr_tile, cfg.lr_tile, 1), np.float32))
    dem_hr = jnp.asarray(rng.random((n, cfg.hr_tile, cfg.hr_tile, 1), np.float32))

    # Cumulative prefix forward: mirrors resunet_trunk_apply exactly
    # (f32/HIGH policy), truncated after `n_enc` encoder stages and `n_dec`
    # decoder stages.
    def prefix(params, state, depth_lr, dem_hr, *, n_enc: int, n_dec: int):
        x_dtype = resolve_precision_policy(None, jnp.float32)["trunk"]
        depth_lr = depth_lr.astype(x_dtype)
        dem = dem_hr.astype(x_dtype)
        s = cfg.scale
        n_, hh_, ww_, c_ = dem.shape
        dem_lr = dem.reshape(n_, hh_ // s, s, ww_ // s, s, c_).mean(axis=(2, 4))
        x = jnp.concatenate([depth_lr, dem_lr.astype(x_dtype)], axis=-1)
        x = _conv(params["stem"], x)
        skips = []
        for stage in range(n_enc):
            blocks_p, blocks_s = params["enc"][stage], state["enc"][stage]
            for bi, (bp, bs) in enumerate(zip(blocks_p, blocks_s)):
                stride = 2 if (stage > 0 and bi == 0) else 1
                x, _ = _res_block(bp, bs, x, cfg, stride=stride, train=False)
            if stage < len(params["enc"]) - 1:
                skips.append(x)
        for di in range(n_dec):
            stage_p, stage_s = params["dec"][di], state["dec"][di]
            x = _conv_transpose(stage_p["up"], x, stride=2)
            x = jnp.concatenate([x, skips[len(skips) - 1 - di]], axis=-1)
            for bp, bs in zip(stage_p["blocks"], stage_s["blocks"]):
                x, _ = _res_block(bp, bs, x, cfg, train=False)
        return x

    n_stages = len(params["enc"])
    n_dec_stages = len(params["dec"])
    points = [("stem", 0, 0)]
    points += [(f"enc{k}", k + 1, 0) for k in range(n_stages)]
    points += [(f"dec{k}", n_stages, k + 1) for k in range(n_dec_stages)]

    # Per-dispatch floor on this backend is ~5 ms (measured: a stem-only
    # program and the FULL trunk both read ~5 ms per queued call), so
    # sub-floor segments cannot be timed one dispatch per iteration.
    # Instead each prefix runs K times inside ONE program via lax.scan with
    # a forced sequential data dependency; (T(K) - T(1)) / (K - 1) is the
    # true in-program per-iteration device cost, launch overhead cancelled.
    from jax import lax

    K = 16

    def repeated(params, state, depth_lr, dem_hr, *, n_enc, n_dec, k):
        def body(carry, _):
            x = prefix(params, state, depth_lr + carry, dem_hr, n_enc=n_enc, n_dec=n_dec)
            # fold the output into the next iteration's input so the scan
            # body cannot be hoisted/CSE'd; the multiplier keeps it ~0.
            return jnp.sum(x).astype(jnp.float32) * 1e-30, None

        c, _ = lax.scan(body, jnp.float32(0.0), None, length=k)
        return c

    results: dict[str, float] = {}
    prev = 0.0
    for label, n_enc, n_dec in points:
        t0 = time.perf_counter()
        f1 = jax.jit(partial(repeated, n_enc=n_enc, n_dec=n_dec, k=1))
        fk = jax.jit(partial(repeated, n_enc=n_enc, n_dec=n_dec, k=K))
        t1 = best_of(f1, params, state, depth_lr, dem_hr, reps=args.reps)
        tk = best_of(fk, params, state, depth_lr, dem_hr, reps=args.reps)
        ms = (tk - t1) / (K - 1) * 1e3
        print(
            f"# {label}: {ms:.3f} ms/iter in-program (+{ms - prev:.3f}); "
            f"T(1)={t1 * 1e3:.2f} T({K})={tk * 1e3:.2f} "
            f"[compile+measure {time.perf_counter() - t0:.0f}s]",
            file=sys.stderr,
        )
        results[label] = round(ms, 3)
        prev = ms

    out_fp = REPO / "docs/perf/structure_study.json"
    payload = json.loads(out_fp.read_text()) if out_fp.exists() else {}
    payload["trunk_depth"] = {
        "date": "2026-08-17",
        "hardware": str(jax.devices()[0]),
        "batch": n,
        "note": (
            "cumulative trunk-prefix IN-PROGRAM cost via lax.scan "
            "repetition ((T(16)-T(1))/15, launch floor cancelled); the "
            "~5 ms per-dispatch floor on this backend makes one-dispatch-"
            "per-iter timings read ~5 ms for EVERY depth. Successive "
            "deltas localize the trunk's serial cost."
        ),
        "cumulative_ms": results,
    }
    out_fp.write_text(json.dumps(payload, indent=1) + "\n")
    print(json.dumps(payload["trunk_depth"]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
