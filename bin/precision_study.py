"""Per-stage mixed-precision study: parity margin + scene throughput per policy.

The ≤1e-3 m parity gate applies to PIPELINE OUTPUT, and round-2's
kernel study showed the error concentrated in the HR tail (single-pass bf16
tail alone: rmse 6.5e-3 m). This sweep measures, on the TRAINED flagship
artifact, the TPU-vs-CPU-f32 meter-domain error of each per-stage precision
policy (nn/resunet.py::PRECISION_POLICIES plus dict variants), and the fused
scene-executor wall time of the named policies — the evidence behind the
default serving config.

Two phases (CPU reference must come from a CPU-pinned process):

    python bin/precision_study.py cpu-ref   # writes /tmp/floodsr_precision_ref.npz
    python bin/precision_study.py tpu       # sweeps policies, writes JSON

The tpu phase re-execs the cpu-ref phase automatically if the reference file
is missing. Results append into docs/perf/precision_study.json.

Timing methodology: queued async dispatches + one scalar readback per trial
(block_until_ready is not a reliable barrier on the axon tunnel; RTT ~25 ms).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

REF_NPZ = Path(os.environ.get("FLOODSR_PRECISION_REF", "/tmp/floodsr_precision_ref.npz"))
ARTIFACT = REPO / "tests/data/_artifacts/model_infer_flagship.fsrz"
OUT_JSON = REPO / "docs/perf/precision_study.json"
N_TILES = 8
MAX_DEPTH = 5.0
DEM_PCT = 95.0
SEED = 20260817

#: policies swept for parity (dict specs exercise single-stage attribution)
PARITY_POLICIES: dict[str, object] = {
    "f32": "f32",
    "mixed": "mixed",
    "bf16": "bf16",
    "trunk_bf16_only": {"trunk": "bf16"},
    "sr_up_bf16_only": {"sr_up": "bf16"},
    "tail_bf16_only": {"tail": "bf16"},
}

#: named policies also timed through the fused scene executor
SCENE_POLICIES = ("f32", "mixed", "bf16")


def _make_inputs():
    """Deterministic realistic tile batch: wet/dry gamma depth + ramp DEM."""
    rng = np.random.default_rng(SEED)
    depth = np.clip(
        rng.gamma(0.6, 0.8, (N_TILES, 32, 32)) * (rng.random((N_TILES, 32, 32)) > 0.4),
        0, MAX_DEPTH,
    ).astype(np.float32)
    yy = np.linspace(0, 20, 512, dtype=np.float32)[:, None]
    xx = np.linspace(0, 15, 512, dtype=np.float32)[None, :]
    dem = (
        300.0
        + rng.uniform(-50, 50, (N_TILES, 1, 1)).astype(np.float32)
        + yy + xx
        + np.cumsum(rng.normal(0, 0.08, (N_TILES, 512, 512)).astype(np.float32), axis=2)
    )
    return depth, dem


def _forward_m(policy, depth, dem):
    """normalize → forward(policy) → invert, returning meter-domain numpy."""
    import jax
    import jax.numpy as jnp

    from floodsr_tpu.nn.checkpoint import load_artifact
    from floodsr_tpu.nn.resunet import resunet_apply
    from floodsr_tpu.ops.normalize import (
        invert_depth_log1p,
        normalize_dem_batch,
        scale_depth_log1p,
    )

    artifact = load_artifact(ARTIFACT)
    cfg = artifact["config"]
    params = jax.device_put(artifact["params"])
    state = jax.device_put(artifact["state"])

    def run(d, m):
        dn = scale_depth_log1p(d, MAX_DEPTH)
        mn, _ = normalize_dem_batch(m, DEM_PCT)
        pred, _ = resunet_apply(
            params, state, dn[..., None], mn[..., None], cfg,
            train=False, precision=policy,
        )
        return invert_depth_log1p(pred[..., 0], MAX_DEPTH)

    out = jax.jit(run)(jnp.asarray(depth), jnp.asarray(dem))
    return np.asarray(out, np.float32)


def main_cpu_ref() -> int:
    import jax

    # The axon TPU plugin wins over the JAX_PLATFORMS env var alone; pin the
    # platform through the config API before any backend use.
    jax.config.update("jax_platforms", "cpu")
    assert jax.default_backend() == "cpu", (
        f"cpu-ref phase must run CPU-pinned; got {jax.default_backend()}"
    )
    depth, dem = _make_inputs()
    ref = _forward_m("f32", depth, dem)
    REF_NPZ.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(REF_NPZ, ref_m=ref)
    print(f"# wrote CPU f32 reference {ref.shape} -> {REF_NPZ}", file=sys.stderr)
    return 0


def _scene_time_ms(policy: str, reps: int = 4, iters: int = 4) -> float:
    """Fused mersch-shaped scene wall per policy (trained flagship artifact)."""
    import jax
    import jax.numpy as jnp

    from floodsr_tpu.engine.scene import build_scene_executor, pack_scene_indices
    from floodsr_tpu.nn.checkpoint import load_artifact
    from floodsr_tpu.nn.resunet import resunet_apply
    from floodsr_tpu.tiling import build_window_grid

    artifact = load_artifact(ARTIFACT)
    cfg = artifact["config"]
    params = jax.device_put(artifact["params"])
    state = jax.device_put(artifact["state"])

    tile = cfg.hr_tile
    overlap = (cfg.lr_tile // 4) * cfg.scale
    stride = tile - overlap
    bucket = (4096, 4096)
    content = 3840
    chunk = 8
    grid_full = build_window_grid(bucket[0], bucket[1], tile, stride)
    capacity = -(-len(grid_full["y0"]) // chunk) * chunk
    grid = build_window_grid(content, content, tile, stride)
    idx = jax.tree.map(jnp.asarray, pack_scene_indices(grid, capacity, chunk))

    rng = np.random.default_rng(0)
    dem = jnp.asarray(rng.normal(300, 20, bucket).astype(np.float32))
    depth = jnp.asarray(
        rng.uniform(0, 3, (bucket[0] // cfg.scale, bucket[1] // cfg.scale)).astype(
            np.float32
        )
    )

    def fwd(p, s, d, m, dtype, _policy=policy):
        out, _ = resunet_apply(p, s, d, m, cfg, train=False, precision=_policy)
        return out

    fn, _ = build_scene_executor(
        cfg,
        scene_shape=bucket,
        capacity=capacity,
        overlap_hr=overlap,
        chunk=chunk,
        max_depth=MAX_DEPTH,
        dem_pct_clip=DEM_PCT,
        forward_fn=fwd,
        transfer_dtype="uint16",
    )
    print(f"# compiling scene[{policy}]...", file=sys.stderr)
    out, _ = fn(params, state, depth, dem, idx)
    float(jnp.sum(out.astype(jnp.float32)))  # compile + force
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out, _ = fn(params, state, depth, dem, idx)
        float(jnp.sum(out.astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main_tpu() -> int:
    if not REF_NPZ.exists():
        print("# no CPU reference; generating in a CPU-pinned subprocess", file=sys.stderr)
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        subprocess.run(
            [sys.executable, __file__, "cpu-ref"], env=env, check=True
        )
    import jax

    assert jax.default_backend() == "tpu", (
        f"tpu phase expects the TPU backend; got {jax.default_backend()}"
    )
    ref = np.load(REF_NPZ)["ref_m"]
    depth, dem = _make_inputs()

    results: dict = {
        "hardware": str(jax.devices()[0]),
        "date": time.strftime("%Y-%m-%d"),
        "artifact": ARTIFACT.name,
        "gate_rmse_m": 1e-3,
        "note": (
            "TPU-vs-CPU-f32 meter-domain parity per per-stage precision "
            "policy (trained flagship, 8x 32->512 tiles, synthetic ramp DEM) "
            "+ fused mersch-shaped scene wall per named policy. Single-stage "
            "dict rows attribute the bf16 error budget per stage."
        ),
        "parity": {},
        "scene_ms": {},
    }
    for name, policy in PARITY_POLICIES.items():
        out = _forward_m(policy, depth, dem)
        err = out - ref
        results["parity"][name] = {
            "rmse_m": float(np.sqrt(np.mean(err**2))),
            "max_abs_m": float(np.max(np.abs(err))),
            "passes_gate": bool(np.sqrt(np.mean(err**2)) <= 1e-3),
        }
        print(f"# parity[{name}]: {results['parity'][name]}", file=sys.stderr)

    for name in SCENE_POLICIES:
        ms = _scene_time_ms(name)
        results["scene_ms"][name] = round(ms, 1)
        results["scene_ms"][f"{name}_out_mp_per_s"] = round(3840 * 3840 / 1e6 / (ms / 1e3), 1)
        print(f"# scene[{name}]: {ms:.1f} ms", file=sys.stderr)

    OUT_JSON.parent.mkdir(parents=True, exist_ok=True)
    OUT_JSON.write_text(json.dumps(results, indent=1) + "\n")
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "tpu"
    raise SystemExit(main_cpu_ref() if mode == "cpu-ref" else main_tpu())
