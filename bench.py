"""Benchmark: SR megapixels/sec/chip on the rss_mersch_A-shaped 16× tohr.

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "MP/s", "vs_baseline": N}``

Workload (mirrors the reference's big-raster regression case
``tests/data/rss_mersch_A``: 256² LR @30 m → 3840² HR @2 m, feather tiling +
post-resample): a synthetic scene with those exact shapes runs through the
full end-to-end ``tohr`` pipeline (GeoTIFF read → align → batched device
inference → feather mosaic → post-resample → GeoTIFF write), on the real
device jax selects (TPU under the driver).

Two measurements:

- **device pipeline MP/s** (the headline ``value``): sustained throughput of
  the full on-chip tohr compute — per-tile normalization (log1p depth +
  percentile DEM stats), ResUNet forward, meter-domain inverse, and the
  feathered mosaic — measured by repeated scene executions forced with a
  scalar readback. This is the per-chip number that carries to production
  hosts (where PCIe replaces this harness's ~15-35 MB/s network tunnel to the
  device).
- **end-to-end MP/s** (reported on stderr and as ``e2e_mps``): wall time of
  ``worker.run`` including GeoTIFF decode/encode and the tunnel transfers.

Baseline: the reference publishes no formal benchmark. Its committed notebook
outputs (reference: ``examples.ipynb`` cell 10; SURVEY.md §6) show ~24
**windows/s** of 512² window compute on CPU ORT — its throughput unit is
*computed windows*, each a full normalize→forward→invert→blend pass.

Two accountings are reported, both against that same measurement:

- ``vs_baseline`` (primary): **job-level speedup** = our measured windows/s
  over the reference's 24 windows/s, on the identical tiled job (same window
  grid, same 512² forwards, same mosaic math). This is the wall-clock ratio
  the reference would see on this scene: at the default feather overlap both
  pipelines compute the same 121 windows, so windows/s ratios equal
  scene-wall ratios. Reported alongside as ``windows_per_s``.
- ``vs_baseline_output_rate`` (conservative): our unique-output MP/s over
  the reference's *computed-window* pixel rate (24 win/s × 512² ≈ 6.3 MP/s).
  This mixes pixel countings — in feather mode it charges us (and only us)
  the ~2.15× overlap recompute the reference pays identically — and is kept
  for continuity with rounds 1-2, which reported only this ratio.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

# No persistent compile cache here: it does nothing for the TPU backend
# (remote compile bypasses it) and cross-host CPU AOT entries risk SIGILL.

import numpy as np

REPO = Path(__file__).parent
sys.path.insert(0, str(REPO))

BASELINE_WINDOWS_PER_S = 24.0  # reference CPU ORT, examples.ipynb cell 10
BASELINE_COMPUTE_MPS = 6.3  # = 24 win/s x 512^2 px (computed-window pixel rate)
BASELINE_E2E_MPS = 2.5      # reference CPU ORT end-to-end estimate (this scene)
LR_SHAPE = (256, 256)
LR_RES = 30.0
HR_SHAPE = (3840, 3840)
HR_RES = 2.0
CRS = "EPSG:32633"


def _make_scene(root: Path) -> dict[str, Path]:
    from floodsr_tpu.io import from_origin, write_raster

    from floodsr_tpu.train.synth import box_mean, make_terrain, make_truth

    x0, y0 = 500000.0, 4000000.0

    # Draw the scene from the flagship's own training family (terrain with
    # a carved channel, tilted water surface): the benched model is the
    # committed TRAINED artifact, so the scene must be in-distribution —
    # an arbitrary noise field would make the SR output meaningless AND
    # unrepresentative for the host codec stage (real flood rasters are
    # mostly dry; pure noise is incompressible). Held-out seed: not among
    # the training seeds (0..n_scenes) of bin/train_flagship.py --full.
    dem = make_terrain(HR_SHAPE, seed=20260816).astype(np.float32)
    truth = make_truth(dem, seed=20260816)
    depth_lr = box_mean(truth, HR_SHAPE[0] // LR_SHAPE[0])  # 15x: 30 m obs

    def profile(arr, res, top):
        return {
            "height": arr.shape[0],
            "width": arr.shape[1],
            "count": 1,
            "dtype": "float32",
            "crs": CRS,
            "transform": from_origin(x0, top, res, res),
            "nodata": -9999.0,
            "compress": "LZW",
        }

    lr_fp = root / "lowres030.tif"
    dem_fp = root / "hires002_dem.tif"
    write_raster(lr_fp, depth_lr, profile(depth_lr, LR_RES, y0 + LR_SHAPE[0] * LR_RES))
    write_raster(dem_fp, dem, profile(dem, HR_RES, y0 + HR_SHAPE[0] * HR_RES))
    return {"lr": lr_fp, "dem": dem_fp}


def _make_model(root: Path) -> Path:
    """The committed TRAINED flagship (f=32, 32→512) — the artifact users run.

    The reference's only e2e figure was measured with its released trained
    ONNX; benching a random-init model would also skew the host codec stage
    (untrained outputs are incompressible noise; trained outputs carry the
    dry-region zero runs real flood rasters have). Falls back to a seeded
    random init if the artifact is ever absent.
    """
    flagship = REPO / "tests/data/_artifacts/model_infer_flagship.fsrz"
    if flagship.exists():
        return flagship

    from floodsr_tpu.nn import ResUNetConfig, init_resunet
    from floodsr_tpu.nn.checkpoint import save_artifact

    cfg = ResUNetConfig()  # flagship shape: f=32, 32→512 tiles
    params, state = init_resunet(20260816, cfg)
    fp = root / "model_infer.fsrz"
    save_artifact(fp, cfg, params, state, {"seed": 20260816, "purpose": "bench"})
    return fp


def main() -> int:
    from floodsr_tpu.model_registry import resolve_model_worker_class

    if os.environ.get("FLOODSR_BENCH_DEBUG"):
        import logging

        logging.basicConfig(level=logging.DEBUG, stream=sys.stderr)

    max_batch = int(os.environ.get("FLOODSR_BENCH_MAX_BATCH", "8"))
    compute_dtype = os.environ.get("FLOODSR_BENCH_DTYPE", "float32")
    # Run 0 pays compiles; later runs ride the DEM device cache (static
    # terrain). Best-of-N because the shared tunnel's throughput swings ±4x
    # (measured best-run spread 2.0-19.6 s for identical code) — warm runs
    # are cheap, so sample generously.
    repeats = int(os.environ.get("FLOODSR_BENCH_REPEATS", "6"))

    t_start = time.perf_counter()
    with tempfile.TemporaryDirectory(prefix="floodsr-bench-") as tmp:
        root = Path(tmp)
        scene = _make_scene(root)
        model_fp = _make_model(root)

        worker_cls = resolve_model_worker_class("ResUNet_16x_DEM")
        worker = worker_cls(
            model_fp=model_fp, compute_dtype=compute_dtype, max_batch=max_batch
        )
        out_mp = HR_SHAPE[0] * HR_SHAPE[1] / 1e6
        times = []
        # The shared tunnel has pathological windows (measured: a tiny
        # scene's D2H taking 197 s that elsewhere takes <1 s). The warm
        # repeats exist to sample tunnel variance — never let them starve
        # the primary device-pipeline measurement below.
        e2e_budget_s = float(os.environ.get("FLOODSR_BENCH_E2E_BUDGET_S", "1500"))
        best_scene_timings = None
        with worker:
            for i in range(repeats):
                out_fp = root / f"pred_{i}.tif"
                t0 = time.perf_counter()
                result = worker.run(
                    depth_lr_fp=scene["lr"],
                    dem_hr_fp=scene["dem"],
                    output_fp=out_fp,
                    window_method="feather",
                )
                times.append(time.perf_counter() - t0)
                if times[-1] == min(times):
                    best_scene_timings = result.get("scene_timings") or None
                print(
                    f"# run {i}: {times[-1]:.3f}s "
                    f"({out_mp / times[-1]:.2f} MP/s, "
                    f"{result['preprocess']['tile_cache_size']} tiles)",
                    file=sys.stderr,
                )
                if i >= 1 and time.perf_counter() - t_start > e2e_budget_s:
                    print(
                        f"# stopping e2e repeats at {i + 1}/{repeats} "
                        f"(wall past {e2e_budget_s:.0f}s budget)",
                        file=sys.stderr,
                    )
                    break

            best = min(times)
            e2e_mps = out_mp / best
            print(f"# e2e: {e2e_mps:.2f} MP/s (best of {len(times)})", file=sys.stderr)

            # Output-compression sweep: same pipeline, same compiled
            # executables, only the host encode differs (--output-compress;
            # the single largest host cost on 1-core hosts). Warm runs ride
            # the DEM device cache, so each extra sample is ~2-3 s.
            e2e_by_compress: dict[str, float] = {}
            if os.environ.get("FLOODSR_BENCH_COMPRESS_SWEEP", "1") == "1":
                for codec in ("zstd", "none"):
                    c_times = []
                    for i in range(max(2, min(3, repeats - 1))):
                        t0 = time.perf_counter()
                        worker.run(
                            depth_lr_fp=scene["lr"],
                            dem_hr_fp=scene["dem"],
                            output_fp=root / f"pred_{codec}_{i}.tif",
                            window_method="feather",
                            output_compress=codec,
                        )
                        c_times.append(time.perf_counter() - t0)
                    e2e_by_compress[codec] = out_mp / min(c_times)
                    print(
                        f"# e2e --output-compress {codec}: "
                        f"{e2e_by_compress[codec]:.2f} MP/s "
                        f"(best of {len(c_times)})",
                        file=sys.stderr,
                    )

            # Packed 12-bit D2H (output_transfer="uint12"): 25% fewer link
            # bytes than uint16 at a quantization rmse of max_depth/4095/
            # sqrt(12) ≈ 3.5e-4 m — inside the 1e-3 m parity gate. On this
            # harness the scene wall is link-bound (~44 MB/s tunnel,
            # docs/perf/link_study.json), so this is the lever that moves
            # e2e once the encode cost is off the critical path (zstd).
            # The expensive scene executables are shared with the uint16
            # engine (only the tiny pack-slice program differs), so the
            # fresh worker below re-compiles nothing big.
            pack12_results: dict[str, float] = {}
            pack12_rmse = None
            if os.environ.get("FLOODSR_BENCH_PACK12", "1") == "1":
                worker12 = worker_cls(
                    model_fp=model_fp, compute_dtype=compute_dtype,
                    max_batch=max_batch, output_transfer="uint12",
                )
                with worker12:
                    for codec in ("zstd", "lzw"):
                        c_times = []
                        for i in range(max(2, min(3, repeats - 1))):
                            t0 = time.perf_counter()
                            worker12.run(
                                depth_lr_fp=scene["lr"],
                                dem_hr_fp=scene["dem"],
                                output_fp=root / f"pred12_{codec}_{i}.tif",
                                window_method="feather",
                                output_compress=codec,
                            )
                            c_times.append(time.perf_counter() - t0)
                        pack12_results[codec] = out_mp / min(c_times)
                        print(
                            f"# e2e uint12 transfer + {codec}: "
                            f"{pack12_results[codec]:.2f} MP/s "
                            f"(best of {len(c_times)})",
                            file=sys.stderr,
                        )
                # Honest quantization accounting: rmse of the pack12 output
                # against the uint16 run's output of the same scene.
                from floodsr_tpu.io import read_raster

                a16 = read_raster(root / "pred_0.tif")[0]
                a12 = read_raster(root / "pred12_lzw_0.tif")[0]
                pack12_rmse = float(
                    np.sqrt(np.mean((a16.astype(np.float64) - a12) ** 2))
                )
                print(
                    f"# uint12 vs uint16 output rmse: {pack12_rmse:.2e} m",
                    file=sys.stderr,
                )

            # Sustained multi-scene throughput: the production shape is a
            # STREAM of scenes (tohr_many/serve). Each scene has its own
            # DEM, so the next DEM's decode+upload overlaps the current
            # scene's compute (ModelWorker.run_many prefetch) and the row
            # encode overlaps the banded D2H. Wall over total output MP.
            stream_mps = None
            stream_n = int(os.environ.get("FLOODSR_BENCH_STREAM_SCENES", "5"))
            if stream_n > 1 and os.environ.get("FLOODSR_BENCH_STREAM", "1") == "1":
                from floodsr_tpu.train.synth import box_mean, make_terrain, make_truth
                from floodsr_tpu.io import from_origin, write_raster

                jobs = []
                for k in range(stream_n):
                    dem_k = make_terrain(HR_SHAPE, seed=30260816 + k).astype(np.float32)
                    truth_k = make_truth(dem_k, seed=30260816 + k)
                    lr_k = box_mean(truth_k, HR_SHAPE[0] // LR_SHAPE[0])
                    x0, y0 = 500000.0, 4000000.0

                    def _prof(arr, res, top):
                        return {
                            "height": arr.shape[0], "width": arr.shape[1],
                            "count": 1, "dtype": "float32", "crs": CRS,
                            "transform": from_origin(x0, top, res, res),
                            "nodata": -9999.0, "compress": "LZW",
                        }

                    lr_fp = root / f"stream_lr_{k}.tif"
                    dem_fp = root / f"stream_dem_{k}.tif"
                    write_raster(lr_fp, lr_k,
                                 _prof(lr_k, LR_RES, y0 + LR_SHAPE[0] * LR_RES))
                    write_raster(dem_fp, dem_k,
                                 _prof(dem_k, HR_RES, y0 + HR_SHAPE[0] * HR_RES))
                    jobs.append({
                        "depth_lr_fp": lr_fp, "dem_hr_fp": dem_fp,
                        "output_fp": root / f"stream_pred_{k}.tif",
                    })
                t0 = time.perf_counter()
                worker.run_many(jobs, window_method="feather")
                stream_wall = time.perf_counter() - t0
                stream_mps = stream_n * out_mp / stream_wall
                print(
                    f"# stream: {stream_mps:.2f} MP/s over {stream_n} scenes "
                    f"({stream_wall:.1f}s wall, DEM prefetch overlapped)",
                    file=sys.stderr,
                )

            # Device-pipeline throughput: re-run the engine's ALREADY-COMPILED
            # scene executable (the exact production computation: normalize +
            # forward + invert + feather mosaic + quantize), forced with a
            # scalar readback so the harness's slow device-host tunnel is not
            # measured (see module docstring). Timing is best-of-N: the axon
            # tunnel/chip is shared, so interference only ever ADDS time.
            pipe_f32, win_f32 = _measure_pipeline(
                worker.engine, scene, out_mp, compute_dtype
            )

            # Secondary: the hard-window preset (--window-method hard, a
            # first-class reference mode) at the same gate-passing numerics —
            # no overlap recompute, measured held-out quality parity with
            # feather (docs/perf/overlap_study.json). Budget-guarded: it
            # costs one more scene-executable compile.
            pipe_hard = None
            hard_budget = float(os.environ.get("FLOODSR_BENCH_HARD_BUDGET_S", "1500"))
            if (
                os.environ.get("FLOODSR_BENCH_HARD", "1") == "1"
                and time.perf_counter() - t_start < hard_budget
            ):
                worker.run(
                    depth_lr_fp=scene["lr"],
                    dem_hr_fp=scene["dem"],
                    output_fp=root / "pred_hard.tif",
                    window_method="hard",
                )
                pipe_hard, win_hard = _measure_pipeline(
                    worker.engine, scene, out_mp, f"{compute_dtype}-hard",
                    scene_key_index=-1,
                )
            else:
                print("# skipping hard-window secondary (budget/env)", file=sys.stderr)

        # Secondary: the documented bfloat16 fast path on the same scene
        # (body bf16, head f32). Quality evidence: docs/perf/flagship_study
        # pins bf16 held-out eval metrics ≈ f32 on the trained s2d4 flagship
        # — offered as an explicit opt-in, outside the strict 1e-3 parity
        # gate. The pass costs another scene-executable compile (~1-4 min on
        # this backend), so it is skipped when the run is already long —
        # the harness's time budget must never swallow the primary JSON
        # line below.
        pipe_bf16 = None
        budget_s = float(os.environ.get("FLOODSR_BENCH_BF16_BUDGET_S", "900"))
        if time.perf_counter() - t_start > budget_s:
            print("# skipping bf16 secondary (wall budget)", file=sys.stderr)
        elif os.environ.get("FLOODSR_BENCH_BF16", "1") == "1" and compute_dtype == "float32":
            bf16_worker = worker_cls(
                model_fp=model_fp, compute_dtype="bfloat16", max_batch=max_batch
            )
            with bf16_worker:
                bf16_worker.run(
                    depth_lr_fp=scene["lr"],
                    dem_hr_fp=scene["dem"],
                    output_fp=root / "pred_bf16.tif",
                    window_method="feather",
                )
                pipe_bf16, win_bf16 = _measure_pipeline(
                    bf16_worker.engine, scene, out_mp, "bfloat16"
                )

        # Parity artifact: run the TPU-vs-CPU gate over the committed golden
        # cases and write PARITY_r{N}.json next to the bench result, so the
        # round's parity evidence is machine-readable and cannot be skipped
        # silently (a skip writes the artifact WITH the reason).
        parity = _run_parity_gate(t_start)

        # Self-arming requalification: the real-artifact golden-metrics gate
        # (released ONNX + LFS rasters) has never executed because this
        # environment has no egress. Probe on every bench run; the moment
        # network exists, the ONLINE requalification runs unattended and
        # writes requalify_verdict.json with REAL metrics.
        requalify = _maybe_requalify_online(t_start)

        payload = {
            # Schema history: v1 (rounds 1-2) reported vs_baseline as the
            # unique-output MP/s ratio; v2 (round 3+) reports vs_baseline as
            # the job-level windows/s speedup and keeps the old accounting
            # under vs_baseline_output_rate. Consumers comparing across
            # rounds should key on this field.
            "bench_schema": 2,
            "metric": (
                "SR megapixels/sec/chip on 16x tohr (rss_mersch_A-shaped "
                "scene): on-chip pipeline (normalize+forward+invert+"
                f"feather mosaic), {compute_dtype}; vs_baseline = job-level "
                "speedup (measured 512^2 windows/s over the reference CPU "
                "ORT's 24 windows/s on the identical tiled job); "
                "vs_baseline_output_rate = unique-output MP/s over the "
                "reference's computed-window pixel rate 6.3 MP/s "
                "(conservative rounds-1/2 accounting)"
            ),
            "value": round(pipe_f32, 2),
            "unit": "MP/s",
            "vs_baseline": round(win_f32 / BASELINE_WINDOWS_PER_S, 2),
            "windows_per_s": round(win_f32, 1),
            "vs_baseline_output_rate": round(pipe_f32 / BASELINE_COMPUTE_MPS, 2),
            "e2e_mps": round(e2e_mps, 3),
            "e2e_vs_baseline": round(e2e_mps / BASELINE_E2E_MPS, 2),
        }
        for codec, mps in e2e_by_compress.items():
            payload[f"e2e_mps_{codec}"] = round(mps, 3)
        for codec, mps in pack12_results.items():
            payload[f"e2e_mps_pack12_{codec}"] = round(mps, 3)
        if pack12_rmse is not None:
            # Quantization cost of the uint12 link encoding vs the uint16
            # default on this scene's output (gate budget: 1e-3 m rmse; the
            # parity artifact carries a full pack12 accelerator-vs-CPU row).
            payload["pack12_rmse_vs_uint16_m"] = round(pack12_rmse, 7)
        if stream_mps is not None:
            payload["stream_mps"] = round(stream_mps, 3)
            payload["stream_scenes"] = stream_n
        if best_scene_timings:
            # Budget decomposition of the best e2e run (see
            # EngineJAX.run_scene docs): on this backend the e2e number is
            # dominated by d2h_wait_s — the axon tunnel's ~25-35 MB/s
            # device->host link, a harness artifact (PCIe on a real TPU
            # host moves the same bands in milliseconds). host_post_s is
            # the PRODUCT's host-side cost (dequant + resample + GeoTIFF
            # encode), overlapped with later bands' async copies.
            payload["e2e_scene_timings"] = best_scene_timings
            d2h = float(best_scene_timings.get("d2h_wait_s", 0.0))
            if d2h > 0:
                payload["e2e_mps_excl_d2h_wait"] = round(
                    out_mp / max(1e-9, best - d2h), 2
                )
        if parity is not None:
            payload["parity_gate"] = parity
        if requalify is not None:
            payload["requalify"] = requalify
        if pipe_hard is not None:
            # Same gate-passing f32 numerics; hard windows (a reference
            # mode) skip the 2.15x overlap recompute — quality evidence in
            # docs/perf/overlap_study.json. Its vs_baseline is also the
            # windows/s ratio (the hard job has its own, smaller grid on
            # both sides).
            payload["hard_window_mps"] = round(pipe_hard, 2)
            payload["hard_windows_per_s"] = round(win_hard, 1)
            payload["hard_window_vs_baseline"] = round(
                win_hard / BASELINE_WINDOWS_PER_S, 2
            )
            payload["hard_window_vs_baseline_output_rate"] = round(
                pipe_hard / BASELINE_COMPUTE_MPS, 2
            )
        if pipe_bf16 is not None:
            payload["bf16_mps"] = round(pipe_bf16, 2)
            payload["bf16_windows_per_s"] = round(win_bf16, 1)
            payload["bf16_vs_baseline"] = round(win_bf16 / BASELINE_WINDOWS_PER_S, 2)
            # Explicit in the payload so the number cannot be quoted as
            # parity-grade: bf16 FAILS the 1e-3 m parity gate (measured
            # 5.2e-3 m, docs/perf/precision_study.json) — it is a
            # documented opt-in fast path, not the default numerics.
            payload["bf16_parity_gate"] = False
            payload["bf16_parity_note"] = (
                "fails the 1e-3 m gate at 5.2e-3 m "
                "(docs/perf/precision_study.json); opt-in fast path"
            )
        print(json.dumps(payload))
    return 0


PARITY_OUT = REPO / "PARITY_r05.json"


def _run_parity_gate(t_start: float) -> dict | None:
    """Run bin/parity_gate.py; on skip/failure, write the reason instead.

    The gate pays fresh compiles on both backends (many minutes on this
    host), so it honors a wall budget — but never disappears silently: a
    budget skip is recorded IN the artifact.
    """
    import subprocess

    # Round 5: the gate runs each case twice (cold + steady) and adds the
    # banded-vs-replicated CPU-mesh row, so it needs more than r4's 1200 s.
    budget_s = float(os.environ.get("FLOODSR_BENCH_PARITY_BUDGET_S", "2700"))
    if os.environ.get("FLOODSR_BENCH_PARITY", "1") != "1":
        reason = "disabled via FLOODSR_BENCH_PARITY=0"
    elif time.perf_counter() - t_start > budget_s:
        reason = f"bench wall already past {budget_s:.0f}s budget"
    else:
        try:
            proc = subprocess.run(
                [sys.executable, str(REPO / "bin" / "parity_gate.py"),
                 "--out", str(PARITY_OUT)],
                timeout=budget_s, capture_output=True, text=True,
            )
            print(proc.stderr[-2000:], file=sys.stderr)
            if PARITY_OUT.exists():
                parity = json.loads(PARITY_OUT.read_text())
                return {
                    "pass": parity.get("pass"),
                    "worst_rmse_m": max(
                        (c["rmse_m"] for c in parity.get("cases", {}).values()),
                        default=None,
                    ),
                    "artifact": PARITY_OUT.name,
                }
            reason = f"parity_gate wrote no artifact (rc={proc.returncode})"
        except subprocess.TimeoutExpired:
            reason = f"parity_gate exceeded {budget_s:.0f}s"
        except Exception as err:  # noqa: BLE001 - record, don't kill the bench
            reason = f"parity_gate error: {err}"
    print(f"# parity gate skipped: {reason}", file=sys.stderr)
    # Never clobber a real (cases-bearing) artifact with a skip stub: ad-hoc
    # bench runs with the gate disabled must not erase the round's parity
    # evidence. Only write the stub when no real artifact exists yet.
    existing_is_real = False
    if PARITY_OUT.exists():
        try:
            existing_is_real = bool(json.loads(PARITY_OUT.read_text()).get("cases"))
        except Exception:  # noqa: BLE001 - unreadable -> overwrite
            existing_is_real = False
    if not existing_is_real:
        PARITY_OUT.write_text(
            json.dumps({"skipped": reason, "pass": None}, indent=1) + "\n"
        )
    return {"pass": None, "skipped": reason, "artifact": PARITY_OUT.name}


def _maybe_requalify_online(t_start: float) -> dict | None:
    """Run the ONLINE real-artifact requalification iff network exists.

    The dry-run rehearsal is already e2e-tested offline; the only untested
    step is the egress itself, so a cheap DNS probe decides. Failure never
    kills the bench — the outcome (or skip reason) is recorded in the
    payload either way.
    """
    import socket
    import subprocess

    if os.environ.get("FLOODSR_BENCH_REQUALIFY", "1") != "1":
        return {"ran": False, "skipped": "disabled via FLOODSR_BENCH_REQUALIFY=0"}
    try:
        socket.setdefaulttimeout(5)
        socket.getaddrinfo("github.com", 443)
    except OSError as err:
        return {"ran": False, "skipped": f"no network ({err})"}
    finally:
        socket.setdefaulttimeout(None)
    budget_s = float(os.environ.get("FLOODSR_BENCH_REQUALIFY_BUDGET_S", "1800"))
    out_fp = REPO / "requalify_verdict.json"
    try:
        proc = subprocess.run(
            [sys.executable, str(REPO / "bin" / "requalify_reference.py"),
             "--out", str(out_fp)],
            timeout=budget_s, capture_output=True, text=True,
        )
        print(proc.stderr[-2000:], file=sys.stderr)
        verdict = json.loads(out_fp.read_text())
        return {
            "ran": True,
            "pass": verdict.get("pass"),
            "metrics_gate": verdict.get("metrics_gate"),
            "artifact": out_fp.name,
            "rc": proc.returncode,
        }
    except subprocess.TimeoutExpired:
        return {"ran": False, "skipped": f"online requalify exceeded {budget_s:.0f}s"}
    except Exception as err:  # noqa: BLE001 - record, don't kill the bench
        return {"ran": False, "skipped": f"online requalify error: {err}"}


def _measure_pipeline(
    engine, scene, out_mp: float, label: str, reps: int = 5,
    scene_key_index: int = 0,
) -> tuple[float, float]:
    """Best-of-N wall time of the compiled scene executable (scalar readback).

    Timing model (measured, ``docs/perf/structure_study.json:
    barrier_sweep``): each timing group pays ONE scalar-readback barrier of
    ~27 ms (the tunnel RTT — a harness artifact; steady-state serving
    streams scenes with no per-scene barrier), so the per-scene reading is
    ``T_dev + RTT/iters``. The iters sweep {2..32} fits T_dev within 2% and
    an RTT matching the independently measured tunnel round trip on BOTH
    scene executables. iters=16 keeps the reported number a direct
    measurement (not a fit) while holding the barrier share under 2 ms.
    """
    import jax
    import jax.numpy as jnp

    from floodsr_tpu.engine.scene import choose_scene_chunk, pack_scene_indices
    from floodsr_tpu.io.geotiff import read_raster
    from floodsr_tpu.tiling import build_window_grid

    scene_keys = [k for k in engine._jit_cache if k[0] == "scene"]
    assert scene_keys, "no compiled scene executable to benchmark"
    key = scene_keys[scene_key_index]
    fn = engine._jit_cache[key]
    _, bucket, capacity, stride_hr = key[0], key[1], key[2], key[3]

    lr_arr, _, _ = read_raster(scene["lr"])
    cfg = engine.config
    crop = (lr_arr.shape[0] * cfg.scale, lr_arr.shape[1] * cfg.scale)
    bucket_grid_n = len(
        build_window_grid(bucket[0], bucket[1], cfg.hr_tile, stride_hr)["y0"]
    )
    chunk = choose_scene_chunk(bucket_grid_n, engine.scene_chunk)
    # content windows over tile-padded crop, as run_scene does
    content = (-(-crop[0] // cfg.hr_tile) * cfg.hr_tile,
               -(-crop[1] // cfg.hr_tile) * cfg.hr_tile)
    grid = build_window_grid(
        min(bucket[0], content[0]), min(bucket[1], content[1]),
        cfg.hr_tile, stride_hr,
    )
    n_windows = len(grid["y0"])  # real (non-dummy) 512^2 forwards per scene
    idx = jax.tree.map(jnp.asarray, pack_scene_indices(grid, capacity, chunk))
    depth_dev = engine._put_padded(lr_arr, (bucket[0] // cfg.scale, bucket[1] // cfg.scale))
    dem_dev = engine._put_padded(
        np.ascontiguousarray(
            np.random.default_rng(0).normal(300, 20, crop).astype(np.float32)
        ),
        bucket,
    )
    out, _ = fn(engine.params, engine.state, depth_dev, dem_dev, idx)
    float(jnp.sum(out.astype(jnp.float32)))  # warm-up + force
    # Queue several scene executions per scalar readback: the readback's
    # ~27 ms tunnel round trip is a harness artifact (measured in
    # bin/barrier_sweep.py), not part of the pipeline; queued dispatch
    # mirrors steady-state serving where scenes stream back to back.
    iters = 16
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out, _ = fn(engine.params, engine.state, depth_dev, dem_dev, idx)
        float(jnp.sum(out.astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / iters)
    mps = out_mp / best
    win_ps = n_windows / best
    print(
        f"# device pipeline {label}: {mps:.1f} MP/s, {win_ps:.0f} windows/s "
        f"({best * 1000:.0f} ms/scene, {n_windows} windows, "
        f"best of {reps}x{iters} queued)",
        file=sys.stderr,
    )
    return mps, win_ps


if __name__ == "__main__":
    raise SystemExit(main())
