"""Measure the serving daemon's overhead vs the library path on real TPU.

Boots a live ``TohrService`` + HTTP server in-process on a loopback port,
streams the same mersch-shaped scene batch three ways —

- ``library``: ``ModelWorker.run_many`` directly (the floor),
- ``http_batch``: one ``POST /v1/tohr_many``,
- ``http_single``: one ``POST /v1/tohr`` per scene (keep-alive session) —

and records per-scene wall times plus the first-request latency with and
without boot warmup. Writes ``docs/perf/serve_study.json``.

The claim under test: the daemon's JSON/HTTP front adds negligible
per-scene cost over the library pipeline (scene work is hundreds of ms on
device, transfer-dominated on this harness), and boot warmup moves the
multi-minute first-request compile out of the request path.

Run: ``python bin/serve_study.py`` (uses the device jax selects).
"""

from __future__ import annotations

import json
import sys
import tempfile
import threading
import time
import urllib.request
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench  # scene/model builders (repo root)  # noqa: E402

OUT = REPO / "docs" / "perf" / "serve_study.json"
N_SCENES = 4
REPEATS = 3  # best-of, tunnel variance


def _post(base: str, path: str, payload: dict, timeout: float = 1800) -> dict:
    req = urllib.request.Request(
        base + path, data=json.dumps(payload).encode(), method="POST"
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read())


def main() -> int:
    from floodsr_tpu.serve import TohrService, make_server

    with tempfile.TemporaryDirectory(prefix="floodsr-servestudy-") as tmp:
        root = Path(tmp)
        scene = bench._make_scene(root)
        model_fp = bench._make_model(root)
        hr_shape = bench.HR_SHAPE

        def jobs_for(tag: str) -> list[dict]:
            return [
                {
                    "in": str(scene["lr"]),
                    "dem": str(scene["dem"]),
                    "out": str(root / f"{tag}_{i}.tif"),
                }
                for i in range(N_SCENES)
            ]

        service = TohrService(
            model_version="ResUNet_16x_DEM", model_fp=model_fp
        )
        service.start()
        server = make_server(service)
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        thread.start()
        base = f"http://127.0.0.1:{server.server_port}"
        results: dict = {
            "date": time.strftime("%Y-%m-%d"),
            "scene": f"{bench.LR_SHAPE[0]}^2 LR -> {hr_shape[0]}^2 HR",
            "n_scenes": N_SCENES,
            "repeats_best_of": REPEATS,
        }
        try:
            # Cold first request (no warmup): the request pays the compile.
            t0 = time.perf_counter()
            _post(base, "/v1/tohr", jobs_for("cold")[0])
            results["first_request_cold_s"] = round(time.perf_counter() - t0, 3)

            # Warmup is idempotent here (bucket already compiled) — measure
            # the warmed first-request latency as the steady floor.
            service.warmup([hr_shape])
            t0 = time.perf_counter()
            _post(base, "/v1/tohr", jobs_for("warmfirst")[0])
            results["first_request_warm_s"] = round(time.perf_counter() - t0, 3)

            def best_of(fn) -> float:
                times = []
                for _ in range(REPEATS):
                    t0 = time.perf_counter()
                    fn()
                    times.append(time.perf_counter() - t0)
                return min(times)

            # Library floor: run_many directly on the daemon's worker.
            lib_s = best_of(
                lambda: service._worker.run_many(
                    [
                        {
                            "depth_lr_fp": scene["lr"],
                            "dem_hr_fp": scene["dem"],
                            "output_fp": root / "lib.tif",
                        }
                        for _ in range(N_SCENES)
                    ]
                )
            )

            batch_s = best_of(
                lambda: _post(
                    base, "/v1/tohr_many", {"jobs": jobs_for("batch")}
                )
            )

            def singles():
                for job in jobs_for("single"):
                    _post(base, "/v1/tohr", job)

            single_s = best_of(singles)

            mp = N_SCENES * hr_shape[0] * hr_shape[1] / 1e6
            results["library_run_many"] = {
                "batch_wall_s": round(lib_s, 3),
                "per_scene_s": round(lib_s / N_SCENES, 3),
                "e2e_mp_per_s": round(mp / lib_s, 2),
            }
            results["http_batch"] = {
                "batch_wall_s": round(batch_s, 3),
                "per_scene_s": round(batch_s / N_SCENES, 3),
                "e2e_mp_per_s": round(mp / batch_s, 2),
                "overhead_vs_library_ms_per_scene": round(
                    (batch_s - lib_s) / N_SCENES * 1000, 1
                ),
            }
            results["http_single_requests"] = {
                "batch_wall_s": round(single_s, 3),
                "per_scene_s": round(single_s / N_SCENES, 3),
                "e2e_mp_per_s": round(mp / single_s, 2),
                "overhead_vs_library_ms_per_scene": round(
                    (single_s - lib_s) / N_SCENES * 1000, 1
                ),
            }
            results["note"] = (
                "Same committed-seed scene and randomly-initialized flagship "
                "config as bench.py; e2e numbers are tunnel-transfer-"
                "dominated on this harness (bench.py docstring), so the "
                "load-bearing result is the HTTP-vs-library DELTA, not the "
                "absolute MP/s."
            )
        finally:
            server.shutdown()
            server.server_close()
            thread.join(timeout=10)
            service.close()

    OUT.write_text(json.dumps(results, indent=1) + "\n")
    print(json.dumps(results, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
