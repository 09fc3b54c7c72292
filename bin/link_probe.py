#!/usr/bin/env python
"""Characterize the device-host link that bounds single-scene e2e.

Measures, against whatever device JAX selects (the axon-tunnel TPU under
the driver; PCIe on a real TPU host):

1. blocking D2H of a fresh scene-sized uint16 array — wall vs process CPU
   time (network-bound vs CPU-bound);
2. pipelined ``copy_to_host_async`` band sets across byte volumes and
   granularities (the engine's actual transfer pattern,
   ``EngineJAX._finish_scene``) — MB/s best-of-N;
3. the uint16 vs 12-bit-packed payload sizes the ``output_transfer``
   modes ship (see docs/perf/link_study.json for the session-of-record
   numbers and the conclusion).

Prints one JSON document; run with ``--write`` to refresh the measurement
block inside docs/perf/link_study.json (conclusion text is preserved).
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

HR = (3840, 3840)  # bench scene (rss_mersch_A-shaped output)


def _blocking_probe(jax, reps: int = 3) -> dict:
    walls, cpus = [], []
    for _ in range(reps):
        d = jax.device_put(
            np.random.default_rng(0).integers(0, 65535, HR, np.uint16)
        )
        d.block_until_ready()
        t0w, t0c = time.perf_counter(), time.process_time()
        np.asarray(d)
        walls.append(round(time.perf_counter() - t0w, 3))
        cpus.append(round(time.process_time() - t0c, 3))
    return {"wall_s": walls, "cpu_s": cpus}


def _pipelined_probe(jax, shapes_dtypes, reps: int = 3) -> float:
    best = float("inf")
    for _ in range(reps):
        devs = []
        for shp, dt in shapes_dtypes:
            d = jax.device_put(np.zeros(shp, dt))
            d.block_until_ready()
            devs.append(d)
        t0 = time.perf_counter()
        for d in devs:
            d.copy_to_host_async()
        for d in devs:
            np.asarray(d)
        best = min(best, time.perf_counter() - t0)
    mb = sum(int(np.prod(s)) * np.dtype(d).itemsize for s, d in shapes_dtypes) / 1e6
    return round(mb / best, 1)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true",
                    help="refresh docs/perf/link_study.json's results block")
    args = ap.parse_args()
    import jax

    band = (512, HR[1])
    results = {
        "blocking_d2h_29p5MB": _blocking_probe(jax),
        "pipelined_d2h_mb_s": {
            "8x_512row_uint16_bands_29p5MB": _pipelined_probe(jax, [(band, np.uint16)] * 8),
            "1_blob_uint16_29p5MB": _pipelined_probe(jax, [(HR, np.uint16)]),
            "8x_uint8_bands_14p7MB": _pipelined_probe(jax, [(band, np.uint8)] * 8),
            "8x_12bit_equiv_bands_22p1MB": _pipelined_probe(
                jax, [((512, HR[1] // 4 * 3), np.uint16)] * 8
            ),
            "1_band_3p9MB": _pipelined_probe(jax, [(band, np.uint16)]),
        },
        "device": str(jax.devices()[0]),
        "date": time.strftime("%Y-%m-%d"),
    }
    print(json.dumps(results, indent=1))
    if args.write:
        fp = REPO / "docs" / "perf" / "link_study.json"
        doc = json.loads(fp.read_text())
        doc["results"].update(results)
        fp.write_text(json.dumps(doc, indent=2) + "\n")
        print(f"# refreshed {fp}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
