#!/usr/bin/env python
"""Measure the host allocator tuning (floodsr_tpu/hostmem.py) on raster I/O.

Isolates the host-side effect from TPU/tunnel variance: each trial is a
fresh subprocess that decodes a 3840x3840 float32 LZW GeoTIFF (the bench
scene's DEM shape, reference: ``tests/data/rss_mersch_A``) N times, with the
tuning on or off. On hosts with slow first-touch page faults (this harness
measures ~3 MB/s — see the module docstring) the untuned runs re-fault every
decode because glibc munmaps each large buffer on free.

Writes docs/perf/hostmem_study.json.
"""

from __future__ import annotations

import json
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_TRIAL = r"""
import sys, time, json
import numpy as np
sys.path.insert(0, {repo!r})
import os
os.environ["FLOODSR_HOST_MALLOC_TUNE"] = {tune!r}
from floodsr_tpu import hostmem
applied = hostmem.tune_malloc()
from floodsr_tpu.io.tiff import decode_tiff
data = open({tif!r}, "rb").read()
times = []
for _ in range({n}):
    t = time.perf_counter()
    arr, _tags = decode_tiff(data)
    times.append(time.perf_counter() - t)
    del arr
print(json.dumps({{"applied": applied, "decode_s": times}}))
"""


def main() -> int:
    import numpy as np

    sys.path.insert(0, str(REPO))
    from floodsr_tpu.io.tiff import encode_tiff

    rng = np.random.default_rng(20260817)
    dem = 300.0 + np.cumsum(
        rng.normal(0, 0.08, (3840, 3840)).astype(np.float32), axis=1
    )
    with tempfile.TemporaryDirectory() as td:
        tif = Path(td) / "dem.tif"
        tif.write_bytes(encode_tiff(dem, compression=5))

        results = {}
        for label, tune in [("untuned", "0"), ("tuned", "1")]:
            procs = []
            for rep in range(2):
                code = _TRIAL.format(repo=str(REPO), tune=tune, tif=str(tif), n=4)
                out = subprocess.run(
                    [sys.executable, "-c", code], capture_output=True, text=True,
                    timeout=600,
                )
                if out.returncode != 0:
                    print(out.stderr, file=sys.stderr)
                    return 1
                r = json.loads(out.stdout.strip().splitlines()[-1])
                procs.append(r)
                print(f"# {label}[{rep}]: {['%.2f' % t for t in r['decode_s']]} s",
                      file=sys.stderr)
            results[label] = {
                "applied": procs[0]["applied"],
                "decode_s": [p["decode_s"] for p in procs],
            }

    def steady(label: str) -> list[float]:
        return [t for run in results[label]["decode_s"] for t in run[1:]]

    study = {
        "scene": "3840x3840 float32 LZW GeoTIFF decode (bench DEM shape)",
        "method": "2 fresh subprocesses per config, 4 sequential decodes "
                  "each; 'steady' = decodes after the first per process. "
                  "The tuning keeps freed large buffers on the warm heap so "
                  "steady decodes never re-fault pages. Untuned is BIMODAL: "
                  "glibc's adaptive mmap threshold sometimes rescues the "
                  "process and sometimes leaves every decode re-faulting "
                  "(observed steady decodes of 13-16 s on this host).",
        "first_touch_fault_rate_mb_s_measured": 3.0,
        "results": results,
        "summary": {
            "untuned_steady_mean_s": round(float(np.mean(steady("untuned"))), 3),
            "untuned_steady_max_s": round(float(np.max(steady("untuned"))), 3),
            "tuned_steady_mean_s": round(float(np.mean(steady("tuned"))), 3),
            "tuned_steady_max_s": round(float(np.max(steady("tuned"))), 3),
        },
    }
    out_fp = REPO / "docs" / "perf" / "hostmem_study.json"
    out_fp.write_text(json.dumps(study, indent=1))
    print(json.dumps(study["summary"]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
