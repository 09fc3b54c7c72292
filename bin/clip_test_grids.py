"""Prepare test-case rasters from larger source grids (no GDAL CLI needed).

Reference analog: ``bin/clip_test_grids.sh`` (a gdalwarp pipeline): keep the
low-res depth on its native grid (assigning a missing CRS from the DEM), and
clip the high-res truth depth + DEM to the low-res bounding box at a fixed
high-res resolution with nearest-neighbor resampling. This version uses the
framework's own raster I/O and warp, so it runs anywhere the package runs.

Usage:
    python bin/clip_test_grids.py --lowres LOW.tif --hires-depth HI.tif \
        --hires-dem DEM.tif --out-dir tests/data/my_case --hires-res 2.0
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from floodsr_tpu.io import read_raster, write_raster  # noqa: E402
from floodsr_tpu.io.affine import from_bounds  # noqa: E402
from floodsr_tpu.io.geotiff import raster_bounds  # noqa: E402
from floodsr_tpu.ops.resample import reproject_nearest  # noqa: E402


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--lowres", type=Path, required=True)
    parser.add_argument("--hires-depth", type=Path, required=True)
    parser.add_argument("--hires-dem", type=Path, required=True)
    parser.add_argument("--out-dir", type=Path, required=True)
    parser.add_argument("--hires-res", type=float, default=2.0)
    parser.add_argument("--nodata", type=float, default=-9999.0)
    args = parser.parse_args(argv)

    args.out_dir.mkdir(parents=True, exist_ok=True)

    lowres, lr_nodata, lr_profile = read_raster(args.lowres)
    dem, dem_nodata, dem_profile = read_raster(args.hires_dem)
    depth_hi, hi_nodata, hi_profile = read_raster(args.hires_depth)

    # Low-res stays on its native grid; inherit CRS from the DEM when absent.
    if lr_profile["crs"] is None:
        lr_profile = dict(lr_profile)
        lr_profile["crs"] = dem_profile["crs"]
        print(f"assigned lowres CRS from DEM: {dem_profile['crs']}")
    out_lr = args.out_dir / f"lowres{int(round(abs(lr_profile['transform'].a))):03d}.tif"
    write_raster(out_lr, lowres, {**lr_profile, "nodata": args.nodata, "compress": "LZW"})

    # Clip hires grids to the lowres bbox at the requested resolution.
    left, bottom, right, top = raster_bounds(lr_profile)
    res = float(args.hires_res)
    width = max(1, int(round((right - left) / res)))
    height = max(1, int(round((top - bottom) / res)))
    out_transform = from_bounds(left, bottom, right, top, width, height)

    def clip(arr, nodata, profile, name):
        fill = args.nodata if nodata is None else float(nodata)
        clipped = reproject_nearest(
            arr.astype(np.float32), profile["transform"], (height, width),
            out_transform, fill=np.float32(fill),
        )
        out_fp = args.out_dir / name
        write_raster(
            out_fp,
            clipped,
            {
                "height": height, "width": width, "count": 1, "dtype": "float32",
                "crs": profile["crs"], "transform": out_transform,
                "nodata": fill, "compress": "LZW",
            },
        )
        print(f"wrote {out_fp} ({height}x{width} @ {res} m)")

    tag = f"{int(round(res)):03d}"
    clip(depth_hi, hi_nodata, hi_profile, f"hires{tag}.tif")
    clip(dem, dem_nodata, dem_profile, f"hires{tag}_dem.tif")
    print(f"wrote {out_lr}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
