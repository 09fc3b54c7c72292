"""HRDEM STAC backend — dependency-free STAC client + raster merge.

Reference parity (reference: ``floodsr/dem_sources/hrdem_stac.py``): query the
NRCan datacube STAC API for ``hrdem-mosaic-1m`` ``dtm`` assets intersecting
the low-res footprint (transformed to EPSG:4326), reproject each asset onto
the LR-CRS grid at source resolution, merge valid pixels, resolve nodata as
depth > source > −9999, write an LZW GeoTIFF, and cache results per session
keyed on sha256(crs|bounds|url|collection|asset)[:24].

Differences from the reference stack: the STAC search is a plain urllib POST
(pystac-client is not a dependency), asset reads go through this framework's
TIFF reader (remote hrefs are fetched whole — no range-read COG optimization
yet), and CRS transforms use :mod:`floodsr_tpu.dem_sources.geodesy`. The HTTP
transport is injectable (``set_transport``) so tests run offline.
"""

from __future__ import annotations

import hashlib
import json
import logging
import math
import shutil
import tempfile
from pathlib import Path
from typing import Callable
from urllib.request import Request, urlopen

import numpy as np

from floodsr_tpu.dem_sources.base import DemFetchResult
from floodsr_tpu.dem_sources.geodesy import transform_bounds
from floodsr_tpu.io.affine import from_bounds as bounds_to_transform
from floodsr_tpu.io.geotiff import raster_bounds, read_raster, write_raster
from floodsr_tpu.ops.resample import reproject_bilinear

SOURCE_ID = "hrdem"
STAC_URL = "https://datacube.services.geo.ca/api"
COLLECTION = "hrdem-mosaic-1m"
DEFAULT_ASSET = "dtm"

_SESSION_FETCH_CACHE: dict[str, Path] = {}

# Injectable transport: (url, data_bytes_or_None, headers) -> response bytes.
Transport = Callable[[str, bytes | None, dict[str, str]], bytes]


def _default_transport(url: str, data: bytes | None, headers: dict[str, str]) -> bytes:
    request = Request(url, data=data, headers=headers)
    with urlopen(request, timeout=120) as response:  # nosec B310
        return response.read()


_TRANSPORT: Transport = _default_transport


def set_transport(transport: Transport | None) -> None:
    """Override the HTTP transport (None restores the urllib default)."""
    global _TRANSPORT
    _TRANSPORT = transport or _default_transport


def _build_fetch_cache_key(
    *,
    depth_crs_repr: str,
    depth_bounds: tuple[float, float, float, float],
    stac_url: str,
    collection: str,
    asset_key: str,
) -> str:
    bounds_token = ",".join(f"{float(v):.8f}" for v in depth_bounds)
    payload = f"{depth_crs_repr}|{bounds_token}|{stac_url}|{collection}|{asset_key}"
    return hashlib.sha256(payload.encode("utf-8")).hexdigest()[:24]


def _resolve_temp_fetch_path(cache_key: str) -> Path:
    temp_root = Path(tempfile.gettempdir()) / "floodsr" / "hrdem-fetch"
    temp_root.mkdir(parents=True, exist_ok=True)
    return (temp_root / f"{cache_key}.tif").resolve()


def _resolve_depth_query_geometry(depth_lr_fp: str | Path) -> dict[str, object]:
    """LR raster geometry for the STAC query and output alignment."""
    depth_path = Path(depth_lr_fp).expanduser().resolve()
    assert depth_path.exists(), f"low-res depth raster does not exist: {depth_path}"
    _, depth_nodata, profile = read_raster(depth_path)
    depth_crs = profile["crs"]
    assert depth_crs is not None, (
        f"low-res depth CRS is required for STAC query: {depth_path}"
    )
    depth_bounds = tuple(float(v) for v in raster_bounds(profile))
    bbox_4326 = transform_bounds(depth_crs, "EPSG:4326", *depth_bounds, densify_pts=21)
    assert bbox_4326[0] < bbox_4326[2], f"invalid transformed bbox x ordering: {bbox_4326}"
    assert bbox_4326[1] < bbox_4326[3], f"invalid transformed bbox y ordering: {bbox_4326}"
    return {
        "depth_fp": depth_path,
        "depth_crs": depth_crs,
        "depth_bounds": depth_bounds,
        "depth_nodata": depth_nodata,
        "bbox_4326": tuple(float(v) for v in bbox_4326),
    }


def _query_hrdem_assets(
    *,
    bbox_4326: tuple[float, float, float, float],
    stac_url: str,
    collection: str,
    asset_key: str,
) -> tuple[list[str], list[str]]:
    """POST a STAC item search; return intersecting item ids + asset hrefs."""
    body = json.dumps(
        {"collections": [collection], "bbox": list(bbox_4326), "limit": 200}
    ).encode("utf-8")
    raw = _TRANSPORT(
        f"{stac_url.rstrip('/')}/search",
        body,
        {"Content-Type": "application/json", "Accept": "application/geo+json"},
    )
    payload = json.loads(raw.decode("utf-8"))
    items = payload.get("features", [])
    if not items:
        raise RuntimeError(
            f"HRDEM STAC query returned 0 items for bbox={bbox_4326} "
            f"collection={collection} at {stac_url}"
        )
    item_ids: list[str] = []
    asset_hrefs: list[str] = []
    for item in items:
        assets = item.get("assets", {})
        asset = assets.get(asset_key)
        if asset is None:
            continue
        href = asset.get("href")
        if href is None:
            continue
        item_ids.append(str(item.get("id")))
        asset_hrefs.append(str(href))
    if not asset_hrefs:
        raise RuntimeError(
            f"HRDEM STAC returned items but no '{asset_key}' assets for bbox={bbox_4326}"
        )
    return item_ids, asset_hrefs


def _open_asset(href: str) -> tuple[np.ndarray, float | None, dict]:
    """Read an asset raster: local paths directly, remote hrefs fetched whole."""
    if href.startswith(("http://", "https://")):
        raw = _TRANSPORT(href, None, {})
        with tempfile.NamedTemporaryFile(suffix=".tif", delete=False) as tmp:
            tmp.write(raw)
            tmp_path = Path(tmp.name)
        try:
            return read_raster(tmp_path)
        finally:
            tmp_path.unlink(missing_ok=True)
    return read_raster(href)


def write_dem_from_asset_hrefs(
    depth_lr_fp: str | Path,
    asset_hrefs: list[str],
    output_fp: str | Path,
    *,
    logger=None,
) -> Path:
    """Build and write one clipped/merged DEM from asset hrefs.

    Target grid: the LR bounds in the LR CRS at the first asset's source
    resolution; per-asset bilinear reprojection with valid-pixel merge.
    Assets in a different CRS than the depth raster are not supported by this
    offline stack (the HRDEM mosaic serves per-CRS assets).
    """
    log = logger or logging.getLogger(__name__)
    depth_query = _resolve_depth_query_geometry(depth_lr_fp)
    depth_crs = depth_query["depth_crs"]
    depth_bounds = depth_query["depth_bounds"]
    depth_nodata = depth_query["depth_nodata"]
    assert asset_hrefs, "asset_hrefs must not be empty"

    left, bottom, right, top = depth_bounds
    assert right > left and top > bottom, f"invalid depth bounds for fetch: {depth_bounds}"
    out_path = Path(output_fp).expanduser().resolve()
    out_path.parent.mkdir(parents=True, exist_ok=True)

    first_arr, first_nodata, first_profile = _open_asset(asset_hrefs[0])
    first_crs = first_profile["crs"]
    assert first_crs is not None, f"asset CRS is required: {asset_hrefs[0]}"
    if first_crs != depth_crs:
        raise AssertionError(
            f"asset CRS {first_crs} != depth CRS {depth_crs}: cross-CRS asset "
            "reprojection is not supported by the offline warp"
        )
    t = first_profile["transform"]
    target_res_x = abs(float(t.a))
    target_res_y = abs(float(t.e))
    source_nodata = first_nodata
    assert target_res_x > 0 and target_res_y > 0

    out_width = max(1, int(math.ceil((right - left) / target_res_x)))
    out_height = max(1, int(math.ceil((top - bottom) / target_res_y)))
    out_transform = bounds_to_transform(left, bottom, right, top, out_width, out_height)

    if depth_nodata is not None:
        dst_nodata = float(depth_nodata)
    elif source_nodata is not None:
        dst_nodata = float(source_nodata)
    else:
        dst_nodata = -9999.0

    work_nodata = np.float32(-3.4028235e38)
    merged = np.full((out_height, out_width), work_nodata, dtype=np.float32)
    valid_mask = np.zeros((out_height, out_width), dtype=bool)

    for idx, href in enumerate(asset_hrefs):
        if idx == 0:
            src_arr, src_nodata, src_profile = first_arr, first_nodata, first_profile
        else:
            src_arr, src_nodata, src_profile = _open_asset(href)
            assert src_profile["crs"] == depth_crs, f"asset CRS mismatch: {href}"
        reprojected = reproject_bilinear(
            src_arr,
            src_profile["transform"],
            (out_height, out_width),
            out_transform,
            src_nodata=src_nodata,
            dst_nodata=float(work_nodata),
        )
        current_valid = ~np.isclose(reprojected, work_nodata)
        if current_valid.any():
            merged[current_valid] = reprojected[current_valid]
            valid_mask |= current_valid

    if not valid_mask.any():
        raise RuntimeError(
            f"no valid DEM pixels found across {len(asset_hrefs)} assets "
            f"for bounds={depth_bounds}"
        )

    merged_to_write = np.where(valid_mask, merged, np.float32(dst_nodata)).astype(
        np.float32, copy=False
    )
    profile = {
        "driver": "GTiff",
        "height": out_height,
        "width": out_width,
        "count": 1,
        "dtype": "float32",
        "crs": depth_crs,
        "transform": out_transform,
        "nodata": dst_nodata,
        "compress": "LZW",
    }
    write_raster(out_path, merged_to_write, profile)
    log.info(f"wrote fetched HRDEM tile to\n    {out_path}")
    return out_path


def fetch_hrdem_for_lowres_tile(
    *,
    depth_lr_fp: str | Path,
    output_fp: str | Path | None = None,
    logger=None,
    stac_url: str = STAC_URL,
    collection: str = COLLECTION,
    asset_key: str = DEFAULT_ASSET,
) -> DemFetchResult:
    """Fetch one HRDEM tile aligned to a low-res depth raster footprint."""
    log = logger or logging.getLogger(__name__)
    depth_query = _resolve_depth_query_geometry(depth_lr_fp)
    depth_path = depth_query["depth_fp"]
    depth_crs = depth_query["depth_crs"]
    depth_bounds = depth_query["depth_bounds"]
    bbox_4326 = depth_query["bbox_4326"]
    depth_crs_repr = depth_crs.to_string() if depth_crs is not None else "unknown"

    log.info(
        "starting DEM fetch\n"
        f"  source_id={SOURCE_ID}\n  stac_url={stac_url}\n"
        f"  collection={collection}\n  asset_key={asset_key}\n"
        f"  depth_lr_fp=\n    {depth_path}"
    )
    cache_key = _build_fetch_cache_key(
        depth_crs_repr=depth_crs_repr,
        depth_bounds=depth_bounds,
        stac_url=stac_url,
        collection=collection,
        asset_key=asset_key,
    )

    item_ids: list[str] = []
    cached_fp = _SESSION_FETCH_CACHE.get(cache_key)
    if cached_fp is not None and cached_fp.exists():
        log.debug(f"HRDEM session-cache hit for key {cache_key}")
        if output_fp is None:
            dem_fp = cached_fp
        else:
            dem_fp = Path(output_fp).expanduser().resolve()
            dem_fp.parent.mkdir(parents=True, exist_ok=True)
            if dem_fp != cached_fp:
                shutil.copy2(cached_fp, dem_fp)
        return DemFetchResult(
            source_id=SOURCE_ID,
            dem_fp=dem_fp,
            stac_url=stac_url,
            collection=collection,
            asset_key=asset_key,
            item_ids=item_ids,
        )

    item_ids, asset_hrefs = _query_hrdem_assets(
        bbox_4326=bbox_4326,
        stac_url=stac_url,
        collection=collection,
        asset_key=asset_key,
    )
    log.info(f"found {len(item_ids)} HRDEM item(s) intersecting low-res tile bounds")

    target_fp = (
        _resolve_temp_fetch_path(cache_key)
        if output_fp is None
        else Path(output_fp).expanduser().resolve()
    )
    written_fp = write_dem_from_asset_hrefs(
        depth_lr_fp=depth_path,
        asset_hrefs=asset_hrefs,
        output_fp=target_fp,
        logger=log,
    )
    _SESSION_FETCH_CACHE[cache_key] = written_fp
    return DemFetchResult(
        source_id=SOURCE_ID,
        dem_fp=written_fp,
        stac_url=stac_url,
        collection=collection,
        asset_key=asset_key,
        item_ids=item_ids,
    )
