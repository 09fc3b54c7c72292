"""GeoJSON footprint loading and polygon rasterization (dependency-free).

The reference planned to consume NRCan's automatically-extracted building
footprints "similar to dem fetching" (reference ``docs/dev/adr/0016-buildings.md``)
but never built it; GDAL would have done the vector I/O + rasterization
there. Here the GeoJSON subset needed for footprints (FeatureCollection /
Feature / Polygon / MultiPolygon) is parsed with the stdlib, coordinates are
reprojected with the in-tree geodesy, and rasterization is an even-odd
parity scanline fill evaluated at pixel centers (GDAL's default
``all_touched=False`` convention).
"""

from __future__ import annotations

import json
import logging
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

# One polygon = [exterior_ring, hole_ring, ...]; ring = float64 [N, 2] (x, y).
Polygon = list


def _rings_of_polygon(coords) -> Polygon:
    rings = []
    for ring in coords:
        arr = np.asarray(ring, dtype=np.float64)
        if arr.ndim != 2 or arr.shape[1] < 2:
            raise ValueError(f"malformed polygon ring of shape {arr.shape}")
        rings.append(arr[:, :2])
    if not rings:
        raise ValueError("polygon with no rings")
    return rings


def _geometries(obj) -> list:
    """Flatten a GeoJSON object into geometry dicts (ignores null geometry)."""
    t = obj.get("type")
    if t == "FeatureCollection":
        out = []
        for feature in obj.get("features", []):
            out.extend(_geometries(feature))
        return out
    if t == "Feature":
        geom = obj.get("geometry")
        return _geometries(geom) if geom else []
    if t == "GeometryCollection":
        out = []
        for geom in obj.get("geometries", []):
            out.extend(_geometries(geom))
        return out
    if t in ("Polygon", "MultiPolygon"):
        return [obj]
    if t in ("Point", "MultiPoint", "LineString", "MultiLineString"):
        return []  # not area features; nothing to block
    raise ValueError(f"unsupported GeoJSON object type: {t!r}")


def _crs_of_geojson(obj) -> str | None:
    """Legacy GeoJSON ``crs`` member → 'EPSG:nnnn' string, if present."""
    crs = obj.get("crs")
    if not isinstance(crs, dict):
        return None
    name = str(crs.get("properties", {}).get("name", ""))
    # Accept both 'EPSG:2961' and 'urn:ogc:def:crs:EPSG::2961' spellings.
    if "EPSG" in name.upper():
        code = name.split(":")[-1]
        if code.isdigit():
            return f"EPSG:{code}"
    if "CRS84" in name.upper():
        return "EPSG:4326"
    return None


def load_footprints(
    src: str | Path | dict,
    dst_crs: str | None = None,
    src_crs: str | None = None,
) -> list[Polygon]:
    """Load polygons from GeoJSON (path, JSON text, or parsed dict).

    Coordinates are reprojected from ``src_crs`` to ``dst_crs`` via the
    in-tree geodesy when both are given and differ. ``src_crs`` defaults to
    the document's legacy ``crs`` member, else EPSG:4326 (the GeoJSON
    specification's mandate).
    """
    if isinstance(src, dict):
        obj = src
    else:
        text = Path(src).read_text() if Path(str(src)).exists() else str(src)
        obj = json.loads(text)

    effective_src = src_crs or _crs_of_geojson(obj) or "EPSG:4326"
    polygons: list[Polygon] = []
    for geom in _geometries(obj):
        if geom["type"] == "Polygon":
            polygons.append(_rings_of_polygon(geom["coordinates"]))
        else:  # MultiPolygon
            for poly in geom["coordinates"]:
                polygons.append(_rings_of_polygon(poly))

    if dst_crs is not None and _crs_key(effective_src) != _crs_key(dst_crs):
        from floodsr_tpu.dem_sources.geodesy import transform_points

        reprojected: list[Polygon] = []
        for rings in polygons:
            new_rings = []
            for ring in rings:
                pts = transform_points(
                    effective_src, dst_crs, [(float(x), float(y)) for x, y in ring]
                )
                new_rings.append(np.asarray(pts, dtype=np.float64))
            reprojected.append(new_rings)
        polygons = reprojected
    return polygons


def _crs_key(crs) -> str:
    return str(crs).strip().upper()


def rasterize_polygons(
    polygons: list[Polygon], transform, out_shape: tuple[int, int]
) -> np.ndarray:
    """Even-odd scanline fill of polygons, evaluated at pixel centers.

    ``transform`` is the raster's affine georeference (north-up rectilinear
    required). Returns a boolean ``[H, W]`` mask. Matches GDAL's
    ``all_touched=False`` center-containment convention; a pixel whose
    center lies exactly on a horizontal edge follows the half-open rule
    (bottom vertex included, top excluded), so shared edges never
    double-count.
    """
    h, w = int(out_shape[0]), int(out_shape[1])
    a, e = float(transform.a), float(transform.e)
    if transform.b or transform.d:
        raise ValueError("rasterize_polygons requires a rectilinear transform")
    if a <= 0 or e >= 0:
        raise ValueError("rasterize_polygons requires north-up pixels (a>0, e<0)")
    x0 = float(transform.c)
    y0 = float(transform.f)

    # Pixel-center world coordinates per row.
    y_centers = y0 + (np.arange(h, dtype=np.float64) + 0.5) * e

    # Parity image: +1 at the first pixel whose center x >= edge crossing;
    # cumulative sum along the row and odd parity = inside.
    delta = np.zeros((h, w + 1), dtype=np.int32)
    for rings in polygons:
        for ring in rings:
            if len(ring) < 3:
                continue
            xs = ring[:, 0]
            ys = ring[:, 1]
            x1, x2 = xs, np.roll(xs, -1)
            y1, y2 = ys, np.roll(ys, -1)
            for ex1, ey1, ex2, ey2 in zip(x1, y1, x2, y2):
                if ey1 == ey2:
                    continue  # horizontal edge: no scanline crossing
                ylo, yhi = (ey1, ey2) if ey1 < ey2 else (ey2, ey1)
                # Half-open [ylo, yhi): a vertex row counts for exactly one
                # of the two edges that meet there.
                rows = np.nonzero((y_centers >= ylo) & (y_centers < yhi))[0]
                if rows.size == 0:
                    continue
                t = (y_centers[rows] - ey1) / (ey2 - ey1)
                x_cross = ex1 + t * (ex2 - ex1)
                # First pixel center at or right of the crossing.
                cols = np.ceil((x_cross - x0) / a - 0.5).astype(np.int64)
                cols = np.clip(cols, 0, w)
                np.add.at(delta, (rows, cols), 1)
    parity = np.cumsum(delta[:, :w], axis=1)
    return (parity % 2).astype(bool)


def building_mask_for_grid(
    src: str | Path | dict,
    transform,
    out_shape: tuple[int, int],
    crs: str | None = None,
    src_crs: str | None = None,
    logger_=None,
) -> np.ndarray:
    """Convenience: load footprints and rasterize them onto a target grid."""
    log = logger_ or logger
    polygons = load_footprints(src, dst_crs=crs, src_crs=src_crs)
    mask = rasterize_polygons(polygons, transform, out_shape)
    log.info(
        f"building footprints: {len(polygons)} polygons -> "
        f"{int(mask.sum())}/{mask.size} blocked cells"
    )
    return mask
