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

    # Pixel-center world coordinates per row (descending: north-up).
    y_centers = y0 + (np.arange(h, dtype=np.float64) + 0.5) * e

    # Gather every non-horizontal edge across all rings into flat arrays so
    # the scanline work is one vectorized pass (NRCan scenes carry tens of
    # thousands of footprints; a per-edge Python loop is minutes, this is
    # milliseconds — cost scales with actual edge/row crossings).
    ex1, ey1, ex2, ey2 = [], [], [], []
    for rings in polygons:
        for ring in rings:
            if len(ring) < 3:
                continue
            xs, ys = ring[:, 0], ring[:, 1]
            xn, yn = np.roll(xs, -1), np.roll(ys, -1)
            keep = ys != yn  # horizontal edges: no scanline crossing
            ex1.append(xs[keep])
            ey1.append(ys[keep])
            ex2.append(xn[keep])
            ey2.append(yn[keep])
    if not ex1:
        return np.zeros((h, w), dtype=bool)
    x1 = np.concatenate(ex1)
    yy1 = np.concatenate(ey1)
    x2 = np.concatenate(ex2)
    yy2 = np.concatenate(ey2)
    ylo = np.minimum(yy1, yy2)
    yhi = np.maximum(yy1, yy2)

    # Rows with ylo <= y_center < yhi (half-open: a vertex row counts for
    # exactly one of the two edges that meet there). y_centers is strictly
    # descending, so each edge's rows are one contiguous [start, end) range;
    # searchsorted compares against the same float values a direct
    # comparison would.
    neg_centers = -y_centers  # ascending
    start = np.searchsorted(neg_centers, -yhi, side="right")
    end = np.searchsorted(neg_centers, -ylo, side="right")
    counts = np.maximum(end - start, 0)
    total = int(counts.sum())
    if total == 0:
        return np.zeros((h, w), dtype=bool)

    edge_of = np.repeat(np.arange(x1.size, dtype=np.int64), counts)
    offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))
    rows = np.arange(total, dtype=np.int64) - np.repeat(offsets, counts)
    rows += np.repeat(start, counts)

    t = (y_centers[rows] - yy1[edge_of]) / (yy2[edge_of] - yy1[edge_of])
    x_cross = x1[edge_of] + t * (x2[edge_of] - x1[edge_of])
    # First pixel center at or right of the crossing; column w is the
    # overflow bin for crossings right of the raster (dropped below).
    cols = np.clip(
        np.ceil((x_cross - x0) / a - 0.5).astype(np.int64), 0, w
    )

    # Even-odd fill: sort the crossings within each row; parity flips at
    # each one, so consecutive pairs bound the odd-parity (inside) runs.
    # Every row's crossing count is even (closed rings + the half-open
    # vertex rule), so the sorted stream's global alternation aligns with
    # row boundaries. The delta image is int8 (+1 open / -1 close; runs are
    # disjoint after sorting, so the row cumsum stays in {0, 1}) — 8x less
    # memory than a count image, which matters for first-touch cost on
    # large grids (see docs/perf/hostmem_study.json).
    order = np.argsort(rows * np.int64(w + 1) + cols, kind="stable")
    flat = rows[order] * np.int64(w + 1) + cols[order]
    delta = np.zeros(h * (w + 1), dtype=np.int16)
    np.add.at(delta, flat[0::2], 1)
    np.add.at(delta, flat[1::2], -1)
    parity = np.cumsum(delta.reshape(h, w + 1)[:, :w], axis=1, dtype=np.int16)
    pmax = int(parity.max())
    assert 0 <= int(parity.min()) and pmax <= 1, (
        f"scanline parity invariant violated (range 0..{pmax}); "
        "likely >32767 coincident crossings in one cell"
    )
    return parity.astype(bool)


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
