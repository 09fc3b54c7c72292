"""Self-contained map-projection math for DEM-source coordinate queries.

The reference leans on pyproj/GDAL for CRS transforms in exactly one place:
converting the low-res raster footprint to EPSG:4326 for the STAC bbox query
(reference: ``floodsr/dem_sources/hrdem_stac.py:61-67``). pyproj is not
available in this stack, so the projections that actually occur in the HRDEM
workflow are implemented directly (Snyder, *Map Projections — A Working
Manual*, USGS PP 1395):

- Transverse Mercator (UTM zones EPSG:326xx/327xx, plus parameterized TMs)
- Lambert Conformal Conic 2SP (EPSG:3978/3979 Canada Atlas/LCC)
- Web Mercator (EPSG:3857) and geographic passthrough (EPSG:4326/4269/4617)

Accuracy is series-level (sub-millimeter within a UTM zone) — far beyond what
a degree-resolution STAC bbox needs. Unknown EPSG codes raise with a clear
message instead of silently guessing.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from floodsr_tpu.io.crs import CRS

# GRS80 ellipsoid (NAD83 family); WGS84 differs in f by ~1e-10 — irrelevant here.
_A = 6378137.0
_F = 1.0 / 298.257222101
_E2 = _F * (2 - _F)
_E = math.sqrt(_E2)
_EP2 = _E2 / (1 - _E2)


def _mercator_m(phi: float) -> float:
    """Meridian arc length from the equator (Snyder eq. 3-21)."""
    e2, e4, e6 = _E2, _E2**2, _E2**3
    return _A * (
        (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * phi
        - (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * math.sin(2 * phi)
        + (15 * e4 / 256 + 45 * e6 / 1024) * math.sin(4 * phi)
        - (35 * e6 / 3072) * math.sin(6 * phi)
    )


@dataclass(frozen=True)
class TransverseMercator:
    lon0_deg: float
    lat0_deg: float = 0.0
    k0: float = 0.9996
    false_easting: float = 500000.0
    false_northing: float = 0.0

    def forward(self, lon_deg: float, lat_deg: float) -> tuple[float, float]:
        phi = math.radians(lat_deg)
        lam = math.radians(lon_deg)
        lam0 = math.radians(self.lon0_deg)
        sin_phi, cos_phi, tan_phi = math.sin(phi), math.cos(phi), math.tan(phi)
        n = _A / math.sqrt(1 - _E2 * sin_phi**2)
        t = tan_phi**2
        c = _EP2 * cos_phi**2
        a_ = (lam - lam0) * cos_phi
        m = _mercator_m(phi)
        m0 = _mercator_m(math.radians(self.lat0_deg))
        x = self.false_easting + self.k0 * n * (
            a_
            + (1 - t + c) * a_**3 / 6
            + (5 - 18 * t + t**2 + 72 * c - 58 * _EP2) * a_**5 / 120
        )
        y = self.false_northing + self.k0 * (
            m
            - m0
            + n
            * tan_phi
            * (
                a_**2 / 2
                + (5 - t + 9 * c + 4 * c**2) * a_**4 / 24
                + (61 - 58 * t + t**2 + 600 * c - 330 * _EP2) * a_**6 / 720
            )
        )
        return x, y

    def inverse(self, x: float, y: float) -> tuple[float, float]:
        m0 = _mercator_m(math.radians(self.lat0_deg))
        m = m0 + (y - self.false_northing) / self.k0
        mu = m / (_A * (1 - _E2 / 4 - 3 * _E2**2 / 64 - 5 * _E2**3 / 256))
        e1 = (1 - math.sqrt(1 - _E2)) / (1 + math.sqrt(1 - _E2))
        phi1 = (
            mu
            + (3 * e1 / 2 - 27 * e1**3 / 32) * math.sin(2 * mu)
            + (21 * e1**2 / 16 - 55 * e1**4 / 32) * math.sin(4 * mu)
            + (151 * e1**3 / 96) * math.sin(6 * mu)
            + (1097 * e1**4 / 512) * math.sin(8 * mu)
        )
        sin1, cos1, tan1 = math.sin(phi1), math.cos(phi1), math.tan(phi1)
        c1 = _EP2 * cos1**2
        t1 = tan1**2
        n1 = _A / math.sqrt(1 - _E2 * sin1**2)
        r1 = _A * (1 - _E2) / (1 - _E2 * sin1**2) ** 1.5
        d = (x - self.false_easting) / (n1 * self.k0)
        phi = phi1 - (n1 * tan1 / r1) * (
            d**2 / 2
            - (5 + 3 * t1 + 10 * c1 - 4 * c1**2 - 9 * _EP2) * d**4 / 24
            + (61 + 90 * t1 + 298 * c1 + 45 * t1**2 - 252 * _EP2 - 3 * c1**2)
            * d**6
            / 720
        )
        lam = math.radians(self.lon0_deg) + (
            d
            - (1 + 2 * t1 + c1) * d**3 / 6
            + (5 - 2 * c1 + 28 * t1 - 3 * c1**2 + 8 * _EP2 + 24 * t1**2) * d**5 / 120
        ) / cos1
        return math.degrees(lam), math.degrees(phi)


@dataclass(frozen=True)
class LambertConformalConic2SP:
    lat1_deg: float
    lat2_deg: float
    lat0_deg: float
    lon0_deg: float
    false_easting: float = 0.0
    false_northing: float = 0.0

    def _mt(self, phi: float) -> tuple[float, float]:
        sin_phi = math.sin(phi)
        m = math.cos(phi) / math.sqrt(1 - _E2 * sin_phi**2)
        t = math.tan(math.pi / 4 - phi / 2) / (
            ((1 - _E * sin_phi) / (1 + _E * sin_phi)) ** (_E / 2)
        )
        return m, t

    def _constants(self) -> tuple[float, float, float]:
        phi1 = math.radians(self.lat1_deg)
        phi2 = math.radians(self.lat2_deg)
        phi0 = math.radians(self.lat0_deg)
        m1, t1 = self._mt(phi1)
        m2, t2 = self._mt(phi2)
        _, t0 = self._mt(phi0)
        if math.isclose(phi1, phi2):
            n = math.sin(phi1)
        else:
            n = (math.log(m1) - math.log(m2)) / (math.log(t1) - math.log(t2))
        f = m1 / (n * t1**n)
        rho0 = _A * f * t0**n
        return n, f, rho0

    def forward(self, lon_deg: float, lat_deg: float) -> tuple[float, float]:
        n, f, rho0 = self._constants()
        phi = math.radians(lat_deg)
        _, t = self._mt(phi)
        rho = _A * f * t**n
        theta = n * (math.radians(lon_deg) - math.radians(self.lon0_deg))
        x = self.false_easting + rho * math.sin(theta)
        y = self.false_northing + rho0 - rho * math.cos(theta)
        return x, y

    def inverse(self, x: float, y: float) -> tuple[float, float]:
        n, f, rho0 = self._constants()
        dx = x - self.false_easting
        dy = rho0 - (y - self.false_northing)
        rho = math.copysign(math.hypot(dx, dy), n)
        t = (rho / (_A * f)) ** (1 / n)
        # Snyder eq. 14-11: negate both components when n < 0 (south-facing
        # cones); the signs of dx/dy themselves must be preserved.
        sign = 1.0 if n >= 0 else -1.0
        theta = math.atan2(sign * dx, sign * dy)
        lam = theta / n + math.radians(self.lon0_deg)
        phi = math.pi / 2 - 2 * math.atan(t)
        for _ in range(8):
            sin_phi = math.sin(phi)
            phi = math.pi / 2 - 2 * math.atan(
                t * ((1 - _E * sin_phi) / (1 + _E * sin_phi)) ** (_E / 2)
            )
        return math.degrees(lam), math.degrees(phi)


@dataclass(frozen=True)
class WebMercator:
    def forward(self, lon_deg: float, lat_deg: float) -> tuple[float, float]:
        x = _A * math.radians(lon_deg)
        y = _A * math.log(math.tan(math.pi / 4 + math.radians(lat_deg) / 2))
        return x, y

    def inverse(self, x: float, y: float) -> tuple[float, float]:
        lon = math.degrees(x / _A)
        lat = math.degrees(2 * math.atan(math.exp(y / _A)) - math.pi / 2)
        return lon, lat


@dataclass(frozen=True)
class Geographic:
    def forward(self, lon_deg: float, lat_deg: float) -> tuple[float, float]:
        return lon_deg, lat_deg

    def inverse(self, x: float, y: float) -> tuple[float, float]:
        return x, y


def projection_for(crs: CRS | str | int):
    """Projection object for an EPSG code; raises for unsupported codes."""
    crs = CRS.from_user_input(crs)
    code = crs.epsg
    if code in (4326, 4269, 4617, 4258):
        return Geographic()
    if code == 3857:
        return WebMercator()
    if 32601 <= code <= 32660:  # UTM north (WGS84)
        return TransverseMercator(lon0_deg=(code - 32600) * 6 - 183)
    if 32701 <= code <= 32760:  # UTM south
        return TransverseMercator(
            lon0_deg=(code - 32700) * 6 - 183, false_northing=10_000_000.0
        )
    if 26901 <= code <= 26923:  # UTM north (NAD83)
        return TransverseMercator(lon0_deg=(code - 26900) * 6 - 183)
    if 2944 <= code <= 2962:  # NAD83(CSRS) MTM/UTM Canada range (UTM part)
        pass
    if code in (3978, 3979):  # Canada Atlas Lambert (NAD83 / NAD83 CSRS)
        return LambertConformalConic2SP(
            lat1_deg=49.0, lat2_deg=77.0, lat0_deg=49.0, lon0_deg=-95.0
        )
    if code == 2169:  # Luxembourg 1930 / Gauss (TM; datum shift ignored ~0.1 km)
        return TransverseMercator(
            lon0_deg=6.166666666666667,
            lat0_deg=49.833333333333336,
            k0=1.0,
            false_easting=80000.0,
            false_northing=100000.0,
        )
    raise ValueError(
        f"unsupported CRS for coordinate transformation: EPSG:{code}. "
        "Supported: geographic (4326/4269/4617/4258), web mercator (3857), "
        "UTM (326xx/327xx/269xx), Canada Atlas Lambert (3978/3979), 2169."
    )


def transform_points(
    src_crs: CRS | str | int,
    dst_crs: CRS | str | int,
    points: list[tuple[float, float]],
) -> list[tuple[float, float]]:
    """Transform (x, y) points from src to dst CRS via geographic coordinates."""
    src = projection_for(src_crs)
    dst = projection_for(dst_crs)
    out = []
    for x, y in points:
        lon, lat = src.inverse(x, y)
        out.append(dst.forward(lon, lat))
    return out


def transform_bounds(
    src_crs: CRS | str | int,
    dst_crs: CRS | str | int,
    left: float,
    bottom: float,
    right: float,
    top: float,
    densify_pts: int = 21,
) -> tuple[float, float, float, float]:
    """Transform bounds with edge densification (pyproj/rasterio convention)."""
    assert densify_pts >= 2, "densify_pts must be >= 2"
    points: list[tuple[float, float]] = []
    for i in range(densify_pts + 1):
        f = i / densify_pts
        x = left + f * (right - left)
        points.append((x, bottom))
        points.append((x, top))
        y = bottom + f * (top - bottom)
        points.append((left, y))
        points.append((right, y))
    transformed = transform_points(src_crs, dst_crs, points)
    xs = [p[0] for p in transformed]
    ys = [p[1] for p in transformed]
    return (min(xs), min(ys), max(xs), max(ys))
