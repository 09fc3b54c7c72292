"""Minimal coordinate-reference-system representation keyed on EPSG codes.

GDAL/pyproj are not dependencies of this framework; the pipeline only needs
CRS identity (equality checks between depth and DEM rasters) and the
projected-vs-geographic distinction (reference guard at
``floodsr/preprocessing.py:304-324``). Full datum math is out of scope — the
HRDEM fetcher (the one consumer of coordinate conversion) carries its own
projection formulas in :mod:`floodsr_tpu.dem_sources.geodesy`.
"""

from __future__ import annotations

from dataclasses import dataclass


# EPSG codes in [4000, 5000) are (with rare geocentric exceptions irrelevant
# here) geographic 2-D systems; everything else this pipeline encounters is a
# projected system (UTM 326xx/327xx, national grids like 3979/2169, etc.).
_GEOGRAPHIC_RANGE = range(4000, 5000)


@dataclass(frozen=True)
class CRS:
    """A CRS identified by its EPSG code."""

    epsg: int

    @staticmethod
    def from_user_input(value: "CRS | str | int | None") -> "CRS | None":
        if value is None:
            return None
        if isinstance(value, CRS):
            return value
        if isinstance(value, int):
            return CRS(epsg=value)
        text = str(value).strip()
        if ":" in text:
            authority, _, code = text.rpartition(":")
            if authority.upper() not in {"EPSG", "URN:OGC:DEF:CRS:EPSG:"}:
                raise ValueError(f"unsupported CRS authority: {text}")
            return CRS(epsg=int(code))
        return CRS(epsg=int(text))

    @property
    def is_projected(self) -> bool:
        return self.epsg not in _GEOGRAPHIC_RANGE

    @property
    def is_geographic(self) -> bool:
        return not self.is_projected

    def to_string(self) -> str:
        return f"EPSG:{self.epsg}"

    def __str__(self) -> str:  # pragma: no cover - repr convenience
        return self.to_string()
