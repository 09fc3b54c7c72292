"""Common contracts for DEM source backends (reference parity:
``floodsr/dem_sources/base.py:7-16``)."""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path


@dataclass(frozen=True)
class DemFetchResult:
    """Structured output for one DEM fetch operation."""

    source_id: str
    dem_fp: Path
    stac_url: str
    collection: str
    asset_key: str
    item_ids: list[str] = field(default_factory=list)
