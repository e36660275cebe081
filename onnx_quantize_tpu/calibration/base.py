"""Calibrator framework: ABC + collected-statistics container.

Parity with ``/root/reference/src/onnx_quantize/core/_calibration/base.py:100-144``.
"""

from __future__ import annotations

import abc
import dataclasses

import numpy as np

__all__ = ["CalibrationData", "Calibrator"]


@dataclasses.dataclass
class CalibrationData:
    """Running statistics for one tapped activation."""

    min_val: np.ndarray
    max_val: np.ndarray


class Calibrator(abc.ABC):
    """Collects per-name activation statistics and produces quantization ranges."""

    def __init__(self):
        self.data: dict[str, CalibrationData] = {}

    @abc.abstractmethod
    def collect(self, name: str, array: np.ndarray) -> None:
        """Fold one activation batch into the running statistics for ``name``."""

    @abc.abstractmethod
    def compute_range(self, name: str) -> tuple[np.ndarray, np.ndarray]:
        """Final (min, max) quantization range for ``name``."""
