"""MinMax calibrator with optional EMA momentum.

Parity with ``/root/reference/src/onnx_quantize/core/_calibration/minmax.py:11-87``:
strict min/max tracking by default; momentum > 0 switches to exponential moving
average smoothing across batches; final range is clamped to include zero.
"""

from __future__ import annotations

import numpy as np

from onnx_quantize_tpu._logging import get_logger
from onnx_quantize_tpu.calibration.base import CalibrationData, Calibrator

logger = get_logger(__name__)

__all__ = ["MinMaxCalibrator"]


class MinMaxCalibrator(Calibrator):
    def __init__(self, momentum: float = 0.0):
        super().__init__()
        assert 0 <= momentum < 1, "Momentum must be in the range [0, 1)."
        self.momentum = momentum
        logger.debug("Initialized MinMaxCalibrator with momentum=%s", momentum)

    def collect(self, name: str, array: np.ndarray) -> None:
        current_min = np.min(array)
        current_max = np.max(array)

        if name not in self.data:
            self.data[name] = CalibrationData(min_val=current_min, max_val=current_max)
            return

        entry = self.data[name]
        if self.momentum > 0:
            entry.min_val = self.momentum * entry.min_val + (1 - self.momentum) * current_min
            entry.max_val = self.momentum * entry.max_val + (1 - self.momentum) * current_max
        else:
            entry.min_val = np.minimum(entry.min_val, current_min)
            entry.max_val = np.maximum(entry.max_val, current_max)

    def compute_range(self, name: str) -> tuple[np.ndarray, np.ndarray]:
        if name not in self.data:
            raise KeyError(f"No calibration data collected for '{name}'")
        entry = self.data[name]
        # Include zero in the range so the zero point is exactly representable.
        min_val = np.minimum(entry.min_val, 0)
        max_val = np.maximum(entry.max_val, 0)
        return (
            np.array(min_val, dtype=np.float32),
            np.array(max_val, dtype=np.float32),
        )
