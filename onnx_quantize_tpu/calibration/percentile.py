"""Percentile calibrator (histogram-based).

An extension beyond the reference's single MinMax method (its
CalibrationMethod enum has one member, ``_calibration/base.py:34-37``), called
for by BASELINE.json config 3 ("min/max + percentile clip"): the activation
range is clipped to the [1-p, p] percentile of the observed distribution,
which is robust to the outliers that blow up plain min/max scales.

A fixed-width histogram per tap accumulates across batches; when a batch
exceeds the current range the histogram is rebuilt at double width (counts
rebinned), so memory stays O(bins) regardless of calibration size.
"""

from __future__ import annotations

import numpy as np

from onnx_quantize_tpu._logging import get_logger
from onnx_quantize_tpu.calibration.base import Calibrator

logger = get_logger(__name__)

__all__ = ["PercentileCalibrator"]


class _Hist:
    def __init__(self, bins: int, lo: float, hi: float):
        self.bins = bins
        self.lo = lo
        self.hi = max(hi, lo + 1e-12)
        self.counts = np.zeros(bins, dtype=np.int64)

    def _rebuild(self, lo: float, hi: float) -> None:
        old_edges = np.linspace(self.lo, self.hi, self.bins + 1)
        centers = (old_edges[:-1] + old_edges[1:]) / 2
        new = _Hist(self.bins, lo, hi)
        idx = np.clip(
            ((centers - lo) / (hi - lo) * self.bins).astype(np.int64), 0, self.bins - 1
        )
        np.add.at(new.counts, idx, self.counts)
        self.lo, self.hi, self.counts = new.lo, new.hi, new.counts

    def add(self, array: np.ndarray) -> None:
        amin, amax = float(array.min()), float(array.max())
        if amin < self.lo or amax > self.hi:
            span = max(amax, self.hi) - min(amin, self.lo)
            self._rebuild(min(amin, self.lo) - 0.05 * span, max(amax, self.hi) + 0.05 * span)
        idx = np.clip(
            ((array.ravel() - self.lo) / (self.hi - self.lo) * self.bins).astype(np.int64),
            0, self.bins - 1,
        )
        np.add.at(self.counts, idx, 1)

    def percentile_range(self, pct: float) -> tuple[float, float]:
        total = self.counts.sum()
        if total == 0:
            return 0.0, 0.0
        cdf = np.cumsum(self.counts) / total
        edges = np.linspace(self.lo, self.hi, self.bins + 1)
        lo_q = (1.0 - pct) / 2.0
        hi_q = 1.0 - lo_q
        lo_idx = int(np.searchsorted(cdf, lo_q))
        hi_idx = int(np.searchsorted(cdf, hi_q))
        return float(edges[lo_idx]), float(edges[min(hi_idx + 1, self.bins)])


class PercentileCalibrator(Calibrator):
    """Range = central ``percentile`` mass of the observed distribution."""

    def __init__(self, percentile: float = 0.999, bins: int = 2048, momentum: float = 0.0):
        super().__init__()
        assert 0 < percentile <= 1.0, "percentile must be in (0, 1]"
        del momentum  # accepted for CalibrationParams compatibility; unused
        self.percentile = percentile
        self.bins = bins
        self._hists: dict[str, _Hist] = {}

    def collect(self, name: str, array: np.ndarray) -> None:
        array = np.asarray(array, dtype=np.float32)
        if name not in self._hists:
            self._hists[name] = _Hist(self.bins, float(array.min()), float(array.max()))
        self._hists[name].add(array)
        self.data[name] = self._hists[name]  # presence marker

    def compute_range(self, name: str) -> tuple[np.ndarray, np.ndarray]:
        if name not in self._hists:
            raise KeyError(f"No calibration data collected for '{name}'")
        lo, hi = self._hists[name].percentile_range(self.percentile)
        # Zero stays representable, as in MinMax (ref minmax.py:83-87).
        return (
            np.array(min(lo, 0.0), dtype=np.float32),
            np.array(max(hi, 0.0), dtype=np.float32),
        )
