"""Entropy (KL-divergence) calibrator.

An extension beyond the reference's single MinMax method (its
CalibrationMethod enum has one member, ``_calibration/base.py:34-37``): the
clip threshold is chosen to minimize the KL divergence between the observed
activation distribution and its quantized (coarsely re-binned) approximation
— the TensorRT/MXNet entropy-calibration scheme. Where percentile clipping
fixes the kept MASS a priori, entropy clipping finds the threshold where the
information lost to saturating outliers balances the information lost to
coarser quantization bins, which adapts per tap to the actual tail shape.

Mechanics: a fixed-width histogram of |x| accumulates across batches (same
O(bins) growth-by-rebinning strategy as ``percentile.py``). At range time,
for every candidate threshold ``T = edge[i]`` the distribution is saturated
(mass above T folded into the last kept bin), re-binned to
``num_quantized_bins`` chunks, re-expanded uniformly over each chunk's
nonzero support, and scored with KL(P || Q); the minimizing threshold wins.
The search runs on magnitudes — the range is symmetric (−T, T) when negative
values were observed, (0, T) otherwise — matching the symmetric levels the
int8 activation paths use.
"""

from __future__ import annotations

import numpy as np

from onnx_quantize_tpu._logging import get_logger
from onnx_quantize_tpu.calibration.base import Calibrator

logger = get_logger(__name__)

__all__ = ["EntropyCalibrator"]


class _AbsHist:
    """Fixed-width histogram over magnitudes [0, hi], rebinned on growth."""

    def __init__(self, bins: int, hi: float):
        self.bins = bins
        self.hi = max(hi, 1e-12)
        self.counts = np.zeros(bins, dtype=np.int64)
        self.has_neg = False

    def _rebuild(self, hi: float) -> None:
        centers = (np.arange(self.bins) + 0.5) * (self.hi / self.bins)
        idx = np.clip((centers / hi * self.bins).astype(np.int64), 0, self.bins - 1)
        counts = np.zeros(self.bins, dtype=np.int64)
        np.add.at(counts, idx, self.counts)
        self.hi, self.counts = hi, counts

    def add(self, array: np.ndarray) -> None:
        self.has_neg = self.has_neg or bool((array < 0).any())
        mags = np.abs(array.ravel())
        amax = float(mags.max()) if mags.size else 0.0
        if amax > self.hi:
            self._rebuild(amax * 1.05)
        idx = np.clip(
            (mags / self.hi * self.bins).astype(np.int64), 0, self.bins - 1
        )
        np.add.at(self.counts, idx, 1)


def _kl_divergence(p: np.ndarray, q: np.ndarray) -> float:
    """KL(P || Q) over the support of P; Q floored to avoid log(0)."""
    mask = p > 0
    pm = p[mask] / p.sum()
    qm = np.maximum(q[mask] / max(q.sum(), 1e-300), 1e-300)
    return float(np.sum(pm * np.log(pm / qm)))


def _entropy_threshold(counts: np.ndarray, hi: float, num_quantized_bins: int) -> float:
    """Clip threshold minimizing KL(saturated P || re-expanded quantized Q)."""
    bins = len(counts)
    total = counts.sum()
    if total == 0:
        return 0.0
    n = num_quantized_bins
    if bins <= n:
        return hi
    counts = counts.astype(np.float64)
    tail = counts[::-1].cumsum()[::-1]  # tail[i] = sum(counts[i:])
    best_i, best_kl = bins, np.inf
    for i in range(n, bins + 1):
        raw = counts[:i]
        # Reference dist P: the slice with the clipped-off tail SATURATED
        # into the last kept bin. Candidate dist Q: the RAW slice re-binned
        # into n chunks and re-expanded uniformly over each chunk's nonzero
        # support (quantization cannot invent probability where none was
        # observed — and crucially Q never sees the saturated mass, so
        # aggressive clipping pays a KL penalty at the clip bin).
        p = raw.copy()
        p[i - 1] += tail[i] if i < bins else 0.0
        bounds = (np.arange(n + 1) * i) // n
        chunk_mass = np.add.reduceat(raw, bounds[:-1])
        nonzero = (raw > 0).astype(np.float64)
        chunk_support = np.add.reduceat(nonzero, bounds[:-1])
        chunk_id = np.repeat(np.arange(n), np.diff(bounds))
        q = nonzero * (chunk_mass / np.maximum(chunk_support, 1.0))[chunk_id]
        kl = _kl_divergence(p, q)
        if kl < best_kl:
            best_kl, best_i = kl, i
    return best_i * hi / bins


class EntropyCalibrator(Calibrator):
    """Range = symmetric clip at the KL-minimizing saturation threshold."""

    def __init__(self, bins: int = 2048, num_quantized_bins: int = 128,
                 momentum: float = 0.0):
        super().__init__()
        assert bins > num_quantized_bins > 0, (
            "need bins > num_quantized_bins > 0"
        )
        if momentum:
            # Accepted for CalibrationParams signature compatibility, but the
            # KL scheme accumulates a full histogram (no EMA smoothing).
            logger.warning(
                "EntropyCalibrator ignores momentum=%s: KL calibration "
                "accumulates histograms over all batches (no EMA).", momentum
            )
        self.bins = bins
        self.num_quantized_bins = num_quantized_bins
        self._hists: dict[str, _AbsHist] = {}

    def collect(self, name: str, array: np.ndarray) -> None:
        array = np.asarray(array, dtype=np.float32)
        if name not in self._hists:
            self._hists[name] = _AbsHist(self.bins, float(np.abs(array).max()))
        self._hists[name].add(array)
        self.data[name] = self._hists[name]  # presence marker

    def compute_range(self, name: str) -> tuple[np.ndarray, np.ndarray]:
        if name not in self._hists:
            raise KeyError(f"No calibration data collected for '{name}'")
        h = self._hists[name]
        t = _entropy_threshold(h.counts, h.hi, self.num_quantized_bins)
        lo = -t if h.has_neg else 0.0
        logger.debug("entropy range for %s: (%.6g, %.6g)", name, lo, t)
        # Zero stays representable, as in MinMax (ref minmax.py:83-87).
        return (
            np.array(min(lo, 0.0), dtype=np.float32),
            np.array(max(t, 0.0), dtype=np.float32),
        )
