import numpy as np
import pytest

from onnx_quantize_tpu.calibration.percentile import PercentileCalibrator
from onnx_quantize_tpu.calibration.factory import get_calibrator


def test_percentile_clips_outliers(rng):
    c = PercentileCalibrator(percentile=0.98)
    data = rng.standard_normal(100_000).astype(np.float32)
    data[:50] = 1000.0  # 0.05% outliers
    c.collect("a", data)
    lo, hi = c.compute_range("a")
    assert hi < 10.0  # outliers clipped away
    assert lo < -1.0


def test_percentile_full_keeps_range(rng):
    c = PercentileCalibrator(percentile=1.0)
    data = rng.standard_normal(10_000).astype(np.float32)
    c.collect("a", data)
    lo, hi = c.compute_range("a")
    # Range edges within a histogram bin of the true extremes.
    bin_w = (data.max() - data.min()) * 1.2 / 2048 * 4
    assert abs(lo - data.min()) < bin_w + 0.05
    assert abs(hi - data.max()) < bin_w + 0.05


def test_percentile_accumulates_across_batches(rng):
    c = PercentileCalibrator(percentile=0.9)
    for _ in range(5):
        c.collect("a", rng.standard_normal(1000).astype(np.float32))
    lo, hi = c.compute_range("a")
    assert -2.5 < lo < -1.0 and 1.0 < hi < 2.5


def test_histogram_rebuild_on_range_growth(rng):
    c = PercentileCalibrator(percentile=1.0, bins=64)
    c.collect("a", np.linspace(0, 1, 100).astype(np.float32))
    c.collect("a", np.linspace(0, 100, 100).astype(np.float32))  # forces rebuild
    lo, hi = c.compute_range("a")
    assert hi > 90
    assert lo <= 0.0


def test_zero_in_range():
    c = PercentileCalibrator(percentile=1.0)
    c.collect("a", np.array([5.0, 6.0, 7.0], np.float32))
    lo, hi = c.compute_range("a")
    assert lo <= 0.0


def test_factory_dispatch():
    c = get_calibrator("percentile", percentile=0.9)
    assert isinstance(c, PercentileCalibrator)
    with pytest.raises(AssertionError):
        PercentileCalibrator(percentile=1.5)


def test_missing_key():
    with pytest.raises(KeyError):
        PercentileCalibrator().compute_range("missing")
