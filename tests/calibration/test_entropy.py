"""Entropy (KL-divergence) calibrator.

The clip threshold minimizes KL between the observed |x| distribution and
its ``num_quantized_bins``-level approximation (TensorRT scheme): heavy
tails get clipped, clean distributions keep (nearly) their full range, and
the resulting int8 quantization error on outlier-laden data must beat plain
min/max.
"""

import numpy as np
import pytest

import onnx_quantize_tpu as oqt
from onnx_quantize_tpu.calibration.entropy import EntropyCalibrator
from onnx_quantize_tpu.calibration.factory import get_calibrator
from onnx_quantize_tpu.calibration.minmax import MinMaxCalibrator


def test_entropy_clips_outliers(rng):
    c = EntropyCalibrator()
    data = rng.standard_normal(100_000).astype(np.float32)
    data[:50] = 1000.0  # 0.05% outliers
    c.collect("a", data)
    lo, hi = c.compute_range("a")
    assert hi < 100.0  # outliers saturated away
    assert hi > 1.0  # but the gaussian body is kept
    assert lo == -hi  # negative values observed -> symmetric range


def test_entropy_keeps_clean_range(rng):
    """No outliers: saturating loses information, so the threshold stays
    near the true maximum."""
    c = EntropyCalibrator()
    data = rng.uniform(-1.0, 1.0, 50_000).astype(np.float32)
    c.collect("a", data)
    lo, hi = c.compute_range("a")
    assert hi > 0.9
    assert lo == -hi


def test_entropy_beats_minmax_on_outliers(rng):
    """The point of the method: clipping the rare tail buys a much finer
    quantization step for the body — int8 error on the INLIER mass (where
    ~all the information is) drops by orders of magnitude vs min/max, at
    the cost of saturating the handful of outliers."""
    data = rng.standard_normal(100_000).astype(np.float32)
    data[:20] = 500.0
    body = data[np.abs(data) < 5.0]

    def body_mse(hi):
        scale = hi / 127.0
        q = np.clip(np.round(body / scale), -127, 127) * scale
        return float(np.mean((q - body) ** 2))

    e = EntropyCalibrator()
    e.collect("a", data)
    m = MinMaxCalibrator()
    m.collect("a", data)
    t_e = float(e.compute_range("a")[1])
    t_m = float(m.compute_range("a")[1])
    assert t_e < 0.2 * t_m  # tail clipped
    assert body_mse(t_e) < 0.01 * body_mse(t_m)


def test_nonnegative_data_keeps_zero_lo(rng):
    c = EntropyCalibrator()
    c.collect("a", rng.uniform(0.0, 5.0, 10_000).astype(np.float32))
    lo, hi = c.compute_range("a")
    assert lo == 0.0
    assert hi > 4.0


def test_accumulates_and_rebins_across_batches(rng):
    c = EntropyCalibrator(bins=256)
    c.collect("a", rng.standard_normal(1000).astype(np.float32))
    c.collect("a", (100 * rng.standard_normal(1000)).astype(np.float32))  # growth
    lo, hi = c.compute_range("a")
    assert np.isfinite(hi) and hi > 0
    assert lo == -hi


def test_factory_dispatch_and_validation():
    assert isinstance(get_calibrator("entropy"), EntropyCalibrator)
    with pytest.raises(AssertionError):
        EntropyCalibrator(bins=64, num_quantized_bins=128)
    with pytest.raises(KeyError):
        EntropyCalibrator().compute_range("missing")


def test_entropy_end_to_end_quantize(rng):
    """method="entropy" flows through QConfig -> calibrate -> static input
    qparams, and the quantized model stays close to fp on outlier-free data."""
    from tests.helpers import TwoMatMul

    model = TwoMatMul()
    x = rng.standard_normal((16, 16)).astype(np.float32)
    qc = oqt.QConfig(
        weights=oqt.QWeightArgs(dtype="int8"),
        input_activations=oqt.QActivationArgs(dtype="int8"),
        calibration_data=x,
        calibration_params=oqt.CalibrationParams(method="entropy"),
    )
    params = model.random_params(rng)
    qparams, plan = oqt.quantize(model, params, qc)
    for entry in plan:
        assert entry.input_scale is not None
    ref = np.asarray(model(params, x))
    out = np.asarray(model(qparams, x))
    err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 0.3  # int8 activations: flow correctness, not tight accuracy
