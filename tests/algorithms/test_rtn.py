import numpy as np
import pytest

from onnx_quantize_tpu.algorithms.rtn import quantize_bias, rtn_quantize
from onnx_quantize_tpu.core.dtypes import QuantType
from onnx_quantize_tpu.core.enums import QuantizationStrategy
from onnx_quantize_tpu.core.numerics import dequantize


@pytest.mark.parametrize("qt", [QuantType.QInt8, QuantType.QUInt8, QuantType.QInt4, QuantType.QUInt4])
@pytest.mark.parametrize("strategy, gs", [
    (QuantizationStrategy.TENSOR, -1),
    (QuantizationStrategy.CHANNEL, -1),
    (QuantizationStrategy.GROUP, 8),
])
@pytest.mark.parametrize("sym", [False, True])
def test_rtn_shapes_dtypes_ranges(rng, qt, strategy, gs, sym):
    K, N = 32, 12
    w = (0.1 * rng.standard_normal((K, N))).astype(np.float32)
    q, scale, zp = rtn_quantize(
        w, qt, strategy, gs, is_symmetric=sym, reduce_range=False,
        clip_ratio=1.0, mse=False, scale_dtype=np.float32, zp_dtype=qt.container_dtype,
    )
    assert q.shape == w.shape
    assert q.dtype == qt.container_dtype
    qmin, qmax = qt.qrange(sym)
    assert q.min() >= qmin and q.max() <= qmax

    if strategy == QuantizationStrategy.TENSOR:
        assert scale.ndim == 0
    elif strategy == QuantizationStrategy.CHANNEL:
        assert scale.shape == (N,)
    else:
        assert scale.shape == (N * (K // gs), 1)
    assert scale.dtype == np.float32
    assert np.all(scale > 0)


@pytest.mark.parametrize("strategy, gs", [
    (QuantizationStrategy.TENSOR, -1),
    (QuantizationStrategy.CHANNEL, -1),
    (QuantizationStrategy.GROUP, 16),
])
def test_rtn_reconstruction_error_bound(rng, strategy, gs):
    w = (0.1 * rng.standard_normal((64, 16))).astype(np.float32)
    q, scale, zp = rtn_quantize(
        w, QuantType.QInt8, strategy, gs, is_symmetric=False, reduce_range=False,
    )
    dq = np.asarray(dequantize(q, scale, zp, preprocess=True, strategy=strategy, group_size=gs))
    assert np.max(np.abs(dq - w)) <= 2 * float(np.max(scale))


@pytest.mark.parametrize("clip_ratio", [0.5, 0.9])
def test_rtn_clip_ratio_shrinks_scale(rng, clip_ratio):
    w = rng.standard_normal((32, 8)).astype(np.float32)
    _, s_full, _ = rtn_quantize(
        w, QuantType.QInt8, QuantizationStrategy.CHANNEL, -1, False, False
    )
    _, s_clip, _ = rtn_quantize(
        w, QuantType.QInt8, QuantizationStrategy.CHANNEL, -1, False, False,
        clip_ratio=clip_ratio,
    )
    assert np.all(s_clip <= s_full + 1e-8)


def test_rtn_mse_improves_or_matches_lp_error(rng):
    w = rng.standard_normal((64, 8)).astype(np.float32)
    w[0, 0] = 10.0
    def lp_err(mse):
        q, s, zp = rtn_quantize(
            w, QuantType.QInt4, QuantizationStrategy.CHANNEL, -1, False, False, mse=mse
        )
        dq = np.asarray(dequantize(q, s, zp, preprocess=True,
                                   strategy=QuantizationStrategy.CHANNEL, group_size=-1))
        return np.sum(np.abs(dq - w) ** 2.4)
    assert lp_err(True) <= lp_err(False) + 1e-6


def test_group_size_larger_than_in_channels_clamps(rng):
    w = rng.standard_normal((8, 4)).astype(np.float32)
    q, scale, zp = rtn_quantize(
        w, QuantType.QUInt4, QuantizationStrategy.GROUP, 32, False, False
    )
    # One group per out channel.
    assert scale.shape == (4, 1)


def test_quantize_bias_golden():
    bias = np.array([1.0, -2.0, 0.5], dtype=np.float32)
    qb, b_scale, b_zp = quantize_bias(bias, np.float32(0.1), np.array(0.05, dtype=np.float32))
    assert b_zp == 0
    np.testing.assert_allclose(b_scale, 0.005, rtol=1e-6)
    np.testing.assert_array_equal(qb, np.round(bias / 0.005).astype(np.int32))
    assert qb.dtype == np.int32


def test_quantize_bias_per_channel_weight_scale():
    bias = np.array([1.0, -2.0], dtype=np.float32)
    w_scale = np.array([0.05, 0.1], dtype=np.float32)
    qb, b_scale, _ = quantize_bias(bias, np.float32(0.2), w_scale)
    np.testing.assert_allclose(b_scale, [0.01, 0.02], rtol=1e-6)
    np.testing.assert_array_equal(qb, [100, -100])
