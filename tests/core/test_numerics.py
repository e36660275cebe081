import numpy as np
import pytest

from onnx_quantize_tpu.core.dtypes import QuantType
from onnx_quantize_tpu.core.enums import QuantizationStrategy
from onnx_quantize_tpu.core.numerics import (
    compute_min_max,
    compute_min_max_mse,
    compute_qparams_from_array,
    dequantize,
    fake_quantize,
    postprocess_array,
    preprocess_array,
    quantize_from_qparams,
)


@pytest.mark.parametrize(
    "fp_array, quant_type, symmetric, expected_scale, expected_zp",
    [
        # All zeros: degenerate range -> scale 1, zp at qmin (asym) / mid (sym).
        (np.array([0.0, 0.0, 0.0]), QuantType.QInt8, False, 1.0, -128),
        (np.array([0.0, 0.0, 0.0]), QuantType.QInt8, True, 1.0, 0),
        (np.array([0.0, 0.0, 0.0]), QuantType.QUInt8, False, 1.0, 0),
        # One-sided positive range.
        (np.array([0.0, 0.0, 5.0]), QuantType.QInt8, False, 5.0 / 255, -128),
        (np.array([0.0, 0.0, 5.0]), QuantType.QInt8, True, 5.0 / 127, 0),
        # One-sided negative range.
        (np.array([-5.0, -2.0, 0.0]), QuantType.QInt8, False, 5.0 / 255, 127),
        (np.array([-5.0, -2.0, 0.0]), QuantType.QInt8, True, 5.0 / 127, 0),
        # Standard two-sided. In float32 (the dtype of real weights, and what
        # the reference's numpy math uses on them) zp lands at -0.5000076 and
        # rounds to -1; the reference's own test gets 0 only because it feeds
        # float64 literals.
        (np.array([-5.0, 0.0, 5.0]), QuantType.QInt8, False, 10.0 / 255, -1),
        (np.array([-10.0, -5.0, 5.0, 10.0]), QuantType.QInt8, True, 10.0 / 127, 0),
        (np.array([0.0, 5.0, 10.0]), QuantType.QUInt8, False, 10.0 / 255, 0),
        # Symmetric unsigned: zero point at the range midpoint (128), scale uses
        # min(pos, neg) usable levels = 127.
        (np.array([0.0, 5.0, 10.0]), QuantType.QUInt8, True, 10.0 / 127, 128),
    ],
)
@pytest.mark.parametrize("mse", [False, True])
def test_qparams_golden_scalar(fp_array, quant_type, symmetric, mse, expected_scale, expected_zp):
    scale, zp = compute_qparams_from_array(
        fp_array.astype(np.float32),
        quant_type,
        QuantizationStrategy.TENSOR,
        group_size=-1,
        is_symmetric=symmetric,
        reduce_range=False,
        clip_ratio=1.0,
        mse=mse,
        scale_dtype=np.float32,
        zp_dtype=quant_type.container_dtype,
    )
    scale, zp = np.asarray(scale), np.asarray(zp)
    assert scale > 0 and scale.size == 1
    np.testing.assert_allclose(scale, np.float32(expected_scale), rtol=1e-5)
    assert zp.dtype == quant_type.container_dtype
    np.testing.assert_allclose(zp.astype(np.float32), np.float32(expected_zp), rtol=1e-5)
    qmin, qmax = quant_type.qrange(symmetric)
    assert qmin <= int(zp) <= qmax


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
def test_qparams_per_channel(fp_array, quant_type, symmetric, mse):
    scale, zp = compute_qparams_from_array(
        fp_array.astype(np.float32),
        quant_type,
        QuantizationStrategy.CHANNEL,
        group_size=-1,
        is_symmetric=symmetric,
        reduce_range=False,
        clip_ratio=1.0,
        mse=mse,
        scale_dtype=np.float32,
        zp_dtype=quant_type.container_dtype,
    )
    scale, zp = np.asarray(scale), np.asarray(zp)
    n = fp_array.shape[0]
    assert scale.shape == (n, 1)
    assert zp.shape == (n, 1)
    assert np.all(scale > 0)
    assert zp.dtype == quant_type.container_dtype
    qmin, qmax = quant_type.qrange(symmetric)
    assert np.all((zp.astype(np.int64) >= qmin) & (zp.astype(np.int64) <= qmax))


def test_min_max_clip_ratio_applied_before_zero_clamp():
    arr = np.array([[2.0, 4.0], [-4.0, -2.0]], dtype=np.float32)
    rmin, rmax = compute_min_max(arr, QuantizationStrategy.CHANNEL, clip_ratio=0.5)
    # Row 0: min 2*0.5=1 -> clamped to 0; max 4*0.5=2.
    np.testing.assert_allclose(np.asarray(rmin)[:, 0], [0.0, -2.0])
    np.testing.assert_allclose(np.asarray(rmax)[:, 0], [2.0, 0.0])


@pytest.mark.parametrize("strategy, group_size", [
    (QuantizationStrategy.TENSOR, -1),
    (QuantizationStrategy.CHANNEL, -1),
    (QuantizationStrategy.GROUP, 4),
])
def test_layout_roundtrip(rng, strategy, group_size):
    arr = rng.standard_normal((8, 6)).astype(np.float32)
    pre = preprocess_array(arr, strategy, group_size)
    post = postprocess_array(pre, arr.shape, strategy, group_size)
    np.testing.assert_array_equal(np.asarray(post), arr)


def test_group_layout_rows():
    # Group g of out-channel j must land at row j * n_groups + g.
    arr = np.arange(12, dtype=np.float32).reshape(4, 3)  # (in=4, out=3)
    pre = np.asarray(preprocess_array(arr, QuantizationStrategy.GROUP, 2))
    assert pre.shape == (6, 2)
    np.testing.assert_array_equal(pre[0], arr[0:2, 0])
    np.testing.assert_array_equal(pre[1], arr[2:4, 0])
    np.testing.assert_array_equal(pre[2], arr[0:2, 1])


def test_quantize_round_half_even():
    # jnp.round and np.round both round half to even (banker's rounding).
    arr = np.array([0.5, 1.5, 2.5, -0.5], dtype=np.float32)
    q = quantize_from_qparams(arr, 1.0, 0, QuantType.QInt8, False, False)
    np.testing.assert_array_equal(np.asarray(q), [0, 2, 2, 0])


def test_fake_quantize_reconstruction_bound(rng):
    arr = rng.standard_normal((16, 8)).astype(np.float32)
    scale, zp = compute_qparams_from_array(
        arr.T, QuantType.QInt8, QuantizationStrategy.CHANNEL, -1,
        is_symmetric=False, reduce_range=False, clip_ratio=1.0, mse=False,
        scale_dtype=np.float32, zp_dtype=np.int8,
    )
    dq = fake_quantize(arr.T, scale, zp, QuantType.QInt8, False, False)
    err = np.abs(np.asarray(dq) - arr.T)
    assert np.all(err <= 2 * np.asarray(scale))


def _mse_oracle(arr, quant_type, strategy, sym, rr,
                maxshrink=0.20, patience=5, grid=100.0, norm=2.4):
    """Straight numpy replication of the reference MSE loop (utils.py:140-239)."""
    from onnx_quantize_tpu.core.numerics import compute_qparams

    axis = None if strategy == QuantizationStrategy.TENSOR else 1
    keep = axis is not None
    rmin, rmax = compute_min_max(arr, strategy)
    rmin, rmax = np.asarray(rmin), np.asarray(rmax)
    best_err = np.full_like(rmin, np.finfo(np.float32).max)
    best_min, best_max = rmin.copy(), rmax.copy()
    no_improve = 0
    for i in range(int(maxshrink * grid)):
        p = 1 - i / grid
        s, z = compute_qparams(p * rmin, p * rmax, quant_type, sym, rr,
                               scale_dtype=np.float32, zp_dtype=np.float32)
        q = np.asarray(fake_quantize(arr, s, z, quant_type, sym, rr))
        err = np.sum(np.abs(q - arr) ** norm, axis=axis, keepdims=keep)
        improved = err < best_err
        if np.any(improved):
            best_err = np.where(improved, err, best_err)
            best_min = np.where(improved, p * rmin, best_min)
            best_max = np.where(improved, p * rmax, best_max)
            no_improve = 0
        else:
            no_improve += 1
        if no_improve >= patience:
            break
    return best_min, best_max


@pytest.mark.parametrize("strategy", [QuantizationStrategy.TENSOR, QuantizationStrategy.CHANNEL])
@pytest.mark.parametrize("qt, sym", [(QuantType.QInt4, False), (QuantType.QInt8, True)])
def test_mse_search_matches_oracle(rng, strategy, qt, sym):
    arr = rng.standard_normal((4, 64)).astype(np.float32)
    arr[0, 0] = 8.0  # mild outlier
    rmin, rmax = compute_min_max(arr, strategy)
    best_min, best_max = compute_min_max_mse(
        arr, qt, strategy, -1, is_symmetric=sym, reduce_range=False,
    )
    best_min, best_max = np.asarray(best_min), np.asarray(best_max)
    # Reference invariants: the searched range never exceeds the observed one.
    assert np.all(best_min >= np.asarray(rmin))
    assert np.all(best_max <= np.asarray(rmax))
    # Exact agreement with a host-side replication of the reference loop.
    o_min, o_max = _mse_oracle(arr, qt, strategy, sym, False)
    np.testing.assert_allclose(best_min, o_min, rtol=1e-6)
    np.testing.assert_allclose(best_max, o_max, rtol=1e-6)


def test_dequantize_with_preprocess_group(rng):
    arr = rng.standard_normal((8, 4)).astype(np.float32)
    gs = 4
    pre = preprocess_array(arr, QuantizationStrategy.GROUP, gs)
    scale, zp = compute_qparams_from_array(
        pre, QuantType.QUInt4, QuantizationStrategy.GROUP, gs,
        is_symmetric=False, reduce_range=False, clip_ratio=1.0, mse=False,
        scale_dtype=np.float32, zp_dtype=np.uint8,
    )
    q_pre = quantize_from_qparams(pre, scale, zp, QuantType.QUInt4, False, False)
    q = postprocess_array(q_pre, arr.shape, QuantizationStrategy.GROUP, gs)
    dq = dequantize(q, scale, zp, preprocess=True,
                    strategy=QuantizationStrategy.GROUP, group_size=gs)
    max_scale_err = 2 * float(np.max(np.asarray(scale)))
    assert np.max(np.abs(np.asarray(dq) - arr)) <= max_scale_err
