import numpy as np
import pytest

from onnx_quantize_tpu.algorithms.hqq import hqq_quantize
from onnx_quantize_tpu.core.dtypes import QuantType
from onnx_quantize_tpu.core.enums import QuantizationStrategy
from onnx_quantize_tpu.core.numerics import dequantize


@pytest.mark.parametrize("group_size", [16, 32])
@pytest.mark.parametrize("early_stop", [True, False])
def test_hqq_roundtrip(rng, group_size, early_stop):
    w = (0.1 * rng.standard_normal((64, 8))).astype(np.float32)
    q, scale, zp = hqq_quantize(
        w, QuantType.QUInt4, group_size, early_stop=early_stop
    )
    assert q.shape == w.shape
    assert q.dtype == np.uint8  # uint4 container
    assert q.min() >= 0 and q.max() <= 15
    # Float zero point is HQQ's signature.
    assert zp.dtype == np.float32
    n_groups_total = 8 * (64 // group_size)
    assert scale.shape == (n_groups_total, 1)
    dq = np.asarray(
        dequantize(q, scale, zp, preprocess=True,
                   strategy=QuantizationStrategy.GROUP, group_size=group_size)
    )
    np.testing.assert_allclose(dq, w, atol=0.5)


def test_hqq_improves_on_plain_rtn_zero_point(rng):
    from onnx_quantize_tpu.algorithms.rtn import rtn_quantize

    w = rng.standard_normal((128, 16)).astype(np.float32) ** 3  # heavy tails
    gs = 32
    q_h, s_h, z_h = hqq_quantize(w, QuantType.QUInt4, gs, iters=20, early_stop=False)
    q_r, s_r, z_r = rtn_quantize(
        w, QuantType.QUInt4, QuantizationStrategy.GROUP, gs, False, False,
        zp_dtype=np.float32,
    )
    dq_h = np.asarray(dequantize(q_h, s_h, z_h, preprocess=True,
                                 strategy=QuantizationStrategy.GROUP, group_size=gs))
    dq_r = np.asarray(dequantize(q_r, s_r, z_r, preprocess=True,
                                 strategy=QuantizationStrategy.GROUP, group_size=gs))
    assert np.mean(np.abs(dq_h - w)) <= np.mean(np.abs(dq_r - w)) + 1e-6


def test_hqq_requires_matching_scale_zp_dtype():
    with pytest.raises(AssertionError):
        hqq_quantize(
            np.zeros((32, 4), np.float32), QuantType.QUInt4, 16, zp_dtype=np.uint8
        )


@pytest.mark.parametrize("lp_norm, beta, kappa, iters", [(0.5, 5.0, 1.05, 5), (1.0, 20.0, 1.0, 10)])
def test_hqq_custom_params(rng, lp_norm, beta, kappa, iters):
    w = (0.1 * rng.standard_normal((32, 4))).astype(np.float32)
    q, scale, zp = hqq_quantize(
        w, QuantType.QUInt4, 16, lp_norm=lp_norm, beta=beta, kappa=kappa, iters=iters
    )
    assert q.shape == w.shape
