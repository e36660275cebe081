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


def _zp_oracle_python_loop(w_f, scale, zero_point, qmin, qmax,
                           lp_norm, beta, kappa, iters, early_stop):
    """Host-loop transcription of the reference's zp optimization
    (``/root/reference/src/onnx_quantize/core/_algorithms/hqq.py:106-144``):
    error of the current zp evaluated first, best-so-far tracking, break on
    the first non-improvement when early_stop."""
    import jax.numpy as jnp

    best_error = np.inf
    best_zp = np.asarray(zero_point).copy()
    inv_scale = 1.0 / jnp.asarray(scale)
    zp = jnp.asarray(zero_point)
    w_f = jnp.asarray(w_f)
    for _ in range(iters):
        w_q = jnp.clip(jnp.round(w_f * inv_scale + zp), qmin, qmax)
        w_r = (w_q - zp) / inv_scale
        err_term = w_f - w_r
        shrunk = jnp.sign(err_term) * jnp.maximum(
            0.0,
            jnp.abs(err_term)
            - (1.0 / beta) * jnp.power(jnp.abs(err_term) + 1e-8, lp_norm - 1),
        )
        beta *= kappa
        current_error = float(jnp.mean(jnp.abs(w_f - w_r)))
        if current_error < best_error:
            best_error = current_error
            best_zp = np.asarray(zp).copy()
        elif early_stop:
            break
        zp = jnp.mean(w_q - (w_f - shrunk) * inv_scale, axis=1, keepdims=True)
    return best_zp


@pytest.mark.parametrize("early_stop", [True, False])
@pytest.mark.parametrize("iters", [1, 7, 20])
def test_hqq_device_loop_matches_python_oracle(rng, early_stop, iters):
    """The lax.fori_loop rewrite must reproduce the host-synced loop exactly."""
    from onnx_quantize_tpu.algorithms.hqq import _optimize_zero_point
    from onnx_quantize_tpu.core.numerics import (
        compute_qparams_from_array,
        preprocess_array,
    )

    w = (0.3 * rng.standard_normal((64, 8)) ** 3).astype(np.float32)
    pre = preprocess_array(w, QuantizationStrategy.GROUP, 16)
    scale, zp0 = compute_qparams_from_array(
        pre, QuantType.QUInt4, QuantizationStrategy.GROUP, 16,
        is_symmetric=False, reduce_range=False,
        scale_dtype=np.float32, zp_dtype=np.float32,
    )
    got = _optimize_zero_point(
        pre, scale, zp0, QuantType.QUInt4, False,
        lp_norm=0.7, beta=10.0, kappa=1.01, iters=iters, early_stop=early_stop,
    )
    want = _zp_oracle_python_loop(
        pre, scale, zp0, 0.0, 15.0, 0.7, 10.0, 1.01, iters, early_stop
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=0, atol=1e-6)


@pytest.mark.parametrize("lp_norm, beta, kappa, iters", [(0.5, 5.0, 1.05, 5), (1.0, 20.0, 1.0, 10)])
def test_hqq_custom_params(rng, lp_norm, beta, kappa, iters):
    w = (0.1 * rng.standard_normal((32, 4))).astype(np.float32)
    q, scale, zp = hqq_quantize(
        w, QuantType.QUInt4, 16, lp_norm=lp_norm, beta=beta, kappa=kappa, iters=iters
    )
    assert q.shape == w.shape
