"""Direct tests of horizontal fusion semantics (``nn/fuse.py``).

Fusion concatenates same-input linear sites along N; the contract is that the
fused site's output equals the concatenation of the per-site outputs exactly
(same packed data, same scale rows). Previously only exercised indirectly via
the engine; these pin the predicate and the numerics directly.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from onnx_quantize_tpu.algorithms.rtn import rtn_quantize
from onnx_quantize_tpu.core.dtypes import QuantType
from onnx_quantize_tpu.core.enums import QuantizationStrategy
from onnx_quantize_tpu.nn.fuse import can_fuse, fuse_sites
from onnx_quantize_tpu.nn.qtensor import make_qtensor
from onnx_quantize_tpu.ops.reference import quantized_matmul_jnp


def _qt(w, dtype=QuantType.QUInt4, strategy=QuantizationStrategy.GROUP, gs=16,
        symmetric=False):
    q, s, z = rtn_quantize(np.asarray(w), dtype, strategy, gs, symmetric, False)
    return make_qtensor(
        q, s, z, quant_type=dtype, strategy=strategy, group_size=gs,
        symmetric=symmetric, reduce_range=False,
    )


@pytest.fixture
def weights(rng):
    K = 32
    return [
        (0.1 * rng.standard_normal((K, n))).astype(np.float32) for n in (16, 24, 8)
    ]


def test_fused_quantized_matmul_equals_concat(rng, weights):
    qts = [_qt(w) for w in weights]
    sites = [{"w": t} for t in qts]
    assert can_fuse(sites)
    fused, sizes = fuse_sites(sites)
    assert sizes == [16, 24, 8]
    assert fused.meta.shape == (32, 48)

    x = jnp.asarray(rng.standard_normal((4, 32)), jnp.float32)
    y_fused = np.asarray(quantized_matmul_jnp(x, fused))
    y_parts = np.concatenate(
        [np.asarray(quantized_matmul_jnp(x, t)) for t in qts], axis=-1
    )
    # bit-identical up to f32 reduction order (XLA may re-associate the K sum)
    np.testing.assert_allclose(y_fused, y_parts, rtol=1e-5, atol=1e-6)


def test_fused_float_path(rng, weights):
    sites = [{"w": jnp.asarray(w)} for w in weights]
    assert can_fuse(sites)
    fused, sizes = fuse_sites(sites)
    assert fused.shape == (32, 48)
    np.testing.assert_array_equal(
        np.asarray(fused), np.concatenate(weights, axis=1)
    )


def test_reject_bias_and_prescale(rng, weights):
    qts = [_qt(w) for w in weights]
    assert not can_fuse([{"w": qts[0], "b": jnp.zeros(16)}, {"w": qts[1]}])
    assert not can_fuse([{"w": qts[0], "prescale": jnp.ones(32)}, {"w": qts[1]}])


def test_reject_mismatched_meta(rng, weights):
    a = _qt(weights[0])
    b_other_gs = _qt(weights[1], gs=8)
    b_other_dtype = _qt(weights[1], dtype=QuantType.QInt4, symmetric=True)
    assert not can_fuse([{"w": a}, {"w": b_other_gs}])
    assert not can_fuse([{"w": a}, {"w": b_other_dtype}])


def test_reject_tensor_strategy(rng, weights):
    qts = [
        _qt(w, dtype=QuantType.QInt8, strategy=QuantizationStrategy.TENSOR,
            gs=-1, symmetric=True)
        for w in weights
    ]
    assert not can_fuse([{"w": t} for t in qts])


def test_reject_mixed_quantized_float(rng, weights):
    assert not can_fuse([{"w": _qt(weights[0])}, {"w": jnp.asarray(weights[1])}])


def test_reject_mismatched_k(rng):
    a = jnp.asarray(rng.standard_normal((32, 8)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((16, 8)), jnp.float32)
    assert not can_fuse([{"w": a}, {"w": b}])


def test_fused_int8_channel(rng, weights):
    """Channel-strategy int8 fuses too (scales are per-N, concat along N)."""
    qts = [
        _qt(w, dtype=QuantType.QInt8, strategy=QuantizationStrategy.CHANNEL,
            gs=-1, symmetric=True)
        for w in weights
    ]
    sites = [{"w": t} for t in qts]
    assert can_fuse(sites)
    fused, _ = fuse_sites(sites)
    x = jnp.asarray(rng.standard_normal((4, 32)), jnp.float32)
    y_fused = np.asarray(quantized_matmul_jnp(x, fused))
    y_parts = np.concatenate(
        [np.asarray(quantized_matmul_jnp(x, t)) for t in qts], axis=-1
    )
    np.testing.assert_allclose(y_fused, y_parts, rtol=1e-5, atol=1e-6)
