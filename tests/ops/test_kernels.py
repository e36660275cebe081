"""Pallas kernel vs jnp-reference equivalence (interpret mode on CPU).

The analogue of the reference's eager qfunction checks (SURVEY.md §3.5): every
kernel must match the pure-jnp semantics bit-for-bit (tight tolerance) on the
configs its predicate claims.
"""

import numpy as np
import pytest

from onnx_quantize_tpu.algorithms.rtn import quantize_bias, rtn_quantize
from onnx_quantize_tpu.core.dtypes import QuantType
from onnx_quantize_tpu.core.enums import QFormat, QuantizationStrategy
from onnx_quantize_tpu.nn.qtensor import ActQuantSpec, QBias, make_qtensor
from onnx_quantize_tpu.ops.kernels.matmul_q8 import q8_matmul
from onnx_quantize_tpu.ops.kernels.matmul_w4 import w4_dequant_matmul
from onnx_quantize_tpu.ops.kernels.matmul_w8 import w8_dequant_matmul
from onnx_quantize_tpu.ops.reference import dequantize_weight, quantized_matmul_jnp


def _qt(rng, K, N, qt_type, strategy, gs, sym=False, fmt=QFormat.QDQ, **extra):
    w = (0.1 * rng.standard_normal((K, N))).astype(np.float32)
    q, s, zp = rtn_quantize(w, qt_type, strategy, gs, sym, False)
    return make_qtensor(
        q, s, zp, quant_type=qt_type, strategy=strategy, group_size=gs,
        symmetric=sym, reduce_range=False, fmt=fmt, **extra,
    )


@pytest.mark.parametrize("qt_type", [QuantType.QUInt4, QuantType.QInt4])
@pytest.mark.parametrize("K, N, gs, strategy", [
    (64, 128, 16, QuantizationStrategy.GROUP),
    (128, 128, 32, QuantizationStrategy.GROUP),
    (96, 128, 32, QuantizationStrategy.GROUP),  # odd group count -> padding
    (64, 128, -1, QuantizationStrategy.CHANNEL),
    (64, 128, -1, QuantizationStrategy.TENSOR),
])
def test_w4_kernel_matches_reference(rng, qt_type, K, N, gs, strategy):
    qt = _qt(rng, K, N, qt_type, strategy, gs)
    x = rng.standard_normal((6, K)).astype(np.float32)
    y_kernel = np.asarray(w4_dequant_matmul(x, qt, interpret=True))
    y_ref = np.asarray(x @ np.asarray(dequantize_weight(qt)))
    np.testing.assert_allclose(y_kernel, y_ref, rtol=1e-5, atol=1e-5)


def test_w4_kernel_batched_input(rng):
    qt = _qt(rng, 64, 128, QuantType.QUInt4, QuantizationStrategy.GROUP, 16)
    x = rng.standard_normal((2, 3, 64)).astype(np.float32)
    y = np.asarray(w4_dequant_matmul(x, qt, interpret=True))
    assert y.shape == (2, 3, 128)
    y_ref = np.asarray(x @ np.asarray(dequantize_weight(qt)))
    np.testing.assert_allclose(y, y_ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("qt_type", [QuantType.QInt8, QuantType.QUInt8])
@pytest.mark.parametrize("K, N, gs, strategy", [
    (64, 128, 16, QuantizationStrategy.GROUP),
    (64, 128, -1, QuantizationStrategy.CHANNEL),
    (100, 128, -1, QuantizationStrategy.TENSOR),  # K padding
])
def test_w8_kernel_matches_reference(rng, qt_type, K, N, gs, strategy):
    qt = _qt(rng, K, N, qt_type, strategy, gs)
    x = rng.standard_normal((6, K)).astype(np.float32)
    y_kernel = np.asarray(w8_dequant_matmul(x, qt, interpret=True))
    y_ref = np.asarray(x @ np.asarray(dequantize_weight(qt)))
    np.testing.assert_allclose(y_kernel, y_ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("strategy", [QuantizationStrategy.TENSOR, QuantizationStrategy.CHANNEL])
@pytest.mark.parametrize("with_bias", [False, True])
@pytest.mark.parametrize("K", [64, 100])
@pytest.mark.parametrize("w_qt, w_sym", [
    (QuantType.QInt8, True),
    # uint8 weights regression: a plain int8 cast wraps values > 127.
    (QuantType.QUInt8, True),
    (QuantType.QUInt8, False),
])
def test_q8_kernel_matches_reference(rng, strategy, with_bias, K, w_qt, w_sym):
    N = 128
    w = (0.1 * rng.standard_normal((K, N))).astype(np.float32)
    q, s, zp = rtn_quantize(w, w_qt, strategy, -1, w_sym, False)
    x = rng.standard_normal((6, K)).astype(np.float32)

    in_scale = np.float32((np.max(x) - np.min(x)) / 255)
    in_zp = np.float32(128)
    y_ref_fp = x @ w
    o_scale = np.float32((y_ref_fp.max() - y_ref_fp.min()) / 255)
    o_zp = np.float32(round(float(np.clip(-y_ref_fp.min() / o_scale, 0, 255))))

    qt = make_qtensor(
        q, s, zp, quant_type=w_qt, strategy=strategy, group_size=-1,
        symmetric=w_sym, reduce_range=False, fmt=QFormat.QLINEAR,
        input_quant=ActQuantSpec(mode="static", dtype="uint8"),
        output_quant=ActQuantSpec(mode="static", dtype="uint8"),
        input_scale=in_scale, input_zero_point=in_zp,
        output_scale=o_scale, output_zero_point=o_zp,
    )
    bias = None
    if with_bias:
        b = (0.1 * rng.standard_normal((N,))).astype(np.float32)
        b_q, b_scale, _ = quantize_bias(b, in_scale, np.asarray(s, dtype=np.float32))
        bias = QBias(data=b_q, scale=b_scale, zero_point=np.int32(0), quant_type="int32")

    y_kernel = np.asarray(q8_matmul(x, qt, bias, interpret=True))
    y_ref = np.asarray(quantized_matmul_jnp(x, qt, bias))
    np.testing.assert_allclose(y_kernel, y_ref, rtol=1e-6, atol=1e-6)


def test_dispatch_selects_kernels(rng):
    """auto/pallas dispatch must route eligible configs to kernels and match."""
    from onnx_quantize_tpu.ops.dispatch import quantized_matmul_pallas
    from onnx_quantize_tpu.ops.kernels import select_kernel

    qt = _qt(rng, 64, 128, QuantType.QUInt4, QuantizationStrategy.GROUP, 16)
    x = rng.standard_normal((4, 64)).astype(np.float32)
    assert select_kernel(x, qt, None) is not None
    y = np.asarray(quantized_matmul_pallas(x, qt, None))
    y_ref = np.asarray(quantized_matmul_jnp(x, qt, None))
    np.testing.assert_allclose(y, y_ref, rtol=1e-5, atol=1e-5)

    # N not lane-tileable -> falls back to jnp.
    qt_small = _qt(rng, 64, 24, QuantType.QUInt4, QuantizationStrategy.GROUP, 16)
    assert select_kernel(x, qt_small, None) is None


def test_w4_predicate_prefill_m_routes_to_jnp(monkeypatch, rng):
    """At prefill-scale M the fused W4 kernel defers to the dequant+dense jnp
    path (MXU-compute-bound there; BENCH.md round 2 cont.)."""
    import jax
    import jax.numpy as jnp

    from onnx_quantize_tpu.ops.kernels.matmul_w4 import _w4_predicate

    qt = _qt(rng, 256, 128, QuantType.QUInt4, QuantizationStrategy.GROUP, 64)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert _w4_predicate(jnp.zeros((32, 256), jnp.bfloat16), qt, None) is True
    assert _w4_predicate(jnp.zeros((32, 16, 256), jnp.bfloat16), qt, None) is False
    # Decode steps — (B, 1, K) — stay on the fused kernel at ANY batch: the
    # dense path would re-materialize dequantized weights every scan step.
    assert _w4_predicate(jnp.zeros((256, 1, 256), jnp.bfloat16), qt, None) is True
    # One-shot 2D calls at compute-bound M route dense.
    assert _w4_predicate(jnp.zeros((256, 256), jnp.bfloat16), qt, None) is False
