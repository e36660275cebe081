import numpy as np
import pytest

from onnx_quantize_tpu.algorithms.rtn import rtn_quantize
from onnx_quantize_tpu.core.dtypes import QuantType
from onnx_quantize_tpu.core.enums import QFormat, QuantizationStrategy
from onnx_quantize_tpu.nn.qtensor import ActQuantSpec, make_qtensor
from onnx_quantize_tpu.ops import convert_to_w4a8
from onnx_quantize_tpu.ops.kernels.matmul_w4a8 import w4a8_matmul
from onnx_quantize_tpu.ops.reference import quantized_matmul_jnp


def _w4a8_qt(rng, K=64, N=128, gs=16, sym=False, qt_type=QuantType.QUInt4):
    w = (0.1 * rng.standard_normal((K, N))).astype(np.float32)
    q, s, zp = rtn_quantize(w, qt_type, QuantizationStrategy.GROUP, gs, sym, False)
    return w, make_qtensor(
        q, s, zp, quant_type=qt_type, strategy=QuantizationStrategy.GROUP,
        group_size=gs, symmetric=sym, reduce_range=False, fmt=QFormat.QDQ,
        input_quant=ActQuantSpec(mode="dynamic", dtype="int8", symmetric=True),
    )


@pytest.mark.parametrize("qt_type", [QuantType.QUInt4, QuantType.QInt4])
@pytest.mark.parametrize("K, gs", [(64, 16), (96, 32)])
def test_w4a8_kernel_matches_jnp_semantics(rng, qt_type, K, gs):
    w, qt = _w4a8_qt(rng, K=K, gs=gs, qt_type=qt_type)
    x = rng.standard_normal((6, K)).astype(np.float32)
    y_kernel = np.asarray(w4a8_matmul(x, qt, interpret=True))
    # jnp semantics: dynamic int8 sym fake-quant of x, then fp matmul on
    # dequantized weights — the int-dot kernel must agree tightly.
    y_jnp = np.asarray(quantized_matmul_jnp(x, qt))
    np.testing.assert_allclose(y_kernel, y_jnp, rtol=2e-4, atol=2e-4)
    # and loosely with the fp original (W4 + A8 quantization error)
    np.testing.assert_allclose(y_kernel, x @ w, atol=0.35)


def test_dispatch_prefers_w4a8_kernel(rng):
    from onnx_quantize_tpu.ops.kernels import select_kernel
    from onnx_quantize_tpu.ops.kernels.matmul_w4a8 import _w4a8_kernel_entry

    w, qt = _w4a8_qt(rng)
    kernel = select_kernel(np.zeros((4, 64), np.float32), qt, None)
    assert kernel is _w4a8_kernel_entry


def test_convert_to_w4a8(rng):
    import jax

    import onnx_quantize_tpu as oqt
    from onnx_quantize_tpu.models.gemma3 import Gemma3, Gemma3Config

    model = Gemma3(Gemma3Config.tiny())
    params = model.init(jax.random.key(0))
    qc = oqt.QConfig(
        weights=oqt.QWeightArgs(dtype="uint4", group_size=32), ignore=["lm_head"]
    )
    qparams, _ = oqt.quantize(model, params, qc)
    a8 = convert_to_w4a8(qparams)
    qt = a8["layers.0"]["attn"]["q_proj"]["w"]
    assert qt.meta.input_quant.mode == "dynamic"
    assert qt.meta.input_quant.dtype == "int8"

    ids = np.array([[1, 2, 3, 4, 5, 6, 7, 8]], np.int32)
    y_w4 = np.asarray(model(qparams, ids))
    y_a8 = np.asarray(model(a8, ids))
    # A8 adds activation quantization error but stays close.
    assert np.all(np.isfinite(y_a8))
    rel = np.mean(np.abs(y_a8 - y_w4)) / np.mean(np.abs(y_w4))
    assert rel < 0.05


def test_convert_skips_hqq_float_zp(rng):
    from onnx_quantize_tpu.algorithms.hqq import hqq_quantize

    w = (0.1 * rng.standard_normal((64, 32))).astype(np.float32)
    q, s, zp = hqq_quantize(w, QuantType.QUInt4, 16)
    qt = make_qtensor(
        q, s, zp, quant_type=QuantType.QUInt4, strategy=QuantizationStrategy.GROUP,
        group_size=16, symmetric=False, reduce_range=False,
    )
    out = convert_to_w4a8({"site": {"w": qt}})
    assert out["site"]["w"].meta.input_quant.mode == "none"
