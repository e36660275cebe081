"""Pallas-path dispatch for quantized matmuls.

Routes a QTensor execution to the fused Pallas kernel covering its config and
falls back to the jnp reference semantics for configs without a kernel (the
kernels land per-config; coverage is tracked in ``ops/kernels/``).
"""

from __future__ import annotations

from onnx_quantize_tpu.nn.qtensor import QTensor
from onnx_quantize_tpu.ops.reference import quantized_matmul_jnp

__all__ = ["quantized_matmul_pallas"]


def quantized_matmul_pallas(x, qt: QTensor, bias=None):
    from onnx_quantize_tpu.ops.kernels import select_kernel

    kernel = select_kernel(x, qt, bias)
    if kernel is None:
        return quantized_matmul_jnp(x, qt, bias)
    return kernel(x, qt, bias)
