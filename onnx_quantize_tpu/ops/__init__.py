"""Quantized op dispatch.

``quantized_matmul`` is the single execution chokepoint for quantized linear
sites (the analogue of the reference's qfunction factory,
``qfunctions/factory.py:22``). The implementation is selected globally:

  * ``"jnp"``: the pure-jnp reference semantics (CPU tests, oracle).
  * ``"pallas"``: fused Pallas TPU kernels (production path).
  * ``"auto"``: pallas on TPU when a kernel covers the config, else jnp.
"""

from __future__ import annotations

import jax

from onnx_quantize_tpu.nn.qtensor import QTensor
from onnx_quantize_tpu.ops.reference import quantized_matmul_jnp

__all__ = ["quantized_matmul", "set_impl", "get_impl"]

_IMPL = "auto"


def set_impl(impl: str) -> None:
    global _IMPL
    assert impl in {"auto", "jnp", "pallas"}, impl
    _IMPL = impl


def get_impl() -> str:
    return _IMPL


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def quantized_matmul(x, qt: QTensor, bias=None):
    impl = _IMPL
    if impl == "auto":
        impl = "pallas" if _on_tpu() else "jnp"
    if impl == "pallas":
        from onnx_quantize_tpu.ops.dispatch import quantized_matmul_pallas

        return quantized_matmul_pallas(x, qt, bias)
    return quantized_matmul_jnp(x, qt, bias)
