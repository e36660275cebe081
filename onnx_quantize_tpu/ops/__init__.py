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

__all__ = ["quantized_matmul", "set_impl", "get_impl", "convert_to_w4a8"]


def convert_to_w4a8(params):
    """Switch weights-only QTensors to the dynamic-int8-activation (A8) mode.

    Sets ``input_quant`` to dynamic symmetric int8 so the s8xs8 MXU kernels
    pick the sites up (4-bit weights -> W4A8 kernel; symmetric 8-bit weights
    -> W8A8 kernel). This is a TPU-side capability extension beyond the
    reference (whose config layer restricts 4-bit to weights-only,
    ``_qconfig.py:482-485``): the artifact is unchanged, only the execution
    spec differs. Skips HQQ weights (float zero points cannot center in int8).
    """
    import dataclasses

    import jax.numpy as jnp

    from onnx_quantize_tpu.nn.qtensor import ActQuantSpec

    def eligible(qt: QTensor) -> bool:
        if qt.meta.input_quant.mode != "none":
            return False
        if jnp.issubdtype(qt.zero_point.dtype, jnp.floating) and qt.meta.packed:
            return False
        if qt.meta.packed:
            return True
        return qt.meta.qt.bitwidth == 8 and qt.meta.symmetric

    def visit(tree):
        if isinstance(tree, dict):
            return {k: visit(v) for k, v in tree.items()}
        if isinstance(tree, QTensor) and eligible(tree):
            meta = dataclasses.replace(
                tree.meta,
                input_quant=ActQuantSpec(mode="dynamic", dtype="int8", symmetric=True),
            )
            return QTensor(
                tree.data, tree.scale, tree.zero_point, meta,
                tree.input_scale, tree.input_zero_point,
                tree.output_scale, tree.output_zero_point,
            )
        return tree

    return visit(params)

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
