"""W8A8 kernel: symmetric int8 weights x dynamically-quantized int8 activations.

Companion to the W4A8 kernel for 8-bit weights: weights whose zero point is
trivially removable in int8 (signed symmetric zp=0, or unsigned symmetric
zp=128 shifted at load) feed the s8 x s8 MXU directly; the int32 per-K-tile
partial is requantized into the f32 accumulator with one ``x_scale * w_scale``
row multiply. Covers the performance mode of the reference's dynamic W8A8
configuration (its QDQ semantics remain available on the jnp path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from onnx_quantize_tpu.core.enums import QFormat, QuantizationStrategy
from onnx_quantize_tpu.nn.qtensor import QTensor
from onnx_quantize_tpu.ops.kernels import register_kernel

__all__ = ["w8a8_matmul"]


def _w8a8_kernel(sx_ref, x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_k, shift):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    if shift:
        # uint8 symmetric (zp=128): shift into s8 without changing centering.
        w = (w_ref[:].astype(jnp.int32) - 128).astype(jnp.int8)
    else:
        w = w_ref[:]
    acc32 = jax.lax.dot_general(
        x_ref[:], w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    acc_ref[:] += acc32.astype(jnp.float32) * (sx_ref[0, 0] * s_ref[0, 0:1, :])

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _pad_axis(a, axis, to):
    pad = (-a.shape[axis]) % to
    if pad == 0:
        return a
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, pad)
    return jnp.pad(a, widths)


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk", "shift", "interpret"))
def _w8a8_call(sx, x_q, data, scale_rows, *, bm, bn, bk, shift, interpret):
    M, K_pad = x_q.shape
    _, N = data.shape
    n_k = K_pad // bk
    kernel = functools.partial(_w8a8_kernel, n_k=n_k, shift=shift)
    return pl.pallas_call(
        kernel,
        grid=(M // bm, N // bn, n_k),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j, k: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bn), lambda i, j, k: (k, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(sx, x_q, data, scale_rows)


def w8a8_matmul(x, qt: QTensor, *, interpret: bool | None = None):
    from onnx_quantize_tpu.ops.kernels.matmul_w4a8 import quantize_activation_int8
    from onnx_quantize_tpu.ops.kernels.matmul_w8 import _scale_rows_for

    K, N = qt.meta.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    strat = qt.meta.strat
    if strat == QuantizationStrategy.GROUP:
        bk = qt.meta.group_size
    elif K <= 4096 and K % 8 == 0:
        bk = K
    else:
        bk = 512 if K % 512 == 0 else (128 if K % 128 == 0 else K)

    batch_shape = x.shape[:-1]
    M = int(np.prod(batch_shape)) if batch_shape else 1
    x2d = x.reshape(M, K)
    x_q, sx = quantize_activation_int8(x2d)
    data = jnp.asarray(qt.data)
    K_pad = K + ((-K) % bk)
    if K_pad != K:
        x_q = _pad_axis(x_q, 1, bk)
        data = _pad_axis(data, 0, bk)

    bm = min(256, max(8, M))
    x_q = _pad_axis(x_q, 0, bm)
    budget = 12 * 1024 * 1024
    bn = 128
    for cand in (2048, 1024, 512, 256, 128):
        if N % cand == 0 and bk * cand * 2 + bm * bk + 2 * bm * cand * 4 <= budget:
            bn = cand
            break

    scale_rows, _ = _scale_rows_for(qt, bk, K_pad, N)
    scale_rows = scale_rows.reshape(-1, 1, N)
    shift = not qt.meta.qt.is_signed

    out = _w8a8_call(
        sx.reshape(1, 1), x_q, data, scale_rows,
        bm=bm, bn=bn, bk=bk, shift=shift, interpret=interpret,
    )
    return out[:M].reshape(*batch_shape, N)


def _w8a8_predicate(x, qt: QTensor, bias) -> bool:
    if qt.meta.packed or qt.meta.fmt != QFormat.QDQ or qt.meta.qt.bitwidth != 8:
        return False
    spec = qt.meta.input_quant
    if not (spec.mode == "dynamic" and spec.dtype == "int8" and spec.symmetric):
        return False
    if not qt.meta.symmetric:
        return False  # general asym zp does not fit int8 after centering
    K, N = qt.meta.shape
    if N % 128 != 0:
        return False
    if jax.default_backend() == "tpu":
        if qt.meta.strat == QuantizationStrategy.GROUP:
            return qt.meta.group_size % 128 == 0
        return K % 128 == 0 or K <= 512
    if qt.meta.strat == QuantizationStrategy.GROUP:
        return qt.meta.group_size % 8 == 0
    return True


@register_kernel(_w8a8_predicate)
def _w8a8_kernel_entry(x, qt: QTensor, bias):
    from onnx_quantize_tpu.ops.reference import qdq_epilogue

    y = w8a8_matmul(x, qt)
    return qdq_epilogue(y, qt, bias)
