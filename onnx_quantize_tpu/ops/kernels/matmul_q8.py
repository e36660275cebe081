"""Full-integer QLinear matmul Pallas kernel (int8 x int8 -> int32 MXU).

The QLinearMatMul / ms-QGemm equivalent (``qfunctions/_qlinear/qmatmul.py:7-32``):
the input is statically quantized (uint8 inputs are shifted to int8 so the MXU
consumes s8 x s8), accumulation is int32 on the MXU, zero-point corrections use
exact int32 arithmetic (per-row x sums accumulated in scratch, per-column w
sums precomputed), and the epilogue requantizes with ``x_scale*w_scale/y_scale``
plus int32 bias before dequantizing the uint8 output back to f32 — matching
the jnp reference semantics bit-for-bit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from onnx_quantize_tpu.core.enums import QFormat, QuantizationStrategy
from onnx_quantize_tpu.nn.qtensor import QBias, QTensor
from onnx_quantize_tpu.ops.kernels import register_kernel

__all__ = ["q8_matmul"]


def _q8_kernel(szp_ref, sy_ref, x_ref, w_ref, wsum_ref, wzp_ref, req_ref, b_ref,
               o_ref, acc_ref, xsum_ref, *, n_k, K, oqmin, oqmax):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        xsum_ref[:] = jnp.zeros_like(xsum_ref)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    xsum_ref[:] += jnp.sum(x_ref[:].astype(jnp.int32), axis=1, keepdims=True)

    @pl.when(k == n_k - 1)
    def _():
        x_zp = szp_ref[0, 0]
        y_zp = szp_ref[0, 1]
        y_scale = sy_ref[0, 0]
        wzp = wzp_ref[0:1, :]
        corrected = (
            acc_ref[:]
            - x_zp * wsum_ref[0:1, :]
            - wzp * xsum_ref[:]
            + K * x_zp * wzp
            + b_ref[0:1, :]
        )
        y = corrected.astype(jnp.float32) * req_ref[0:1, :]
        y_q = jnp.clip(jnp.round(y) + y_zp.astype(jnp.float32), oqmin, oqmax)
        o_ref[:] = (y_q - y_zp.astype(jnp.float32)) * y_scale


def _pad_axis(a, axis, to):
    pad = (-a.shape[axis]) % to
    if pad == 0:
        return a
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, pad)
    return jnp.pad(a, widths)


@functools.partial(
    jax.jit, static_argnames=("bm", "bn", "bk", "K", "oqmin", "oqmax", "interpret")
)
def _q8_call(szp, sy, x_q, w_q, wsum, wzp, req, brow, *, bm, bn, bk, K,
             oqmin, oqmax, interpret):
    M, K_pad = x_q.shape
    _, N = w_q.shape
    n_k = K_pad // bk
    kernel = functools.partial(_q8_kernel, n_k=n_k, K=K, oqmin=oqmin, oqmax=oqmax)
    return pl.pallas_call(
        kernel,
        grid=(M // bm, N // bn, n_k),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i, j, k: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i, j, k: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bm, bn), jnp.int32),
            pltpu.VMEM((bm, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * K_pad * N,
            bytes_accessed=M * K_pad + K_pad * N + M * N * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(szp, sy, x_q, w_q, wsum, wzp, req, brow)


def q8_matmul(x, qt: QTensor, bias, *, interpret: bool | None = None):
    """Full QLinear execution of one site (input quant -> int matmul -> requant)."""
    K, N = qt.meta.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    in_spec = qt.meta.input_quant
    in_qt = in_spec.quant_type
    iqmin, iqmax = in_qt.qrange(in_spec.symmetric, in_spec.reduce_range)
    out_spec = qt.meta.output_quant
    oqmin, oqmax = out_spec.quant_type.qrange(out_spec.symmetric, out_spec.reduce_range)

    x_scale = jnp.asarray(qt.input_scale, jnp.float32)
    x_zp = jnp.asarray(qt.input_zero_point, jnp.int32)
    y_scale = jnp.asarray(qt.output_scale, jnp.float32)
    y_zp = jnp.asarray(qt.output_zero_point, jnp.int32)

    batch_shape = x.shape[:-1]
    M = int(np.prod(batch_shape)) if batch_shape else 1
    x2d = x.reshape(M, K)

    # Quantize the input (fused elementwise by XLA), shifting uint8 to int8 so
    # the MXU consumes s8 x s8.
    x_q = jnp.clip(jnp.round(x2d / x_scale).astype(jnp.int32) + x_zp, iqmin, iqmax)
    shift = 128 if not in_qt.is_signed else 0
    x_q8 = (x_q - shift).astype(jnp.int8)
    x_zp_eff = x_zp - shift

    # Shift unsigned weights into s8 (a plain cast would wrap values > 127);
    # shifting the zero point by the same amount keeps the centered product
    # (w - zp) exact.
    w_raw = jnp.asarray(qt.data)
    w_shift = 0 if qt.meta.qt.is_signed else 128
    w_q = (w_raw.astype(jnp.int32) - w_shift).astype(jnp.int8)
    w_scale = jnp.asarray(qt.scale, jnp.float32)
    w_zp = jnp.asarray(qt.zero_point, jnp.int32) - w_shift

    if qt.meta.strat == QuantizationStrategy.TENSOR:
        w_zp_row = jnp.full((1, N), w_zp, jnp.int32)
        req_row = jnp.full((1, N), x_scale * w_scale / y_scale, jnp.float32)
    else:  # CHANNEL
        w_zp_row = w_zp.reshape(1, N)
        req_row = (x_scale * w_scale / y_scale).reshape(1, N)
    wsum = jnp.sum(w_q.astype(jnp.int32), axis=0, keepdims=True)

    if bias is not None:
        assert isinstance(bias, QBias)
        brow = jnp.asarray(bias.data, jnp.int32).reshape(1, N)
    else:
        brow = jnp.zeros((1, N), jnp.int32)

    bk = 512 if K % 512 == 0 else (128 if K % 128 == 0 else K)
    K_pad = K + ((-K) % bk)
    if K_pad != K:
        # Zero padding on both operands cancels exactly in the correction
        # terms (the +K*x_zp*w_zp term uses the true K).
        x_q8 = _pad_axis(x_q8, 1, bk)
        w_q = _pad_axis(w_q, 0, bk)

    bm = min(256, max(8, M))
    x_q8 = _pad_axis(x_q8, 0, bm)
    bn = 256 if N % 256 == 0 else (128 if N % 128 == 0 else N)

    szp = jnp.stack([x_zp_eff, y_zp]).reshape(1, 2).astype(jnp.int32)
    sy = y_scale.reshape(1, 1)

    out = _q8_call(
        szp, sy, x_q8, w_q, wsum, w_zp_row, req_row, brow,
        bm=bm, bn=bn, bk=bk, K=K, oqmin=oqmin, oqmax=oqmax, interpret=interpret,
    )
    return out[:M].reshape(*batch_shape, N)


def _q8_predicate(x, qt: QTensor, bias) -> bool:
    if qt.meta.fmt != QFormat.QLINEAR:
        return False
    K, N = qt.meta.shape
    return N % 128 == 0 and qt.input_scale is not None and qt.output_scale is not None


@register_kernel(_q8_predicate)
def _q8_kernel_entry(x, qt: QTensor, bias):
    return q8_matmul(x, qt, bias)
