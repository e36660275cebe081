"""W4A8 kernel: 4-bit grouped weights x dynamically-quantized int8 activations.

The BASELINE.json north-star configuration (Gemma-3 W4A8 group-128). The
activation is quantized per-tensor symmetric int8 by a jnp prologue (fused by
XLA); inside the kernel each packed group-pair tile unpacks to *centered* int8
weights ``(w - zp) in [-15, 15]`` so the MXU runs s8 x s8 -> int32 at twice the
bf16 rate, and the int32 per-group partial is requantized into the f32
accumulator with one ``x_scale * w_scale_g`` row multiply — the dequant cost
drops from O(gs*bn) elementwise per tile (W4 fp path) to O(bm*bn) per group.

This is a capability extension over the reference (whose validators restrict
4-bit to weights-only, ``_qconfig.py:482-485``); enable it on quantized params
with :func:`onnx_quantize_tpu.ops.convert_to_w4a8`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from onnx_quantize_tpu.core.enums import QFormat
from onnx_quantize_tpu.nn.qtensor import QTensor
from onnx_quantize_tpu.ops.kernels import register_kernel

__all__ = ["w4a8_matmul"]


def _w4a8_kernel(sx_ref, x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref, *,
                 gs, signed, n_k, ppb):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # ``ppb`` group pairs per grid step (statically unrolled) — per-grid-
    # instance overhead binds decode shapes, same as the W4 fp kernel.
    sx = sx_ref[0, 0]
    for p in range(ppb):
        w = w_ref[p * gs : (p + 1) * gs, :].astype(jnp.int32)
        low = w & 0x0F
        high = w >> 4  # u8 source: already 0..15
        if signed:
            low = jnp.where(low > 7, low - 16, low)
            high = jnp.where(high > 7, high - 16, high)
        # Dot the RAW nibbles (fit int8) and fold the integer zero point into
        # the (bm, bn) partial via the int x-sums — exact, since every term is
        # an integer well below 2^24:
        #   x @ (w - zp) == x @ w - sum(x) * zp.
        low_c = low.astype(jnp.int8)
        high_c = high.astype(jnp.int8)

        x = x_ref[:]
        lo = 2 * p * gs
        xl = x[:, lo : lo + gs]
        xh = x[:, lo + gs : lo + 2 * gs]
        acc_low = jax.lax.dot_general(
            xl, low_c, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        acc_high = jax.lax.dot_general(
            xh, high_c, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        xs_l = jnp.sum(xl.astype(jnp.int32), axis=1, keepdims=True).astype(jnp.float32)
        xs_h = jnp.sum(xh.astype(jnp.int32), axis=1, keepdims=True).astype(jnp.float32)
        acc_ref[:] += (
            (acc_low.astype(jnp.float32) - xs_l * z_ref[p, 0:1, :])
            * (sx * s_ref[p, 0:1, :])
            + (acc_high.astype(jnp.float32) - xs_h * z_ref[p, 1:2, :])
            * (sx * s_ref[p, 1:2, :])
        )

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


@functools.partial(
    jax.jit, static_argnames=("gs", "signed", "bm", "bn", "ppb", "interpret")
)
def _w4a8_call(sx, x_q, data, scales, zps, *, gs, signed, bm, bn, ppb, interpret):
    M, K_pad = x_q.shape
    half_rows, N = data.shape
    n_k = half_rows // gs // ppb
    kernel = functools.partial(_w4a8_kernel, gs=gs, signed=signed, n_k=n_k, ppb=ppb)
    return pl.pallas_call(
        kernel,
        grid=(M // bm, N // bn, n_k),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j, k: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((bm, 2 * ppb * gs), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ppb * gs, bn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ppb, 2, bn), lambda i, j, k: (k, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ppb, 2, bn), lambda i, j, k: (k, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * 2 * half_rows * N,
            bytes_accessed=M * K_pad + half_rows * N + M * N * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(sx, x_q, data, scales, zps)


def quantize_activation_int8(x):
    """Per-tensor symmetric int8: returns (x_q, scale). Fused by XLA."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return x_q, scale.astype(jnp.float32)


def w4a8_matmul(x, qt: QTensor, *, interpret: bool | None = None):
    """Dynamic-A8 x W4 matmul: ``quant(x) @ centered_int8(unpack(qt))``."""
    K, N = qt.meta.shape
    gs = qt.meta.pack_group
    half_rows = qt.data.shape[0]
    K_pad = 2 * half_rows
    G_pad = K_pad // gs

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    batch_shape = x.shape[:-1]
    M = int(np.prod(batch_shape)) if batch_shape else 1
    x2d = x.reshape(M, K)
    x_q, sx = quantize_activation_int8(x2d)
    if K_pad != K:
        x_q = _pad_axis(x_q, 1, K_pad)

    bm = min(256, max(8, M))
    x_q = _pad_axis(x_q, 0, bm)
    # Same instance-minimizing picker as the W4 fp kernel (the int8 dequant
    # tiles are smaller than its f32 ones, so its VMEM accounting is safe).
    from onnx_quantize_tpu.ops.kernels.matmul_w4 import _expand_scales, _pick_blocks

    bn, ppb = _pick_blocks(bm, N, gs, G_pad // 2)

    scales, zps = _expand_scales(qt, G_pad, N)
    scales = scales.reshape(G_pad // 2, 2, N)
    zps = zps.reshape(G_pad // 2, 2, N)

    out = _w4a8_call(
        sx.reshape(1, 1), x_q, jnp.asarray(qt.data), scales, zps,
        gs=gs, signed=qt.meta.qt.is_signed, bm=bm, bn=bn, ppb=ppb,
        interpret=interpret,
    )
    return out[:M].reshape(*batch_shape, N)


def _w4a8_predicate(x, qt: QTensor, bias) -> bool:
    if not qt.meta.packed or qt.meta.fmt != QFormat.QDQ:
        return False
    spec = qt.meta.input_quant
    if not (spec.mode == "dynamic" and spec.dtype == "int8" and spec.symmetric):
        return False
    # Integer zero points only (HQQ's float zp cannot be centered in int8).
    if jnp.issubdtype(qt.zero_point.dtype, jnp.floating):
        return False
    gs = qt.meta.pack_group
    K, N = qt.meta.shape
    if not (gs % 8 == 0 and N % 128 == 0):
        return False
    if jax.default_backend() == "tpu":
        return gs % 64 == 0
    return True


@register_kernel(_w4a8_predicate)
def _w4a8_kernel_entry(x, qt: QTensor, bias):
    from onnx_quantize_tpu.ops.reference import qdq_epilogue

    y = w4a8_matmul(x, qt)
    return qdq_epilogue(y, qt, bias)
