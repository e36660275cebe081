"""Fused W8 (int8/uint8) dequant-matmul Pallas kernel.

Covers per-tensor / per-channel / grouped 8-bit QDQ weights: the K-tile is
dequantized in VMEM using one scale row per tile (the wrapper normalizes all
strategies to ``(K/bk, N)`` scale rows so tensor/channel broadcast for free)
and fed straight to the MXU. This replaces the DequantizeLinear + MatMul pair
the reference emits (``qfunctions/_qdq/qmatmul.py:17-21``) with one fused op.
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

__all__ = ["w8_dequant_matmul"]


def _w8_kernel(x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref, *, n_k, symmetric,
               compute_dtype):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Scale row for this K tile arrives as a (1, 1, bn) block of (n_k, 1, N).
    # int32 intermediate: Mosaic lacks a direct u8->f32 cast for uint8 weights.
    # Both paths dot the raw casted weights and fold the dequant affine into
    # the (bm, bn) partial product (x @ ((w - zp) * s) == (x @ w - sum(x) * zp)
    # * s — scale/zp rows are constant within the K tile), keeping the per-
    # weight VPU chain to the cast alone.
    wq = w_ref[:].astype(jnp.int32).astype(jnp.float32).astype(compute_dtype)
    part = jnp.dot(x_ref[:], wq, preferred_element_type=jnp.float32)
    if symmetric:
        acc_ref[:] += part * s_ref[0, 0:1, :]
    else:
        xs = jnp.sum(x_ref[:].astype(jnp.float32), axis=1, keepdims=True)
        acc_ref[:] += (part - xs * z_ref[0, 0:1, :]) * s_ref[0, 0:1, :]

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
    jax.jit, static_argnames=("bm", "bn", "bk", "symmetric", "interpret", "out_dtype")
)
def _w8_call(x2d, data, scale_rows, zp_rows, *, bm, bn, bk, symmetric, interpret,
             out_dtype):
    M, K_pad = x2d.shape
    _, N = data.shape
    n_k = K_pad // bk
    kernel = functools.partial(
        _w8_kernel, n_k=n_k, symmetric=symmetric, compute_dtype=x2d.dtype
    )
    return pl.pallas_call(
        kernel,
        grid=(M // bm, N // bn, n_k),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bn), lambda i, j, k: (k, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bn), lambda i, j, k: (k, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * K_pad * N,
            bytes_accessed=M * K_pad * x2d.dtype.itemsize + K_pad * N + M * N * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2d, data, scale_rows, zp_rows)


_W8_BUDGET = 10 * 1024 * 1024


def _w8_step_bytes(bm, bk, bn, symmetric):
    # Weight tile (u8 + its bf16 cast; both paths now dot raw weights and
    # fold the dequant affine into the (bm, bn) partial) + x chunk + acc
    # scratch + out block. The largest on-chip-verified config sits at ~8M
    # under this accounting (640x4096 sym); the 10M budget keeps picks in
    # that proven range under the 16M/core scoped-vmem limit with Mosaic's
    # double buffering.
    del symmetric
    return bk * bn * 3 + bm * bk * 4 + 2 * bm * bn * 4


def _lane_divisors(n):
    lanes = n // 128
    return sorted((128 * k for k in range(1, lanes + 1) if lanes % k == 0),
                  reverse=True)


def _pick_bn(bm, N, bk, symmetric):
    for bn in _lane_divisors(N):
        if _w8_step_bytes(bm, bk, bn, symmetric) <= _W8_BUDGET:
            return bn
    return 128


def _pick_blocks_w8(bm, K, N, symmetric):
    """Joint (bk, bn) minimizing grid-instance count under the VMEM budget.

    Per-grid-instance overhead (~1.5 us on this runtime) binds decode shapes;
    a fixed power-of-two candidate list leaves non-power-of-two shapes (Gemma
    1B: K=6912, N=13824) with 10-50x more instances than needed."""
    bks = _lane_divisors(K) if K % 128 == 0 else []
    if K <= 4096 and K % 8 == 0 and K not in bks:
        bks.append(K)  # whole-K panel (odd shapes like the 640-row lm_head)
    if not bks:
        bks = [K]
    best, best_cost = (bks[-1], 128), None
    for bk in bks:
        n_k = -(-K // bk)
        for bn in _lane_divisors(N):
            if _w8_step_bytes(bm, bk, bn, symmetric) > _W8_BUDGET:
                continue
            instances = (N // bn) * n_k
            if best_cost is None or instances < best_cost:
                best, best_cost = (bk, bn), instances
            break  # smaller bn only adds instances for this bk
    return best


def _scale_rows_for(qt: QTensor, bk: int, K_pad: int, N: int):
    """Build (K_pad/bk, N) f32 scale/zp rows, one per K tile."""
    strat = qt.meta.strat
    n_k = K_pad // bk
    scale = jnp.asarray(qt.scale, jnp.float32)
    zp = jnp.asarray(qt.zero_point, jnp.float32)
    if strat == QuantizationStrategy.GROUP:
        # bk == group size (enforced by the predicate); pad rows with 1/0.
        G = scale.shape[0]
        if G != n_k:
            scale = jnp.concatenate([scale, jnp.ones((n_k - G, N), jnp.float32)], 0)
            zp = jnp.concatenate([zp, jnp.zeros((n_k - G, N), jnp.float32)], 0)
        return scale, zp
    if strat == QuantizationStrategy.CHANNEL:
        return (
            jnp.broadcast_to(scale[None, :], (n_k, N)),
            jnp.broadcast_to(zp[None, :], (n_k, N)),
        )
    return jnp.full((n_k, N), scale, jnp.float32), jnp.full((n_k, N), zp, jnp.float32)


def w8_dequant_matmul(x, qt: QTensor, *, interpret: bool | None = None):
    """``x @ dequant(qt)`` for 8-bit weights. x: (..., K)."""
    K, N = qt.meta.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    batch_shape = x.shape[:-1]
    M = int(np.prod(batch_shape)) if batch_shape else 1
    bm = min(256, max(8, M))
    symmetric = bool(qt.meta.symmetric)

    strat = qt.meta.strat
    if strat == QuantizationStrategy.GROUP:
        bk = qt.meta.group_size
        bn = _pick_bn(bm, N, bk, symmetric)
    else:
        bk, bn = _pick_blocks_w8(bm, K, N, symmetric)

    x2d = x.reshape(M, K)
    data = jnp.asarray(qt.data)
    K_pad = K + ((-K) % bk)
    if K_pad != K:
        x2d = _pad_axis(x2d, 1, bk)
        data = _pad_axis(data, 0, bk)
    x2d = _pad_axis(x2d, 0, bm)

    scale_rows, zp_rows = _scale_rows_for(qt, bk, K_pad, N)
    scale_rows = scale_rows.reshape(-1, 1, N)
    zp_rows = zp_rows.reshape(-1, 1, N)
    out = _w8_call(
        x2d, data, scale_rows, zp_rows,
        bm=bm, bn=bn, bk=bk, symmetric=symmetric, interpret=interpret,
        out_dtype=jnp.float32,
    )
    return out[:M].reshape(*batch_shape, N)


def _w8_predicate(x, qt: QTensor, bias) -> bool:
    if qt.meta.packed or qt.meta.fmt != QFormat.QDQ:
        return False
    if qt.meta.qt.bitwidth != 8:
        return False
    K, N = qt.meta.shape
    if N % 128 != 0:
        return False
    if jax.default_backend() == "tpu":
        if qt.meta.strat == QuantizationStrategy.GROUP:
            # bk == group size; the compiled lowering needs lane-tileable bk.
            return qt.meta.group_size % 128 == 0
        return K % 128 == 0 or K <= 512
    if qt.meta.strat == QuantizationStrategy.GROUP:
        return qt.meta.group_size % 8 == 0
    return True


@register_kernel(_w8_predicate)
def _w8_kernel_entry(x, qt: QTensor, bias):
    from onnx_quantize_tpu.ops.reference import qdq_epilogue, qdq_prologue

    x = qdq_prologue(x, qt)
    y = w8_dequant_matmul(x, qt)
    return qdq_epilogue(y, qt, bias)
