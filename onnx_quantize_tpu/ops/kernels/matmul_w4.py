"""Fused W4 (uint4/int4) grouped dequant-matmul Pallas kernel.

The MatMulNBits-equivalent flagship kernel (SURVEY.md §2B): packed 4-bit
weights are unpacked *in registers* inside the kernel — thanks to the
group-pair nibble layout (see ``nn/qtensor.py``), unpacking one packed
``(gs, bn)`` tile is two masked shifts producing the dequantized tiles of two
consecutive scale groups, each feeding an MXU dot against a contiguous
``(bm, gs)`` x-chunk. No sublane interleave, scales broadcast along the K-tile
from VMEM rows.

Grid: ``(M/bm, N/bn, G_pad/2)`` with the group-pair axis innermost,
accumulating in an f32 VMEM scratch and flushing on the last step.
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

__all__ = ["w4_dequant_matmul"]


def _w4_kernel(x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref, *, gs, signed, n_k,
               pairs_per_block, compute_dtype):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # ``pairs_per_block`` group pairs per grid step (statically unrolled):
    # small-K fat-N shapes (the 262k lm_head) are otherwise bound by per-grid-
    # instance overhead (~1.5 us each on this runtime), not bandwidth.
    for p in range(pairs_per_block):
        # Nibble unpack in registers. Mosaic lacks a direct u8->f32 cast, so
        # go through int32. The u8 source makes ``w >> 4`` already 0..15.
        w = w_ref[p * gs : (p + 1) * gs, :].astype(jnp.int32)
        low = w & 0x0F
        high = w >> 4
        if signed:
            low = jnp.where(low > 7, low - 16, low)
            high = jnp.where(high > 7, high - 16, high)
        # Raw nibble values are exact in bf16; the dequant affine moves OFF
        # the (gs, bn) weight tile and onto the (bm, bn) partial product:
        # scale/zp rows are constant within a tile, so
        #   x @ ((w - zp) * s) == (x @ w - sum(x) * zp) * s.
        # This cuts the VPU chain from ~6 ops/weight (sub, mul, casts) to the
        # unpack alone (~2.5) — at Gemma-1B decode shapes the old chain was
        # the binding cost (283 GB/s on gate_up vs W8's 643; BENCH.md r2).
        low_c = low.astype(jnp.float32).astype(compute_dtype)
        high_c = high.astype(jnp.float32).astype(compute_dtype)

        x = x_ref[:]
        lo = 2 * p * gs
        xl = x[:, lo : lo + gs]
        xh = x[:, lo + gs : lo + 2 * gs]
        dot_l = jnp.dot(xl, low_c, preferred_element_type=jnp.float32)
        dot_h = jnp.dot(xh, high_c, preferred_element_type=jnp.float32)
        # Scale/zp rows for groups 2(kP+p), 2(kP+p)+1. Scales arrive (G/2, 2, N)
        # blocked (P, 2, bn); the pair is selected by grid index + static p —
        # Mosaic cannot prove sublane alignment for dynamic 2k row slices.
        xs_l = jnp.sum(xl.astype(jnp.float32), axis=1, keepdims=True)
        xs_h = jnp.sum(xh.astype(jnp.float32), axis=1, keepdims=True)
        acc_ref[:] += (dot_l - xs_l * z_ref[p, 0:1, :]) * s_ref[p, 0:1, :] + (
            dot_h - xs_h * z_ref[p, 1:2, :]
        ) * s_ref[p, 1:2, :]

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _pad_axis(a, axis, to):
    size = a.shape[axis]
    pad = (-size) % to
    if pad == 0:
        return a
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, pad)
    return jnp.pad(a, widths)


@functools.partial(
    jax.jit,
    static_argnames=("gs", "signed", "bm", "bn", "ppb", "interpret", "out_dtype"),
)
def _w4_call(x2d, data, scales, zps, *, gs, signed, bm, bn, ppb, interpret,
             out_dtype):
    M, K_pad = x2d.shape
    half_rows, N = data.shape
    n_pairs = half_rows // gs
    n_k = n_pairs // ppb
    compute_dtype = x2d.dtype

    grid = (M // bm, N // bn, n_k)
    kernel = functools.partial(
        _w4_kernel, gs=gs, signed=signed, n_k=n_k, pairs_per_block=ppb,
        compute_dtype=compute_dtype,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
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
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * 2 * half_rows * N,
            bytes_accessed=M * K_pad * x2d.dtype.itemsize + half_rows * N + M * N * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2d, data, scales, zps)


def _expand_scales(qt: QTensor, G_pad: int, N: int):
    """Normalize scale/zp to (G_pad, N) f32 rows, padded with (1, 0).

    Inside a decode loop this pad/convert chain is NOT hoisted by XLA (it is
    memory-expanding), costing ~8 extra fused kernels per site per step —
    ``engine.prepare_kernel_scales`` pre-bakes the (G_pad/2, 2, N) layout at
    load time, which short-circuits here via the pair-layout passthrough."""
    strat = qt.meta.strat
    scale = jnp.asarray(qt.scale, jnp.float32)
    zp = jnp.asarray(qt.zero_point, jnp.float32)
    if scale.ndim == 3:  # already (G_pad/2, 2, N) kernel layout
        return scale.reshape(-1, N), zp.reshape(-1, N)
    if strat == QuantizationStrategy.GROUP:
        G = scale.shape[0]
        if G != G_pad:
            scale = jnp.concatenate(
                [scale, jnp.ones((G_pad - G, N), jnp.float32)], axis=0
            )
            zp = jnp.concatenate([zp, jnp.zeros((G_pad - G, N), jnp.float32)], axis=0)
        return scale, zp
    if strat == QuantizationStrategy.CHANNEL:
        return (
            jnp.broadcast_to(scale[None, :], (G_pad, N)),
            jnp.broadcast_to(zp[None, :], (G_pad, N)),
        )
    return (
        jnp.full((G_pad, N), scale, jnp.float32),
        jnp.full((G_pad, N), zp, jnp.float32),
    )


def w4_dequant_matmul(x, qt: QTensor, *, interpret: bool | None = None):
    """``x @ dequant(qt)`` with in-kernel nibble unpack. x: (..., K)."""
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
    if K_pad != K:
        x2d = _pad_axis(x2d, 1, K_pad)  # zero rows in w pad region contribute 0

    bm = min(256, max(8, M))
    x2d = _pad_axis(x2d, 0, bm)
    n_pairs = G_pad // 2
    bn, ppb = _pick_blocks(bm, N, gs, n_pairs)

    scales, zps = _expand_scales(qt, G_pad, N)
    scales = scales.reshape(G_pad // 2, 2, N)
    zps = zps.reshape(G_pad // 2, 2, N)
    out = _w4_call(
        x2d, jnp.asarray(qt.data), scales, zps,
        gs=gs, signed=qt.meta.qt.is_signed, bm=bm, bn=bn, ppb=ppb,
        interpret=interpret, out_dtype=jnp.float32,
    )
    return out[:M].reshape(*batch_shape, N)


# VMEM charge for the unpack/dequant temporaries, in bytes per (gs, bn)
# weight element, derived from the kernel body's value chain per group pair:
#   w int32 (4) + low int32 (4) + high int32 (4)             = 12
#   low_c / high_c compute-dtype casts (<= f32: 4 + 4)       =  8
#   alignment/packing margin Mosaic adds in practice         =  4
#
# Two allocation regimes, selected by the M-tile:
# * bm <= _SHARED_TEMP_BM_MAX (decode): Mosaic's liveness analysis reuses the
#   buffers across the statically-unrolled pairs, so the charge is ONE
#   pair's PEAK liveness — the three int32 arrays plus one in-flight cast
#   (12 + 2, rounded to 16). Verified: the shipped decode configs (ppb up to
#   n_pairs across the 270M/1B/4B zoo) run within this charge and the model
#   would flag ~1.5x of it as an OOM at the biggest decode tiles.
# * bm > _SHARED_TEMP_BM_MAX (prefill/perplexity): compiles materialize the
#   FULL chain per unrolled pair (both casts live into the two dots), so
#   every pair is charged all 24 B/elem — consistent with the measured 21M
#   scoped-vmem OOM at bm=256, ppb=5, N=262144 where a shared-temps model
#   predicted 9M.
_TEMP_BYTES_SHARED_ELEM = 16
_TEMP_BYTES_PER_PAIR_ELEM = 24
_SHARED_TEMP_BM_MAX = 64


def _pick_blocks(bm: int, N: int, gs: int, n_pairs: int) -> tuple[int, int]:
    """Choose (bn, pairs_per_block) minimizing grid-instance count.

    Per-grid-instance overhead (~1.5 us on this runtime) dominates small-K
    fat-N decode shapes, so prefer the largest lane-tileable bn, then pack as
    many group pairs per step as the VMEM budget allows. The model charges
    streamed blocks TWICE (Mosaic double-buffers them) plus the unpack/dequant
    temporaries (see ``_TEMP_BYTES_PER_PAIR_ELEM``); a 1 MiB headroom below
    the 16 MiB/core scoped-vmem limit absorbs allocator slack.
    ``tests/ops/test_w4_blocks.py`` sweeps the model-zoo shapes against this
    model."""
    budget = 15 * 1024 * 1024

    def step_bytes(bn, ppb):
        streamed = (
            ppb * gs * bn          # packed weight block (u8)
            + bm * 2 * ppb * gs * 4  # x chunk (f32 at prefill)
            + 2 * ppb * 2 * bn * 4   # scale + zp blocks
            + bm * bn * 4          # out block
        )
        if bm <= _SHARED_TEMP_BM_MAX:
            temps = _TEMP_BYTES_SHARED_ELEM * gs * bn
        else:
            temps = ppb * _TEMP_BYTES_PER_PAIR_ELEM * gs * bn
        return 2 * streamed + temps + bm * bn * 4  # + acc scratch

    # All lane-tileable divisors of N, largest first (non-power-of-two shapes
    # like Gemma-1B's 13824 = 27*512 need e.g. bn=4608 — a fixed power-of-two
    # list leaves 9x more grid instances on the table).
    lanes = N // 128
    cands = sorted(
        (128 * k for k in range(1, lanes + 1) if lanes % k == 0), reverse=True
    )
    best = (128, 1)
    best_cost = None
    for bn in cands:
        for ppb in range(n_pairs, 0, -1):
            if n_pairs % ppb == 0 and step_bytes(bn, ppb) <= budget:
                instances = (N // bn) * (n_pairs // ppb)
                if best_cost is None or instances < best_cost:
                    best, best_cost = (bn, ppb), instances
                break  # smaller ppb only increases instances for this bn
    return best


def _w4_predicate(x, qt: QTensor, bias) -> bool:
    if not qt.meta.packed or qt.meta.fmt != QFormat.QDQ:
        return False
    gs = qt.meta.pack_group
    K, N = qt.meta.shape
    if not (gs % 8 == 0 and N % 128 == 0):
        return False
    if jax.default_backend() == "tpu":
        # At prefill-scale M the dot is MXU-compute-bound and the in-kernel
        # nibble unpack caps the kernel at ~62% of the dense bf16 rate
        # (BENCH.md roofline table); the jnp fallback (dequantize once, then
        # a dense dot) is faster there and numerically identical on an f32
        # stream (under bf16 it rounds the dequantized weights to bf16 — a
        # documented precision/speed trade, BENCH.md round 2 cont.). The
        # transient dequant traffic is amortized over M rows. Decode steps —
        # (B, 1, K) inputs, ANY batch — stay on the fused kernel: inside the
        # decode scan the dense path would re-materialize full dequantized
        # weights every step (XLA does not hoist memory-expanding prep out
        # of while loops).
        batch_shape = x.shape[:-1]
        is_decode_step = len(batch_shape) >= 2 and batch_shape[-1] == 1
        if not is_decode_step and int(np.prod(batch_shape)) >= 128:
            return False
        # Compiled lowering needs the x lane-block (2*gs) to be a 128-multiple.
        return gs % 64 == 0
    return True


@register_kernel(_w4_predicate)
def _w4_kernel_entry(x, qt: QTensor, bias):
    from onnx_quantize_tpu.ops.reference import qdq_epilogue, qdq_prologue

    x = qdq_prologue(x, qt)
    y = w4_dequant_matmul(x, qt)
    return qdq_epilogue(y, qt, bias)
