"""Fused W4 GeGLU MLP megakernel (decode path).

One ``pallas_call`` computes the whole Gemma MLP:

    h   = x @ dequant(W_gate_up)          # (M, 2I), W4 group-pair packed
    act = gelu_tanh(h[:, :I]) * h[:, I:]  # GeGLU
    y   = act @ dequant(W_down)           # (M, K_out), W4 group-pair packed

replacing two Pallas launches plus the XLA activation kernels between them —
the decode loop on this runtime is launch-latency-bound (BENCH.md: ~126
launches/step ≈ the per-step floor), so per-layer launch count is the binding
constraint, not FLOPs. The intermediate ``h`` lives entirely in a VMEM
scratch: the (M, 2I) activation never round-trips HBM.

Shapes are decode-sized (M = batch ≤ 256): all weights fit VMEM at once
(270M: 1.6 MB + 0.7 MB packed), so the kernel runs as a single grid instance
with statically unrolled group-pair loops — no BlockSpec pipelining needed.
The group-pair nibble layout (``nn/qtensor.py``) makes each unpack two masked
shifts feeding two MXU dots, exactly as in ``matmul_w4.py``.

Replaces the reference's per-op ORT schedule (MatMulNBits -> Gelu -> Mul ->
MatMulNBits, four graph nodes) with one fused TPU kernel — SURVEY.md §2B.
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
from onnx_quantize_tpu.ops.kernels.matmul_w4 import _expand_scales, _pad_axis

__all__ = ["mlp_w4_fused", "mlp_w4_eligible", "mlp_w4_reference"]


def _gelu_tanh(x):
    # Gemma's approximate gelu: 0.5 x (1 + tanh(sqrt(2/pi) (x + 0.044715 x^3)))
    c = 0.7978845608028654
    return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * x * x * x)))


def _unpack_pair(w_u8, signed, compute_dtype):
    """Unpack packed rows of one group pair -> two raw (gs, N) nibble tiles.

    The dequant affine is folded into the (M, bn) partial product by the
    caller (x @ ((w - zp) * s) == (x @ w - sum(x) * zp) * s — scale/zp rows
    are constant within a group tile), same as ``matmul_w4.py``: the per-
    weight VPU chain is the unpack alone."""
    w = w_u8.astype(jnp.int32)
    low = w & 0x0F
    high = w >> 4  # u8 source: already 0..15
    if signed:
        low = jnp.where(low > 7, low - 16, low)
        high = jnp.where(high > 7, high - 16, high)
    return (
        low.astype(jnp.float32).astype(compute_dtype),
        high.astype(jnp.float32).astype(compute_dtype),
    )


def _pair_partial(xl, xh, nl, nh, s_ref, z_ref, k):
    """(x @ w_pair) with the dequant affine applied to the partials."""
    dot_l = jnp.dot(xl, nl, preferred_element_type=jnp.float32)
    dot_h = jnp.dot(xh, nh, preferred_element_type=jnp.float32)
    xs_l = jnp.sum(xl.astype(jnp.float32), axis=1, keepdims=True)
    xs_h = jnp.sum(xh.astype(jnp.float32), axis=1, keepdims=True)
    return (dot_l - xs_l * z_ref[k, 0:1, :]) * s_ref[k, 0:1, :] + (
        dot_h - xs_h * z_ref[k, 1:2, :]
    ) * s_ref[k, 1:2, :]


def _mlp_kernel(x_ref, wg_ref, sg_ref, zg_ref, wd_ref, sd_ref, zd_ref, o_ref,
                h_ref, a_ref, *, gs_g, gs_d, pairs_g, pairs_d, inter, signed_g,
                signed_d, compute_dtype):
    # Phase 1: h = x @ dq(W_gate_up), statically unrolled over group pairs.
    h_ref[:] = jnp.zeros_like(h_ref)
    for k in range(pairs_g):
        nl, nh = _unpack_pair(
            wg_ref[k * gs_g : (k + 1) * gs_g, :], signed_g, compute_dtype
        )
        xl = x_ref[:, 2 * k * gs_g : (2 * k + 1) * gs_g]
        xh = x_ref[:, (2 * k + 1) * gs_g : (2 * k + 2) * gs_g]
        h_ref[:] += _pair_partial(xl, xh, nl, nh, sg_ref, zg_ref, k)

    # Phase 2: GeGLU in f32, cast to the compute dtype, zero-pad the tail
    # columns (the down weights' padded K region carries nonzero dequant
    # values for asymmetric zps — zero activations null them, mirroring the
    # x-padding trick in matmul_w4).
    h = h_ref[:]
    act = (_gelu_tanh(h[:, :inter]) * h[:, inter:]).astype(compute_dtype)
    a_ref[:, :inter] = act
    if a_ref.shape[1] > inter:
        a_ref[:, inter:] = jnp.zeros(
            (a_ref.shape[0], a_ref.shape[1] - inter), compute_dtype
        )

    # Phase 3: y = act @ dq(W_down).
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    for j in range(pairs_d):
        nl, nh = _unpack_pair(
            wd_ref[j * gs_d : (j + 1) * gs_d, :], signed_d, compute_dtype
        )
        al = a_ref[:, 2 * j * gs_d : (2 * j + 1) * gs_d]
        ah = a_ref[:, (2 * j + 1) * gs_d : (2 * j + 2) * gs_d]
        acc += _pair_partial(al, ah, nl, nh, sd_ref, zd_ref, j)
    o_ref[:] = acc.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("gs_g", "gs_d", "pairs_g", "pairs_d", "inter",
                     "signed_g", "signed_d", "interpret"),
)
def _mlp_call(x2d, wg, sg, zg, wd, sd, zd, *, gs_g, gs_d, pairs_g, pairs_d,
              inter, signed_g, signed_d, interpret):
    M, _ = x2d.shape
    n_out = wd.shape[1]
    k_dn_pad = 2 * wd.shape[0]
    compute_dtype = x2d.dtype
    kernel = functools.partial(
        _mlp_kernel, gs_g=gs_g, gs_d=gs_d, pairs_g=pairs_g, pairs_d=pairs_d,
        inter=inter, signed_g=signed_g, signed_d=signed_d,
        compute_dtype=compute_dtype,
    )
    spec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        in_specs=[spec() for _ in range(7)],
        out_specs=spec(),
        out_shape=jax.ShapeDtypeStruct((M, n_out), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((M, 2 * inter), jnp.float32),
            pltpu.VMEM((M, k_dn_pad), compute_dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * M * x2d.shape[1] * 2 * inter + 2 * M * inter * n_out,
            bytes_accessed=wg.size + wd.size + x2d.size * x2d.dtype.itemsize
            + M * n_out * 4,
            transcendentals=M * inter,
        ),
        interpret=interpret,
    )(x2d, wg, sg, zg, wd, sd, zd)


def mlp_w4_eligible(qt_gu: QTensor, qt_dn: QTensor, M: int) -> bool:
    """Both weights packed-W4 QDQ, lane-tileable, no act quant, decode-sized M."""
    for qt in (qt_gu, qt_dn):
        if not isinstance(qt, QTensor) or not qt.meta.packed:
            return False
        if qt.meta.fmt != QFormat.QDQ:
            return False
        if qt.meta.input_quant.mode != "none" or qt.meta.output_quant.mode != "none":
            return False
        if qt.meta.shape[1] % 128 != 0:
            return False
        gs = qt.meta.pack_group
        if gs % 64 != 0:  # compiled lowering: x lane block (2*gs) % 128 == 0
            return False
    if qt_gu.meta.shape[1] % 2 != 0 or qt_gu.meta.shape[1] // 2 != qt_dn.meta.shape[0]:
        return False
    # Single-instance kernel: everything must fit VMEM comfortably.
    inter = qt_gu.meta.shape[1] // 2
    vmem = (
        qt_gu.data.size + qt_dn.data.size          # packed weights
        + M * 2 * inter * 4                         # h scratch f32
        + M * (2 * qt_dn.data.shape[0]) * 4         # act scratch
        + 2 * max(qt_gu.meta.pack_group * qt_gu.meta.shape[1],
                  qt_dn.meta.pack_group * qt_dn.meta.shape[1]) * 4  # dq tiles
    )
    return M <= 256 and vmem <= 10 * 1024 * 1024


def mlp_w4_fused(x, qt_gu: QTensor, qt_dn: QTensor, *, interpret: bool | None = None):
    """GeGLU MLP over two packed-W4 weights in one kernel. x: (..., K)."""
    K, two_inter = qt_gu.meta.shape
    inter = two_inter // 2
    n_out = qt_dn.meta.shape[1]
    gs_g = qt_gu.meta.pack_group
    gs_d = qt_dn.meta.pack_group
    half_g = qt_gu.data.shape[0]
    half_d = qt_dn.data.shape[0]
    pairs_g = half_g // gs_g
    pairs_d = half_d // gs_d

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    batch_shape = x.shape[:-1]
    M = int(np.prod(batch_shape)) if batch_shape else 1
    x2d = x.reshape(M, K)
    if 2 * half_g != K:
        x2d = _pad_axis(x2d, 1, 2 * half_g)
    x2d = _pad_axis(x2d, 0, 8)
    M_pad = x2d.shape[0]

    sg, zg = _expand_scales(qt_gu, 2 * pairs_g, two_inter)
    sd, zd = _expand_scales(qt_dn, 2 * pairs_d, n_out)
    out = _mlp_call(
        x2d, jnp.asarray(qt_gu.data), sg.reshape(pairs_g, 2, two_inter),
        zg.reshape(pairs_g, 2, two_inter), jnp.asarray(qt_dn.data),
        sd.reshape(pairs_d, 2, n_out), zd.reshape(pairs_d, 2, n_out),
        gs_g=gs_g, gs_d=gs_d, pairs_g=pairs_g, pairs_d=pairs_d, inter=inter,
        signed_g=qt_gu.meta.qt.is_signed, signed_d=qt_dn.meta.qt.is_signed,
        interpret=interpret,
    )
    return out[:M].reshape(*batch_shape, n_out)


def mlp_w4_reference(x, qt_gu: QTensor, qt_dn: QTensor):
    """jnp oracle: the exact unfused computation the kernel must match."""
    from onnx_quantize_tpu.ops.reference import quantized_matmul_jnp

    h = quantized_matmul_jnp(x, qt_gu)
    act = jax.nn.gelu(h[..., : h.shape[-1] // 2], approximate=True) * (
        h[..., h.shape[-1] // 2 :]
    )
    return quantized_matmul_jnp(act.astype(x.dtype), qt_dn)
