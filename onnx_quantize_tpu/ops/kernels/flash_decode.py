"""Fused int8-KV flash-decode attention kernel.

Decode attention that consumes the quantized KV cache *directly* (VERDICT
round-1 item #3): int8 K/V blocks and their per-(token, head) scales stream
HBM->VMEM and dequantize in registers — no (B, S, H, D) float materialization
of the cache (the round-1 path at ``engine/kv_cache.py::read_kv`` built one
per layer per step). Scales factor out of the dots, so the MXU work stays two
dense (G, bs) x (bs, D)-shaped products per block:

    scores = (q @ K_int8^T) * k_scale[row]          (per-token scale)
    out   += (p * v_scale[row]) @ V_int8            (scale folded into p)

Ragged lengths cost no HBM traffic: the kernel runs a static S/bs grid, but
the BlockSpec index maps clamp the fetched block to ``[lo(pos), pos // bs]``
(scalar-prefetched per-sequence positions), and Pallas skips the DMA when the
block index repeats between consecutive grid steps — so only blocks that
actually contain live keys are read, including the sliding-window lower bound
on Gemma's local layers.

Replaces the attention role ORT's fused Attention op plays in the reference's
serving stack (SURVEY.md §2B, serving row).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_decode_int8", "flash_decode_int8_reference"]

_NEG_INF = -1e30


def _fd_kernel(pos_ref, q_ref, k_ref, ks_ref, v_ref, vs_ref, o_ref,
               m_ref, l_ref, acc_ref, *, bs, n_s, window):
    b = pl.program_id(0)
    s = pl.program_id(2)

    @pl.when(s == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    pos = pos_ref[b]
    hi_blk = pos // bs
    live = s <= hi_blk
    if window is not None:
        lo_blk = jnp.maximum(pos - window + 1, 0) // bs
        live = jnp.logical_and(live, s >= lo_blk)

    @pl.when(live)
    def _():
        q = q_ref[0, 0]  # (Gp, D) f32, pre-scaled
        # Mosaic has no direct i8->f32 cast; go via int32.
        kf = k_ref[0, :, 0, :].astype(jnp.int32).astype(jnp.float32)  # (bs, D)
        # HIGHEST: the MXU's default f32 precision is bf16 passes, which costs
        # ~0.5% relative on the scores — visible after softmax. The extra MXU
        # passes are free here (the kernel is HBM-bound on the int8 cache).
        scores = jax.lax.dot_general(
            q, kf, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (Gp, bs)
        scores = scores * ks_ref[0, 0, :][None, :]

        cols = s * bs + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        mask = cols <= pos
        if window is not None:
            mask = jnp.logical_and(mask, cols > pos - window)
        scores = jnp.where(mask, scores, _NEG_INF)

        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1, keepdims=True))
        m_safe = jnp.where(m_new <= _NEG_INF / 2, 0.0, m_new)
        p = jnp.exp(scores - m_safe)
        p = jnp.where(mask, p, 0.0)
        alpha = jnp.where(m_prev <= _NEG_INF / 2, 0.0, jnp.exp(m_prev - m_safe))

        pv = p * vs_ref[0, 0, :][None, :]  # v's per-token scale folded into p
        vf = v_ref[0, :, 0, :].astype(jnp.int32).astype(jnp.float32)  # (bs, D)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            pv, vf, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        m_ref[:] = m_new

    @pl.when(s == n_s - 1)
    def _():
        o_ref[0, 0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("bs", "window", "interpret")
)
def _fd_call(q, k_q, ks, v_q, vs, pos, *, bs, window, interpret):
    """q: (B, Hkv, Gp, D); k_q/v_q: (B, S, Hkv, D) int8; ks/vs: (B, Hkv, S);
    pos: (B,) int32."""
    B, Hkv, Gp, D = q.shape
    S = k_q.shape[1]
    n_s = S // bs

    def live_range(p):
        # Block range holding live keys. hi also guards pos >= S (an engine
        # sentinel for inactive slots whose output is discarded).
        hi = jnp.clip(p // bs, 0, n_s - 1)
        lo = 0 if window is None else jnp.maximum(p - window + 1, 0) // bs
        return lo, hi

    def kv_idx(b, h, s, pos_ref):
        # Clamp to the live block range so dead blocks repeat their neighbor's
        # index and Pallas elides the DMA (ragged-length traffic saving).
        lo, hi = live_range(pos_ref[b])
        return (b, jnp.clip(s, lo, hi), h, 0)

    def scale_idx(b, h, s, pos_ref):
        lo, hi = live_range(pos_ref[b])
        return (b, h, jnp.clip(s, lo, hi))

    kernel = functools.partial(_fd_kernel, bs=bs, n_s=n_s, window=window)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, Hkv, n_s),
        in_specs=[
            pl.BlockSpec((1, 1, Gp, D), lambda b, h, s, pos_ref: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bs, 1, D), kv_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bs), scale_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bs, 1, D), kv_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bs), scale_idx, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, Gp, D), lambda b, h, s, pos_ref: (b, h, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((Gp, 1), jnp.float32),
            pltpu.VMEM((Gp, 1), jnp.float32),
            pltpu.VMEM((Gp, D), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, Gp, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(pos, q, k_q, ks, v_q, vs)


def _fd_batched_kernel(rng_ref, pos_ref, q_ref, k_ref, ks_ref, v_ref, vs_ref,
                       o_ref, m_ref, l_ref, acc_ref, *, bb, bs, n_s, window):
    """Batch-blocked grid (B/bb, Hkv, n_s) — up to ~B x fewer grid instances
    than the per-sequence grid (the per-instance overhead on this runtime made
    the per-sequence variant lose to plain XLA at B=32; see BENCH.md round 2).

    The in-block batch loop is statically unrolled with 2D dots (Mosaic's dot
    lowering is 2D; the unroll pattern matches the W4 kernel's ppb loop).
    Mosaic stack-allocates every unrolled iteration's dequant temps
    simultaneously (~2*bs*D*8 bytes each, measured as a 16.56M scoped-vmem OOM
    at B=32 whole-batch blocks), so the wrapper picks ``bb`` by charging the
    temps per unrolled row."""
    s = pl.program_id(2)
    # Hoisted: program_id inside a pl.when body escapes the pallas trace in
    # interpret mode (MLIR lowering error on cpu).
    b0 = pl.program_id(0) * bb

    @pl.when(s == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    live = jnp.logical_and(s >= rng_ref[0], s <= rng_ref[1])

    @pl.when(live)
    def _():
        for b in range(bb):
            pos = pos_ref[b0 + b]
            q = q_ref[b, 0]  # (Gp, D) f32, pre-scaled
            kf = k_ref[b, :, 0, :].astype(jnp.int32).astype(jnp.float32)
            scores = jax.lax.dot_general(
                q, kf, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (Gp, bs)
            scores = scores * ks_ref[b, 0, :][None, :]

            cols = s * bs + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
            mask = cols <= pos
            if window is not None:
                mask = jnp.logical_and(mask, cols > pos - window)
            scores = jnp.where(mask, scores, _NEG_INF)

            m_prev = m_ref[b]
            m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1, keepdims=True))
            m_safe = jnp.where(m_new <= _NEG_INF / 2, 0.0, m_new)
            p = jnp.exp(scores - m_safe)
            p = jnp.where(mask, p, 0.0)
            alpha = jnp.where(m_prev <= _NEG_INF / 2, 0.0, jnp.exp(m_prev - m_safe))

            pv = p * vs_ref[b, 0, :][None, :]
            vf = v_ref[b, :, 0, :].astype(jnp.int32).astype(jnp.float32)
            l_ref[b] = l_ref[b] * alpha + jnp.sum(p, axis=1, keepdims=True)
            acc_ref[b] = acc_ref[b] * alpha + jax.lax.dot_general(
                pv, vf, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            m_ref[b] = m_new

    @pl.when(s == n_s - 1)
    def _():
        o_ref[:, 0] = (
            acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)
        ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bb", "bs", "window", "interpret"))
def _fd_batched_call(q, k_q, ks, v_q, vs, pos, *, bb, bs, window, interpret):
    B, Hkv, Gp, D = q.shape
    S = k_q.shape[1]
    n_s = S // bs

    # Global live-block range (min/max over the batch): the per-block DMA is
    # batch-block-wide, so the clamp can only skip blocks dead for EVERY
    # sequence; per-sequence raggedness is handled by the in-kernel masks.
    hi_b = jnp.clip(pos // bs, 0, n_s - 1)
    lo_b = (
        jnp.zeros_like(pos) if window is None
        else jnp.maximum(pos - window + 1, 0) // bs
    )
    rng = jnp.stack([jnp.clip(jnp.min(lo_b), 0, n_s - 1), jnp.max(hi_b)])

    def kv_idx(b, h, s, rng_ref, pos_ref):
        return (b, jnp.clip(s, rng_ref[0], rng_ref[1]), h, 0)

    def scale_idx(b, h, s, rng_ref, pos_ref):
        return (b, h, jnp.clip(s, rng_ref[0], rng_ref[1]))

    kernel = functools.partial(
        _fd_batched_kernel, bb=bb, bs=bs, n_s=n_s, window=window
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B // bb, Hkv, n_s),
        in_specs=[
            pl.BlockSpec((bb, 1, Gp, D), lambda b, h, s, r, p: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, bs, 1, D), kv_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, 1, bs), scale_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, bs, 1, D), kv_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, 1, bs), scale_idx, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bb, 1, Gp, D), lambda b, h, s, r, p: (b, h, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((bb, Gp, 1), jnp.float32),
            pltpu.VMEM((bb, Gp, 1), jnp.float32),
            pltpu.VMEM((bb, Gp, D), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, Gp, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(rng, pos, q, k_q, ks, v_q, vs)


def flash_decode_int8(q, k_q, k_scale, v_q, v_scale, pos, *,
                      window: int | None = None, bs: int = 128,
                      interpret: bool | None = None,
                      batched: bool | None = None):
    """Decode attention over the int8 KV cache.

    q: (B, Hq, D) f32 (pre-scaled query for the single decode position);
    k_q/v_q: (B, S, Hkv, D) int8 cache; k_scale/v_scale: (B, S, Hkv) f32;
    pos: (B,) int32 — each sequence's current position (its new token's slot).
    Keys at slots <= pos are live (minus the sliding window's left edge).
    Returns (B, Hq, D) f32.
    """
    B, Hq, D = q.shape
    S, Hkv = k_q.shape[1], k_q.shape[2]
    G = Hq // Hkv
    Gp = ((G + 7) // 8) * 8

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bs = min(bs, S)
    assert S % bs == 0, (S, bs)

    # Batch-block size: largest divisor of B whose footprint fits. Mosaic
    # stack-allocates the dequant temps of EVERY unrolled batch row at once
    # (int32 + f32 (bs, D) tiles for K and V each: measured 16.56M scoped-vmem
    # OOM at B=32 whole-batch blocks on Gemma-1B shapes), so temps are charged
    # per row; K/V int8 blocks are charged double-buffered.
    def _bb_bytes(bb_):
        temps = bb_ * 2 * 2 * bs * D * (4 + 4)
        blocks = 2 * 2 * bb_ * bs * D + 2 * bb_ * bs * 4
        state = 5 * bb_ * Gp * D * 4
        return temps + blocks + state

    divisors = [d for d in range(B, 0, -1) if B % d == 0]
    bb = next((d for d in divisors if _bb_bytes(d) <= 10 * 1024 * 1024), 1)
    if batched is None:
        batched = bb >= 2

    qh = q.reshape(B, Hkv, G, D)
    if Gp != G:
        qh = jnp.pad(qh, ((0, 0), (0, 0), (0, Gp - G), (0, 0)))
    ks = jnp.transpose(k_scale, (0, 2, 1)).astype(jnp.float32)  # (B, Hkv, S)
    vs = jnp.transpose(v_scale, (0, 2, 1)).astype(jnp.float32)

    if batched:
        out = _fd_batched_call(
            qh.astype(jnp.float32), k_q, ks, v_q, vs,
            jnp.asarray(pos, jnp.int32), bb=bb, bs=bs, window=window,
            interpret=interpret,
        )
    else:
        out = _fd_call(
            qh.astype(jnp.float32), k_q, ks, v_q, vs,
            jnp.asarray(pos, jnp.int32), bs=bs, window=window,
            interpret=interpret,
        )
    return out[:, :, :G, :].reshape(B, Hq, D)


def flash_decode_int8_reference(q, k_q, k_scale, v_q, v_scale, pos, *,
                                window: int | None = None):
    """jnp oracle with identical semantics (dequantize-then-attend)."""
    B, Hq, D = q.shape
    S, Hkv = k_q.shape[1], k_q.shape[2]
    G = Hq // Hkv
    k = k_q.astype(jnp.float32) * k_scale[..., None]  # (B, S, Hkv, D)
    v = v_q.astype(jnp.float32) * v_scale[..., None]
    qg = q.reshape(B, Hkv, G, D)
    scores = jnp.einsum("bkgh,bskh->bkgs", qg.astype(jnp.float32), k)
    slots = jnp.arange(S, dtype=jnp.int32)
    mask = slots[None, :] <= pos[:, None]  # (B, S)
    if window is not None:
        mask &= slots[None, :] > pos[:, None] - window
    scores = jnp.where(mask[:, None, None, :], scores, _NEG_INF)
    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bkgs,bskh->bkgh", p, v)
    return out.reshape(B, Hq, D)
