"""Blockwise (flash-style) attention kernel for prefill / full-sequence runs.

SURVEY.md §5 calls for the attention kernel to be blockwise so context length
is HBM-bound: this kernel never materializes the (T, S) score matrix. Online
softmax runs over S-blocks with running max/sum scratch; the causal and
sliding-window structure of Gemma-3 is applied per block from index arithmetic
(no mask tensor in HBM), and fully-masked blocks skip their compute. GQA is
handled in the index map — each q-head grid row reads its kv head's K/V block
directly, no repetition in memory.

Decode (T=1 against a sentinel-masked cache) keeps the jnp path — its score
matrix is tiny; prefill and perplexity forwards are where the O(T·S) memory
matters.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention"]

_NEG_INF = -1e30


def _fa_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *,
               bt, bs, n_s, causal, window):
    t_idx = pl.program_id(1)
    s_idx = pl.program_id(2)

    @pl.when(s_idx == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    t0 = t_idx * bt
    s0 = s_idx * bs

    # Block-level structure check: rows attend to [row - window + 1, row].
    # The block is live unless entirely above the diagonal (causal) or
    # entirely left of every row's window start.
    live = True
    if causal:
        live = s0 <= t0 + bt - 1  # some key <= some query position
    if window is not None:
        live = jnp.logical_and(live, s0 + bs - 1 > t0 - window)

    @pl.when(live)
    def _():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (bt, bs)

        rows = t0 + jax.lax.broadcasted_iota(jnp.int32, (bt, bs), 0)
        cols = s0 + jax.lax.broadcasted_iota(jnp.int32, (bt, bs), 1)
        mask = cols <= rows
        if window is not None:
            mask = jnp.logical_and(mask, cols > rows - window)
        scores = jnp.where(mask, scores, _NEG_INF)

        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1, keepdims=True))
        # Guard all-masked rows (m_new == -inf) against exp overflow math.
        m_safe = jnp.where(m_new <= _NEG_INF / 2, 0.0, m_new)
        p = jnp.exp(scores - m_safe)
        p = jnp.where(mask, p, 0.0)
        alpha = jnp.where(
            m_prev <= _NEG_INF / 2, 0.0, jnp.exp(m_prev - m_safe)
        )
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[:] = m_new

    @pl.when(s_idx == n_s - 1)
    def _():
        denom = jnp.maximum(l_ref[:], 1e-30)
        o_ref[0] = (acc_ref[:] / denom).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "window", "bt", "bs", "group", "interpret"),
)
def _fa_call(q, k, v, *, causal, window, bt, bs, group, interpret):
    """q: (BHq, T, D); k/v: (BHkv, S, D) with Hq = Hkv * group."""
    BHq, T, D = q.shape
    _, S, _ = k.shape
    n_t = T // bt
    n_s = S // bs

    kernel = functools.partial(
        _fa_kernel, bt=bt, bs=bs, n_s=n_s, causal=causal, window=window
    )
    return pl.pallas_call(
        kernel,
        grid=(BHq, n_t, n_s),
        in_specs=[
            pl.BlockSpec((1, bt, D), lambda h, t, s: (h, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, bs, D), lambda h, t, s: (h // group, s, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, bs, D), lambda h, t, s: (h // group, s, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, bt, D), lambda h, t, s: (h, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((BHq, T, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bt, 1), jnp.float32),
            pltpu.VMEM((bt, 1), jnp.float32),
            pltpu.VMEM((bt, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v)


def flash_attention(q, k, v, *, causal: bool = True, sliding_window: int | None = None,
                    bt: int = 128, bs: int = 128, interpret: bool | None = None):
    """Blockwise attention. q: (B, T, Hq, D); k/v: (B, S, Hkv, D).

    Positions are assumed contiguous from 0 (prefill layout). Returns
    (B, T, Hq, D) in q's dtype. q should be pre-scaled.
    """
    B, T, Hq, D = q.shape
    _, S, Hkv, _ = k.shape
    group = Hq // Hkv

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    bt = min(bt, T)
    bs = min(bs, S)
    assert T % bt == 0 and S % bs == 0, (T, S, bt, bs)

    qh = jnp.transpose(q, (0, 2, 1, 3)).reshape(B * Hq, T, D)
    kh = jnp.transpose(k, (0, 2, 1, 3)).reshape(B * Hkv, S, D)
    vh = jnp.transpose(v, (0, 2, 1, 3)).reshape(B * Hkv, S, D)

    out = _fa_call(
        qh, kh, vh, causal=causal, window=sliding_window, bt=bt, bs=bs,
        group=group, interpret=interpret,
    )
    return jnp.transpose(out.reshape(B, Hq, T, D), (0, 2, 1, 3))
