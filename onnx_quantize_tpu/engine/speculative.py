"""Speculative decoding: a draft model proposes, the target verifies.

Latency-mode extension beyond the reference (which has no serving runtime at
all — SURVEY §2B): at small batch the decode step is weight-bandwidth-bound,
so verifying ``k`` drafted tokens in ONE target forward reads the target's
weights once instead of ``k`` times. The draft (typically a smaller or
lower-bit family member — e.g. quantized Gemma-3-270M drafting for 1B)
runs ``k`` cheap scan steps; the target then scores all ``k + 1`` positions
in a single mid-sequence masked forward and keeps the longest matching
prefix plus its own next token.

Greedy and EXACT: the emitted stream equals the target-only greedy decode
token-for-token regardless of draft quality (a bad draft only costs speed —
pinned by ``tests/engine/test_speculative.py`` with an adversarial draft).

Mechanics that make this cheap on TPU / XLA:

* static shapes everywhere — each round is draft-scan(k) + one (B, k+1)
  target forward inside ONE ``lax.scan`` over rounds; nothing recompiles as
  acceptance varies;
* rollback is free: rejected positions' KV entries are simply left stale —
  ``kv_positions`` masking (slot >= lengths) hides them and the next rounds
  overwrite them, so "undo" is one per-row lengths assignment;
* per-row acceptance: every batch row accepts its own prefix length, with
  per-row EOS/budget/capacity freezing exactly like ``engine.serve_chunk``.

Acceptance is capped at ``k - 1`` drafts per round so the draft cache never
falls behind the target cache (the uncapped final match would leave the
draft one KV entry short); each round therefore emits 1..k tokens.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from onnx_quantize_tpu._logging import get_logger
from onnx_quantize_tpu.engine.engine import _FAR, InferenceEngine

logger = get_logger(__name__)

__all__ = ["SpeculativeDecoder"]


class SpeculativeDecoder:
    """Greedy speculative decoding over a (target, draft) engine pair."""

    def __init__(self, target: InferenceEngine, draft: InferenceEngine,
                 k: int = 4):
        if target.max_batch != draft.max_batch or target.max_seq != draft.max_seq:
            raise ValueError(
                "target and draft engines must share max_batch/max_seq "
                f"(got {target.max_batch}/{target.max_seq} vs "
                f"{draft.max_batch}/{draft.max_seq})"
            )
        if target.mesh is not None or draft.mesh is not None:
            raise NotImplementedError("speculative decoding is single-chip for now")
        assert k >= 2, "k < 2 never accepts a draft (acceptance cap is k - 1)"
        self.target = target
        self.draft = draft
        self.k = k
        self._jit = jax.jit(self._impl, donate_argnums=(2, 3), static_argnums=(7,))

    # ── device program ───────────────────────────────────────────────────

    def _verify(self, params, cache, ids, act):
        """Target forward over ids (B, k+1) appended at each row's length.

        Returns (cache, greedy (B, k+1)); lengths are NOT advanced here —
        the acceptance logic assigns them.
        """
        eng = self.target
        B, T = ids.shape
        L = cache["lengths"]
        positions = L[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
        positions = jnp.where(act[:, None], positions, eng.max_seq)
        slot = jnp.arange(eng.max_seq, dtype=jnp.int32)[None, :]
        visible = (L + T * act.astype(jnp.int32))[:, None]
        kv_positions = jnp.where(slot < visible, slot, _FAR)
        holder = {"cache": dict(cache)}
        # kv_window: contiguous per-row writes via dynamic_update_slice —
        # the general scatter costs cache traffic proportional to max_seq
        # for offset windows (4B verify 15.2 -> ~5 ms; BENCH.md round 3).
        logits = eng._forward(
            params, holder, ids, positions, kv_positions, kv_window=(L, act)
        )
        return holder["cache"], jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def _impl(self, tgt_params, dft_params, tgt_cache, dft_cache, tokens,
              budgets, eos, rounds: int):
        k = self.k
        eos_on = eos >= 0
        done0 = budgets <= 0

        def round_body(carry, _):
            tgt_cache, dft_cache, toks, done, budgets = carry
            # Rows without room for the whole k+1 window freeze (capacity).
            cap = tgt_cache["lengths"] + k + 1 > self.target.max_seq
            act = jnp.logical_not(jnp.logical_or(done, cap))
            L = tgt_cache["lengths"]

            # 1) draft: k greedy scan steps.
            def dstep(c, _):
                cache, t = c
                cache, logits = self.draft._decode_impl(dft_params, cache, t, act)
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                return (cache, nxt), nxt

            (dft_cache, _), drafts = jax.lax.scan(
                dstep, (dft_cache, toks), None, length=k
            )
            drafts = drafts.T  # (B, k)

            # 2) target verifies [t0, d_1..d_k] in one forward.
            ids = jnp.concatenate([toks[:, None], drafts], axis=1)
            tgt_cache, greedy = self._verify(tgt_params, tgt_cache, ids, act)

            # 3) accept the longest matching prefix (capped at k-1 so the
            #    draft cache stays in lockstep), plus the target's own token.
            match = (drafts[:, : k - 1] == greedy[:, : k - 1]).astype(jnp.int32)
            n = jnp.sum(jnp.cumprod(match, axis=1), axis=1)  # 0..k-1
            m = n + 1  # tokens this round before EOS/budget cuts

            # EOS cut: first EOS among the emitted prefix ends the row there.
            emit_mask = jnp.arange(k)[None, :] < m[:, None]
            is_eos = emit_mask & eos_on[:, None] & (greedy[:, :k] == eos[:, None])
            any_eos = jnp.any(is_eos, axis=1)
            first_eos = jnp.argmax(is_eos, axis=1)  # valid where any_eos
            m = jnp.where(any_eos, first_eos + 1, m)
            m = jnp.minimum(m, budgets)
            m = jnp.where(act, m, 0)

            next_tok = jnp.take_along_axis(
                greedy, jnp.maximum(m - 1, 0)[:, None], axis=1
            )[:, 0]
            toks = jnp.where(m > 0, next_tok, toks)
            new_len = L + m
            tgt_cache["lengths"] = jnp.where(act, new_len, tgt_cache["lengths"])
            dft_cache["lengths"] = jnp.where(act, new_len, dft_cache["lengths"])
            budgets = budgets - m
            done = jnp.logical_or(done, any_eos & act)
            done = jnp.logical_or(done, budgets <= 0)
            done = jnp.logical_or(done, cap)

            out = jnp.concatenate(
                [
                    greedy[:, :k],
                    m[:, None],
                    done.astype(jnp.int32)[:, None],
                    tgt_cache["lengths"][:, None],
                ],
                axis=1,
            ).astype(jnp.int32)
            return (tgt_cache, dft_cache, toks, done, budgets), out

        carry = (tgt_cache, dft_cache, tokens, done0, budgets)
        (tgt_cache, dft_cache, _, _, _), outs = jax.lax.scan(
            round_body, carry, None, length=rounds
        )
        # outs: (rounds, B, k+3) -> (B, rounds, k+3)
        return tgt_cache, dft_cache, jnp.transpose(outs, (1, 0, 2))

    # ── host API ─────────────────────────────────────────────────────────

    def decode(self, tgt_cache, dft_cache, tokens, rounds: int, *,
               budgets, eos=None):
        """Run ``rounds`` speculative rounds in one device program.

        ``tokens``: (B,) current next-input token per row; ``budgets``: (B,)
        remaining tokens per row (0 => row inactive); ``eos``: (B,) EOS id or
        -1. Returns ``(tgt_cache, dft_cache, blob (B, rounds, k+3))`` with
        per-round columns ``[g_1..g_k, emitted, done, lengths]`` — the first
        ``emitted`` of the g's are this round's tokens.
        """
        B = self.target.max_batch
        if eos is None:
            eos = np.full((B,), -1, np.int32)
        return self._jit(
            self.target.params, self.draft.params, tgt_cache, dft_cache,
            jnp.asarray(tokens, jnp.int32), jnp.asarray(budgets, jnp.int32),
            jnp.asarray(eos, jnp.int32), rounds,
        )

    def generate(self, prompts: list[list[int]], max_new_tokens: int = 32,
                 eos_token_id: int | None = None) -> list[list[int]]:
        """Batched greedy generation; exact target-greedy output stream."""
        tgt, dft = self.target, self.draft
        B = tgt.max_batch
        assert len(prompts) <= B
        ids = np.zeros((B, max(max(len(p) for p in prompts), 1)), np.int32)
        lengths = np.zeros((B,), np.int32)
        for i, p in enumerate(prompts):
            ids[i, : len(p)] = p
            lengths[i] = max(len(p), 1)
        lengths = np.maximum(lengths, 1)

        tgt_cache, _, first = tgt.prefill(
            tgt.new_cache(), ids, lengths, with_tokens=True
        )
        # The draft only needs its cache populated; its logits are unused.
        dft_cache, _ = dft.prefill(dft.new_cache(), ids, lengths)
        first = np.asarray(first)

        outputs: list[list[int]] = [[] for _ in prompts]
        budgets = np.zeros((B,), np.int32)
        eos = np.full((B,), -1, np.int32)
        tokens = np.zeros((B,), np.int32)
        for i, p in enumerate(prompts):
            outputs[i].append(int(first[i]))
            budgets[i] = max_new_tokens - 1
            if eos_token_id is not None:
                eos[i] = eos_token_id
                if first[i] == eos_token_id:
                    budgets[i] = 0
            tokens[i] = first[i]

        # Worst case one token per round; typical is 2-4x fewer rounds.
        while budgets.max() > 0:
            rounds = max(int(np.ceil(budgets.max() / self.k)), 1)
            tgt_cache, dft_cache, blob = self.decode(
                tgt_cache, dft_cache, tokens, rounds, budgets=budgets, eos=eos
            )
            blob = np.asarray(blob)
            for i in range(len(prompts)):
                for r in range(rounds):
                    row = blob[i, r]
                    emitted = row[self.k]
                    outputs[i].extend(int(t) for t in row[:emitted])
            emitted_total = blob[:, :, self.k].sum(axis=1)
            done = blob[:, -1, self.k + 1].astype(bool)
            budgets = np.where(done, 0, budgets - emitted_total).astype(np.int32)
            for i in range(len(prompts)):
                if outputs[i]:
                    tokens[i] = outputs[i][-1]
        return outputs
