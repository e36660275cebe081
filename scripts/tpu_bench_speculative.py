"""Latency-mode benchmark: speculative decoding cost model on-chip.

At small batch the target's decode step is weight-bandwidth-bound, so
verifying k drafted tokens per target forward reads the target weights once
per k+1 tokens. Real SPEEDUP depends on the draft's acceptance rate, which
requires trained checkpoints (a random-init 270M cannot predict a random-init
1B/4B; same sandbox limitation as the wikitext ppl gate — BENCH.md). What CAN
be measured honestly on random weights:

* the plain target step cost and the full speculative round cost (k draft
  steps + one (B, k+1) verify forward) — both slope-timed;
* the implied tokens/s at acceptance rates alpha (tokens/round =
  1 + alpha*(k-1)) and the break-even alpha;
* the greedy prefix match rate vs the plain decode stream: exact in f32
  (tests/engine/test_speculative.py); on a bf16 stream the (B, k+1) verify
  and the (B, 1) decode reduce in different orders, so near-tied argmaxes
  can flip — reported, not asserted;
* the round decomposition (draft step vs verify cost).

Run alone on the chip:
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/tpu_bench_speculative.py
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(name):
    import dataclasses

    import jax

    from bench import _build

    from onnx_quantize_tpu.models.gemma3 import GEMMA3_1B, GEMMA3_4B, GEMMA3_270M

    base = {"1b": GEMMA3_1B, "4b": GEMMA3_4B}.get(name, GEMMA3_270M)
    cfg = dataclasses.replace(base, dtype="bfloat16")
    head = "w4" if name == "4b" else "int8"
    return _build(cfg, quantized=True, cpu_device=jax.devices("cpu")[0], head=head)


def bench_target(target_name, dmodel, dparams, batch, k, repeats=3):
    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu

    from onnx_quantize_tpu.engine import InferenceEngine, SpeculativeDecoder

    device = jax.devices()[0]
    tmodel, tparams = build(target_name)
    tparams = jtu.tree_map(lambda a: jax.device_put(a, device), tparams)

    max_seq, prompt_len = 2048, 64
    rng = np.random.default_rng(0)
    tgt = InferenceEngine(tmodel, tparams, max_batch=batch, max_seq=max_seq,
                          kv_quant=True, dtype=jnp.bfloat16)
    dft = InferenceEngine(dmodel, dparams, max_batch=batch, max_seq=max_seq,
                          kv_quant=True, dtype=jnp.bfloat16)
    spec = SpeculativeDecoder(tgt, dft, k=k)

    ids = rng.integers(1, tmodel.cfg.vocab_size,
                       size=(batch, prompt_len)).astype(np.int32)
    lengths = np.full((batch,), prompt_len, np.int32)

    def fresh():
        tc, _, first = tgt.prefill(tgt.new_cache(), ids, lengths,
                                   with_tokens=True)
        dc, _ = dft.prefill(dft.new_cache(), ids, lengths)
        return tc, dc, np.asarray(first)

    # ── plain decode arm: slope between 64 and 256 steps ─────────────────
    def plain(steps):
        tc, _, first = fresh()
        t0 = time.time()
        tc, gen = tgt.decode_multi(tc, first, steps=steps)
        gen = np.asarray(gen)  # true sync
        return time.time() - t0, gen

    plain(64); plain(256)  # warm
    t_lo = min(plain(64)[0] for _ in range(repeats))
    best = min((plain(256) for _ in range(repeats)), key=lambda x: x[0])
    t_hi, gen_plain = best
    step_us = (t_hi - t_lo) / (256 - 64) * 1e6
    plain_tps = batch / (step_us / 1e6)

    # ── speculative arm: slope between 16 and 64 rounds ──────────────────
    def spec_run(rounds):
        tc, dc, first = fresh()
        budgets = np.full((batch,), 10**6, np.int32)
        t0 = time.time()
        _, _, blob = spec.decode(tc, dc, first, rounds, budgets=budgets)
        blob = np.asarray(blob)
        return time.time() - t0, blob

    spec_run(16); spec_run(64)  # warm
    r_lo = min(spec_run(16)[0] for _ in range(repeats))
    best = min((spec_run(64) for _ in range(repeats)), key=lambda x: x[0])
    r_hi, blob = best
    round_us = (r_hi - r_lo) / (64 - 16) * 1e6
    emitted = blob[:, :, k]
    accept_measured = float(emitted.mean())  # ~1 with uncorrelated drafts

    # Correctness at ~zero acceptance: speculative stream vs plain greedy.
    # On a bf16 activation stream the (B, k+1) verify forward and the (B, 1)
    # decode compute logits with different reduction orders, so near-tied
    # argmaxes can flip (both are valid greedy under bf16 noise; the f32
    # contract is exact - tests/engine/test_speculative.py). Report the
    # match rate instead of asserting bit-equality.
    tc, dc, first = fresh()
    _, _, cblob = spec.decode(tc, dc, first, 64,
                              budgets=np.full((batch,), 64, np.int32))
    cblob = np.asarray(cblob)
    matches, total = 0, 0
    for b in range(batch):
        toks = []
        for r in range(cblob.shape[1]):
            toks.extend(cblob[b, r, : cblob[b, r, k]].tolist())
        ref = gen_plain[b, :64].tolist()
        got = toks[:64]
        n = min(len(got), len(ref))
        # Count the matching prefix: one tie-flip changes the whole suffix.
        p = 0
        while p < n and got[p] == ref[p]:
            p += 1
        matches += p
        total += n
    match_rate = matches / max(total, 1)

    # Round decomposition: draft-scan-only and verify-only slopes.
    def draft_only(steps):
        _, dc, first = fresh()
        t0 = time.time()
        dc, gen = dft.decode_multi(dc, first, steps=steps)
        np.asarray(gen)
        return time.time() - t0

    draft_only(64); draft_only(256)
    d_lo = min(draft_only(64) for _ in range(repeats))
    d_hi = min(draft_only(256) for _ in range(repeats))
    draft_step_us = (d_hi - d_lo) / (256 - 64) * 1e6

    import jax as _jax

    verify_fn = _jax.jit(
        lambda p, c, i: spec._verify(p, c, i, np.ones((batch,), bool))
    )
    tc, dc, first = fresh()
    vids = np.tile(first[:, None], (1, k + 1)).astype(np.int32)

    def verify_n(n):
        t0 = time.time()
        out = None
        for _ in range(n):
            _, out = verify_fn(tgt.params, tc, vids)
        np.asarray(out)
        return time.time() - t0

    verify_n(4)
    v_lo = min(verify_n(8) for _ in range(repeats))
    v_hi = min(verify_n(32) for _ in range(repeats))
    verify_us = (v_hi - v_lo) / (32 - 8) * 1e6

    def implied_tps(alpha):
        return batch * (1 + alpha * (k - 1)) / (round_us / 1e6)

    breakeven = None
    if k > 1:
        breakeven = max((round_us / step_us - 1) / (k - 1), 0.0)
    return {
        "probe": "speculative", "target": target_name, "draft": "270m",
        "batch": batch, "k": k,
        "plain_step_us": round(step_us, 1),
        "spec_round_us": round(round_us, 1),
        "plain_tok_s": round(plain_tps, 1),
        "measured_accept_tokens_per_round": round(accept_measured, 2),
        "implied_tok_s": {
            str(a): round(implied_tps(a), 1) for a in (0.6, 0.8, 1.0)
        },
        "implied_speedup": {
            str(a): round(implied_tps(a) / plain_tps, 3) for a in (0.6, 0.8, 1.0)
        },
        "breakeven_accept_rate": round(breakeven, 3),
        "greedy_prefix_match_rate": round(match_rate, 3),
        "draft_step_us": round(draft_step_us, 1),
        "verify_us": round(verify_us, 1),
    }


def main():
    import jax.tree_util as jtu

    import jax

    device = jax.devices()[0]
    dmodel, dparams = build("270m")
    dparams = jtu.tree_map(lambda a: jax.device_put(a, device), dparams)

    k = int(os.environ.get("OQT_SPEC_K", "4"))
    targets = os.environ.get("OQT_SPEC_TARGETS", "1b,4b").split(",")
    for tname in targets:
        for batch in (1, 4):
            row = bench_target(tname.strip(), dmodel, dparams, batch, k)
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
