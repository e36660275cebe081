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
* exactness: the speculative stream equals target-only greedy even at
  ~zero acceptance (the correctness contract, also pinned on CPU in
  tests/engine/test_speculative.py).

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

    # Correctness at ~zero acceptance: speculative stream == plain greedy.
    tc, dc, first = fresh()
    _, _, cblob = spec.decode(tc, dc, first, 64,
                              budgets=np.full((batch,), 64, np.int32))
    cblob = np.asarray(cblob)
    for b in range(batch):
        toks = []
        for r in range(cblob.shape[1]):
            toks.extend(cblob[b, r, : cblob[b, r, k]].tolist())
        assert toks[:64] == gen_plain[b, :64].tolist(), (
            f"row {b}: speculative diverges from target greedy"
        )

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
        "exact_greedy_match": True,
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
