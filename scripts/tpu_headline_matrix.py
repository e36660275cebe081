"""Round-5 headline matrix: decode + prefill/TTFT, all families, one session.

VERDICT r4 #4: the r04 headline (42.1k @ 1.859x) jumped +15% over r03 with no
code change on that path, and the 1B/4B rows dated from round 2.  This script
re-pins the WHOLE matrix under the repo's timing doctrine, upgraded with
INTERLEAVED arms: both the quantized and bf16 engines are resident at once and
timed samples alternate q,f,q,f within each repeat, so slow machine drift
(tunnel load, thermal) lands on both arms equally instead of biasing whichever
arm ran second.  Decode stays slope-timed (tokens at 4*steps minus tokens at
steps over the time delta — cancels the ~32 ms fixed tunnel sync; bench.py
doctrine), medians over ``repeats`` interleaved pairs, spreads quoted.

Per model row: decode tok/s (B=32, S=512, W4 g128 body + per-model head +
int8 KV vs bf16), prefill tok/s + TTFT (B=32, T=512).

Models via OQT_MATRIX_MODELS (comma list, default "270m,1b,4b,moe").

Run alone on the chip:
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/tpu_headline_matrix.py
"""

import gc
import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def build(model_name, quantized):
    """bench.py's exact build recipe (same per-model head choice)."""
    import dataclasses

    import jax

    from bench import _build
    from onnx_quantize_tpu.models.gemma3 import GEMMA3_1B, GEMMA3_4B, GEMMA3_270M

    cpu = jax.devices("cpu")[0]
    if model_name == "moe":
        from onnx_quantize_tpu.models.moe import moe_config

        base = moe_config(
            num_experts=8, num_experts_per_tok=2, moe_intermediate_size=2816,
            shared_expert_size=0, norm_topk_prob=True, vocab_size=32_768,
            hidden_size=1024, intermediate_size=2816, num_layers=16,
            num_heads=8, num_kv_heads=2, head_dim=128, rope_theta=1_000_000.0,
        )
    else:
        base = {"1b": GEMMA3_1B, "4b": GEMMA3_4B}.get(model_name, GEMMA3_270M)
    cfg = dataclasses.replace(base, dtype="bfloat16")
    head = "w4" if model_name == "4b" else "int8"
    return _build(cfg, quantized=quantized, cpu_device=cpu, head=head)


def make_engine(model, params, quantized, batch, max_seq):
    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu

    from onnx_quantize_tpu.engine import InferenceEngine

    device = jax.devices()[0]
    params = jtu.tree_map(lambda a: jax.device_put(a, device), params)
    return InferenceEngine(
        model, params, max_batch=batch, max_seq=max_seq,
        kv_quant="int8" if quantized else False, dtype=jnp.bfloat16,
    )


def bench_model(model_name, batch=32, prompt_len=128, steps=64, max_seq=512,
                prefill_len=512, repeats=5, sequential=False):
    import jax

    if sequential:
        # 4B cannot hold both arms resident (8 GB bf16 + 2.3 GB W4 + caches
        # + XLA workspace OOMs the 16 GB chip — measured), so its arms run
        # sequentially like bench.py; the interleaving protection does not
        # apply and the row notes it.
        return bench_model_sequential(model_name, batch, prompt_len, steps,
                                      max_seq, prefill_len, repeats)

    arms = {}
    for q in (True, False):
        model, params = build(model_name, q)
        arms[q] = {"engine": make_engine(model, params, q, batch, max_seq),
                   "model": model}
        del params

    rng = np.random.default_rng(0)
    steps_lo, steps_hi = steps, 4 * steps

    # ---- warm both arms' prefill + both scan programs (value-fetch sync).
    for q, arm in arms.items():
        eng, model = arm["engine"], arm["model"]
        ids = rng.integers(1, model.cfg.vocab_size,
                           size=(batch, prompt_len)).astype(np.int32)
        lengths = np.full((batch,), prompt_len, np.int32)
        cache = eng.new_cache()
        cache, logits = eng.prefill(cache, ids, lengths)
        tokens = np.asarray(np.argmax(logits, axis=-1), np.int32)
        cache, gen = eng.decode_multi(cache, tokens, steps=steps_lo)
        tokens = np.asarray(gen)[:, -1]
        cache, gen = eng.decode_multi(cache, tokens, steps=steps_hi)
        arm["cache"], arm["tokens"] = cache, np.asarray(gen)[:, -1]
        arm["ids"], arm["lengths"] = ids, lengths

    # ---- interleaved decode sampling: within each repeat q/f alternate at
    # both scan lengths, so drift is shared.
    t = {True: {"lo": [], "hi": []}, False: {"lo": [], "hi": []}}
    for _ in range(repeats):
        for key, n_steps in (("lo", steps_lo), ("hi", steps_hi)):
            for q in (True, False):
                arm = arms[q]
                t0 = time.time()
                arm["cache"], gen = arm["engine"].decode_multi(
                    arm["cache"], arm["tokens"], steps=n_steps)
                jax.block_until_ready(gen)
                t[q][key].append(time.time() - t0)
                arm["tokens"] = np.asarray(gen)[:, -1]

    extra = batch * (steps_hi - steps_lo)
    decode = {}
    for q in (True, False):
        pairs = [extra / (hi - lo)
                 for lo, hi in zip(sorted(t[q]["lo"]), sorted(t[q]["hi"]))]
        decode[q] = (float(np.median(pairs)), float(np.min(pairs)),
                     float(np.max(pairs)))

    # ---- prefill/TTFT: slope over 1 vs 3 prefills, interleaved arms.
    for q, arm in arms.items():
        arm.pop("cache", None)  # free decode caches before the prefill ones
        gc.collect()
        model = arm["model"]
        ids = rng.integers(1, model.cfg.vocab_size,
                           size=(batch, prefill_len)).astype(np.int32)
        arm["p_ids"] = ids
        arm["p_lengths"] = np.full((batch,), prefill_len, np.int32)
        cache = arm["engine"].new_cache()
        cache, logits = arm["engine"].prefill(cache, ids, arm["p_lengths"])
        float(np.asarray(logits)[0, 0])  # true sync on the cold program
        arm["p_cache"] = cache

    def prefill_n(arm, n):
        t0 = time.time()
        for _ in range(n):
            arm["p_cache"], logits = arm["engine"].prefill(
                arm["p_cache"], arm["p_ids"], arm["p_lengths"])
        jax.block_until_ready(logits)
        return time.time() - t0

    p = {True: {"lo": [], "hi": []}, False: {"lo": [], "hi": []}}
    for _ in range(max(3, repeats - 2)):
        for key, n in (("lo", 1), ("hi", 3)):
            for q in (True, False):
                p[q][key].append(prefill_n(arms[q], n))
    prefill = {}
    for q in (True, False):
        per = [(hi - lo) / 2
               for lo, hi in zip(sorted(p[q]["lo"]), sorted(p[q]["hi"]))]
        med = float(np.median(per))
        prefill[q] = (batch * prefill_len / med, med * 1e3)

    row = {
        "model": model_name,
        "decode_tok_s": round(decode[True][0], 1),
        "decode_spread": [round(decode[True][1], 1), round(decode[True][2], 1)],
        "decode_bf16_tok_s": round(decode[False][0], 1),
        "decode_bf16_spread": [round(decode[False][1], 1),
                               round(decode[False][2], 1)],
        "decode_vs_bf16": round(decode[True][0] / decode[False][0], 3),
        "prefill_tok_s": round(prefill[True][0], 1),
        "prefill_bf16_tok_s": round(prefill[False][0], 1),
        "prefill_vs_bf16": round(prefill[True][0] / prefill[False][0], 3),
        "ttft_ms": round(prefill[True][1], 1),
        "ttft_bf16_ms": round(prefill[False][1], 1),
        "batch": batch, "steps": [steps_lo, steps_hi], "repeats": repeats,
    }
    del arms
    gc.collect()
    return row


def bench_model_sequential(model_name, batch, prompt_len, steps, max_seq,
                           prefill_len, repeats):
    import jax

    rng = np.random.default_rng(0)
    steps_lo, steps_hi = steps, 4 * steps
    out = {}
    for q in (True, False):
        model, params = build(model_name, q)
        eng = make_engine(model, params, q, batch, max_seq)
        del params
        ids = rng.integers(1, model.cfg.vocab_size,
                           size=(batch, prompt_len)).astype(np.int32)
        lengths = np.full((batch,), prompt_len, np.int32)
        cache = eng.new_cache()
        cache, logits = eng.prefill(cache, ids, lengths)
        tokens = np.asarray(np.argmax(logits, axis=-1), np.int32)
        cache, gen = eng.decode_multi(cache, tokens, steps=steps_lo)
        tokens = np.asarray(gen)[:, -1]
        cache, gen = eng.decode_multi(cache, tokens, steps=steps_hi)
        tokens = np.asarray(gen)[:, -1]
        t = {"lo": [], "hi": []}
        for _ in range(repeats):
            for key, n_steps in (("lo", steps_lo), ("hi", steps_hi)):
                t0 = time.time()
                cache, gen = eng.decode_multi(cache, tokens, steps=n_steps)
                jax.block_until_ready(gen)
                t[key].append(time.time() - t0)
                tokens = np.asarray(gen)[:, -1]
        extra = batch * (steps_hi - steps_lo)
        pairs = [extra / (hi - lo)
                 for lo, hi in zip(sorted(t["lo"]), sorted(t["hi"]))]
        decode = (float(np.median(pairs)), float(np.min(pairs)),
                  float(np.max(pairs)))

        # Free the decode-phase cache before allocating the prefill one —
        # at 4B two live caches + params OOM the chip (measured).
        del cache, gen, logits
        gc.collect()
        p_ids = rng.integers(1, model.cfg.vocab_size,
                             size=(batch, prefill_len)).astype(np.int32)
        p_lengths = np.full((batch,), prefill_len, np.int32)
        p_cache = eng.new_cache()
        p_cache, logits = eng.prefill(p_cache, p_ids, p_lengths)
        float(np.asarray(logits)[0, 0])
        p = {"lo": [], "hi": []}
        for _ in range(max(3, repeats - 2)):
            for key, n in (("lo", 1), ("hi", 3)):
                t0 = time.time()
                for _ in range(n):
                    p_cache, logits = eng.prefill(p_cache, p_ids, p_lengths)
                jax.block_until_ready(logits)
                p[key].append(time.time() - t0)
        per = [(hi - lo) / 2
               for lo, hi in zip(sorted(p["lo"]), sorted(p["hi"]))]
        med = float(np.median(per))
        out[q] = {"decode": decode,
                  "prefill": (batch * prefill_len / med, med * 1e3)}
        del eng, p_cache, logits
        gc.collect()

    decode, prefill = {k: v["decode"] for k, v in out.items()}, {
        k: v["prefill"] for k, v in out.items()}
    return {
        "model": model_name, "arms": "sequential (both resident OOMs)",
        "decode_tok_s": round(decode[True][0], 1),
        "decode_spread": [round(decode[True][1], 1), round(decode[True][2], 1)],
        "decode_bf16_tok_s": round(decode[False][0], 1),
        "decode_bf16_spread": [round(decode[False][1], 1),
                               round(decode[False][2], 1)],
        "decode_vs_bf16": round(decode[True][0] / decode[False][0], 3),
        "prefill_tok_s": round(prefill[True][0], 1),
        "prefill_bf16_tok_s": round(prefill[False][0], 1),
        "prefill_vs_bf16": round(prefill[True][0] / prefill[False][0], 3),
        "ttft_ms": round(prefill[True][1], 1),
        "ttft_bf16_ms": round(prefill[False][1], 1),
        "batch": batch, "steps": [steps_lo, steps_hi], "repeats": repeats,
    }


def main():
    models = os.environ.get("OQT_MATRIX_MODELS", "270m,1b,4b,moe").split(",")
    rows = []
    for name in models:
        name = name.strip()
        row = bench_model(name, sequential=(name == "4b"))
        rows.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"probe": "headline_matrix_r5", "rows": rows}))


if __name__ == "__main__":
    main()
