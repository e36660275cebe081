"""Attribute the 4B prefill gap (0.787x vs bf16, round-5 headline matrix).

The matrix surfaced an honest negative: Gemma-3-4B prefill runs at 0.79x of
bf16 (TTFT 1064 vs 838 ms) while 270M/1B sit at 0.99/0.97x.  BENCH.md round 5
*hypothesised* the W4-g64 lm_head — but `engine.prefill` gathers the last
valid position BEFORE the head, so the head runs at (B, 1, K) where the fused
kernel costs ~1 ms.  This probe decomposes the gap with three sequential arms
(two engines resident OOM the chip at 4B, so arms run alone, slope-timed):

  A  bf16 body + bf16 head            (control)
  B  W4 g128 body + bf16 head        (isolates the body's dequant+dense path)
  C  bf16 body + W4 g64 head          (isolates the head)

Implied shipped ratio = (B/A) * (C/A); the matrix measured 0.787 directly.
Prefill timing = slope over 1 vs 3 back-to-back prefills (cancels the fixed
tunnel sync), median of repeats, B=32, T=512 — identical doctrine to
scripts/tpu_headline_matrix.py.

Run alone on the chip:
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/tpu_probe_4b_prefill.py
"""

import dataclasses
import gc
import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(arm):
    import jax

    import onnx_quantize_tpu as oqt
    from onnx_quantize_tpu.models.gemma3 import (
        GEMMA3_4B,
        Gemma3,
        fuse_gemma3_projections,
    )

    cfg = dataclasses.replace(GEMMA3_4B, dtype="bfloat16")
    model = Gemma3(cfg)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = model.init(jax.random.key(0))
        if arm in ("body", "shipped"):
            qconfig = oqt.QConfig(
                weights=oqt.QWeightArgs(dtype="uint4", group_size=128),
                ignore=["lm_head"],
            )
            params, _ = oqt.quantize(model, params, qconfig)
        if arm in ("head", "shipped"):
            head_cfg = oqt.QConfig(
                weights=oqt.QWeightArgs(dtype="uint4", group_size=64),
                ignore=[r"^layers\."],
            )
            params, _ = oqt.quantize(model, params, head_cfg)
        params = fuse_gemma3_projections(params)
    return model, params


def prefill_tput(model, params, batch=32, prefill_len=512, repeats=4):
    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu

    from onnx_quantize_tpu.engine import InferenceEngine

    device = jax.devices()[0]
    params = jtu.tree_map(lambda a: jax.device_put(a, device), params)
    quantized = any(
        hasattr(leaf, "meta") for leaf in jtu.tree_leaves(
            params, is_leaf=lambda x: hasattr(x, "meta"))
    )
    eng = InferenceEngine(
        model, params, max_batch=batch, max_seq=prefill_len,
        kv_quant=False, dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    ids = rng.integers(1, model.cfg.vocab_size,
                       size=(batch, prefill_len)).astype(np.int32)
    lengths = np.full((batch,), prefill_len, np.int32)
    cache = eng.new_cache()
    cache, logits = eng.prefill(cache, ids, lengths)
    float(np.asarray(logits)[0, 0])  # true sync (cold block_until_ready lies)

    t = {"lo": [], "hi": []}
    for _ in range(repeats):
        for key, n in (("lo", 1), ("hi", 3)):
            t0 = time.time()
            for _ in range(n):
                cache, logits = eng.prefill(cache, ids, lengths)
            jax.block_until_ready(logits)
            t[key].append(time.time() - t0)
    per = [(hi - lo) / 2 for lo, hi in zip(sorted(t["lo"]), sorted(t["hi"]))]
    med = float(np.median(per))
    lo_s, hi_s = float(np.min(per)), float(np.max(per))
    del eng, cache, logits, params
    gc.collect()
    return {
        "tok_s": batch * prefill_len / med,
        "ttft_ms": med * 1e3,
        "spread_tok_s": [batch * prefill_len / hi_s, batch * prefill_len / lo_s],
        "quantized_leaves": bool(quantized),
    }


def main():
    arms = os.environ.get("OQT_PROBE_ARMS", "bf16,body,head").split(",")
    out = {}
    for arm in arms:
        model, params = build(arm)
        out[arm] = prefill_tput(model, params)
        del model, params
        gc.collect()
        print(json.dumps({arm: {k: (round(v, 1) if isinstance(v, float) else v)
                                for k, v in out[arm].items()}}), flush=True)
    if "bf16" in out:
        base = out["bf16"]["tok_s"]
        ratios = {a: round(out[a]["tok_s"] / base, 3) for a in out}
        if "body" in out and "head" in out:
            ratios["implied_shipped"] = round(
                (out["body"]["tok_s"] / base) * (out["head"]["tok_s"] / base), 3)
        print(json.dumps({"ratios_vs_bf16": ratios}), flush=True)


if __name__ == "__main__":
    main()
