"""Prefill throughput + time-to-first-token, quantized vs bf16.

Decode measures steady-state tokens/s; serving also cares about the prefill
side: tokens ingested per second and the latency until the first generated
token. Prefill is MXU-compute-bound (large M), so quantization is expected to
roughly TIE here — W4 saves weight bytes but pays nibble-unpack ALU, and at
M = B*T the dots are compute-limited. This records the honest number either
way (BENCH.md round 2: the W4 prefill kernel reaches ~62% of the datasheet
compute roofline at M=1024).

Slope-timed like bench.py: prefill is re-run over fresh cache slots at two
batch multiples so the fixed ~32 ms tunnel sync cancels.

Run alone on the chip:
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/tpu_bench_prefill.py [--model 1b]
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")

import numpy as np


def build(model_name, quantized):
    """bench.py's exact build recipe (same quantized config incl. the
    per-model lm_head choice), so prefill numbers measure the SHIPPED decode
    configuration rather than a drifted copy."""
    import dataclasses
    import sys

    import jax

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import _build

    from onnx_quantize_tpu.models.gemma3 import GEMMA3_1B, GEMMA3_4B, GEMMA3_270M

    cpu = jax.devices("cpu")[0]
    base = {"1b": GEMMA3_1B, "4b": GEMMA3_4B}.get(model_name, GEMMA3_270M)
    cfg = dataclasses.replace(base, dtype="bfloat16")
    head = "w4" if model_name == "4b" else "int8"
    return _build(cfg, quantized=quantized, cpu_device=cpu, head=head)


def prefill_tput(model, params, batch=32, prompt_len=512, max_seq=1024,
                 kv_quant=True, repeats=5):
    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu

    from onnx_quantize_tpu.engine import InferenceEngine

    device = jax.devices()[0]
    params = jtu.tree_map(lambda a: jax.device_put(a, device), params)
    engine = InferenceEngine(
        model, params, max_batch=batch, max_seq=max_seq, kv_quant=kv_quant,
        dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    ids = rng.integers(1, model.cfg.vocab_size, size=(batch, prompt_len)).astype(np.int32)
    lengths = np.full((batch,), prompt_len, np.int32)
    cache = engine.new_cache()

    # Warm with a true value sync.
    cache, logits = engine.prefill(cache, ids, lengths)
    float(np.asarray(logits)[0, 0])

    # Slope over repeat counts: time N prefills vs 3N prefills.
    def timed(n):
        nonlocal cache
        t0 = time.time()
        for _ in range(n):
            cache, logits = engine.prefill(cache, ids, lengths)
        jax.block_until_ready(logits)
        return time.time() - t0

    timed(1)  # warm again post-donation
    lo_n, hi_n = repeats, 3 * repeats
    t_lo, t_hi = timed(lo_n), timed(hi_n)
    per_prefill = (t_hi - t_lo) / (hi_n - lo_n)
    tokens = batch * prompt_len
    return tokens / per_prefill, per_prefill


def main():
    model_name = "270m"
    if "--model" in sys.argv:
        model_name = sys.argv[sys.argv.index("--model") + 1].lower()

    rows = []
    for quantized in (True, False):
        model, params = build(model_name, quantized)
        tput, per_prefill = prefill_tput(
            model, params, kv_quant=quantized,
        )
        rows.append({
            "arm": "quantized" if quantized else "bf16",
            "prefill_tok_s": round(tput, 1),
            "ttft_ms": round(per_prefill * 1e3, 2),
        })
        print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({
        "probe": f"prefill_{model_name}",
        "batch": 32, "prompt_len": 512,
        "rows": rows,
        "vs_baseline": round(rows[0]["prefill_tok_s"] / rows[1]["prefill_tok_s"], 3),
    }))


if __name__ == "__main__":
    main()
