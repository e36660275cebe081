"""Serving-realism benchmark: continuous batching under random request load.

Unlike bench.py's fixed-batch decode, this measures the scheduler end to end:
N requests with random prompt/output lengths stream through B slots with
batched bucketed admission and chunked decode. ``chunk=1`` is the classic
per-step loop (host dispatch per token); ``chunk=16`` amortizes dispatch
through the compiled decode scan — the serving-mode analogue of the
decode_multi headline.

Run alone on the chip:
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/tpu_bench_serving.py
"""

import json
import os
import time

os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")

import numpy as np


def build():
    import dataclasses
    import sys

    import jax

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import _build

    from onnx_quantize_tpu.models.gemma3 import GEMMA3_1B, GEMMA3_270M

    name = os.environ.get("OQT_SERVE_MODEL", "270m").lower()
    if name == "moe":
        from onnx_quantize_tpu.models.moe import moe_config

        base = moe_config(
            num_experts=8, num_experts_per_tok=2, moe_intermediate_size=2816,
            shared_expert_size=0, norm_topk_prob=True, vocab_size=32_768,
            hidden_size=1024, intermediate_size=2816, num_layers=16,
            num_heads=8, num_kv_heads=2, head_dim=128,
            rope_theta=1_000_000.0,
        )
    else:
        base = GEMMA3_1B if name == "1b" else GEMMA3_270M
    cfg = dataclasses.replace(base, dtype="bfloat16")
    return _build(cfg, quantized=True, cpu_device=jax.devices("cpu")[0])


def serve(model, params, chunk, n_requests=128, max_batch=32, max_seq=None,
          seed=0, repeats=5, pipeline=1, narrow=None, engine=None):
    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu

    from onnx_quantize_tpu.engine import ContinuousBatchingScheduler, InferenceEngine

    if max_seq is None:
        max_seq = int(os.environ.get("OQT_SERVE_MAX_SEQ", "512"))
    if engine is None:
        device = jax.devices()[0]
        params = jtu.tree_map(lambda a: jax.device_put(a, device), params)
        engine = InferenceEngine(model, params, max_batch=max_batch,
                                 max_seq=max_seq, kv_quant=True,
                                 dtype=jnp.bfloat16)
    if narrow is None:
        narrow = os.environ.get("OQT_SERVE_NARROW", "1") != "0"

    def make_sched():
        s = ContinuousBatchingScheduler(engine, chunk=chunk, pipeline=pipeline)
        s.narrow_admit = narrow
        return s
    rng = np.random.default_rng(seed)
    # Prompt/output length ranges are env-tunable for regime studies (e.g.
    # OQT_SERVE_PROMPT_LO/HI=256/449 puts admission rounds in the
    # prefill-dominated regime where narrow admission should pay).
    p_lo = int(os.environ.get("OQT_SERVE_PROMPT_LO", "32"))
    p_hi = int(os.environ.get("OQT_SERVE_PROMPT_HI", "129"))
    n_lo = int(os.environ.get("OQT_SERVE_NEW_LO", "48"))
    n_hi = int(os.environ.get("OQT_SERVE_NEW_HI", "97"))
    prompts = [
        (list(rng.integers(1, model.cfg.vocab_size,
                           size=int(rng.integers(p_lo, p_hi)))),
         int(rng.integers(n_lo, n_hi)))
        for _ in range(n_requests)
    ]

    # Warm ALL program variants by running the full workload once: serving
    # rounds come in several compiled flavors (admit at each bucketed T_pad,
    # no-admit, drain) and a throwaway short-budget warmup misses most of
    # them — round 3's first measurement read 292 tok/s because the no-admit
    # chunk program compiled inside the timed region (minutes-per-compile
    # runtime; see BENCH.md round 3).
    warm = make_sched()
    for p, m in prompts:
        warm.submit(p, max_new_tokens=m)
    t0 = time.time()
    warm.run()
    warmup_s = time.time() - t0

    runs = []
    for _ in range(repeats):
        sched = make_sched()
        reqs = [sched.submit(p, max_new_tokens=m) for p, m in prompts]
        t0 = time.time()
        finished = sched.run()
        wall = time.time() - t0
        assert len(finished) == n_requests and all(r.done for r in reqs)
        generated = sum(len(r.output) for r in reqs)
        runs.append((generated / wall, generated, wall))

    runs.sort()
    gen_rates = [r[0] for r in runs]
    med = runs[len(runs) // 2]
    generated, wall = med[1], med[2]
    ingested = sum(len(p) for p, _ in prompts)

    # Per-request latency percentiles from the LAST measured run (host
    # timestamps the scheduler records at submit/admit/finish). All
    # requests are submitted upfront, so "total" includes queueing - the
    # time-in-system distribution under a saturating burst.
    def pct(vals, q):
        return round(float(np.percentile(vals, q)) * 1e3, 1)

    service = [r.t_finished - r.t_admitted for r in reqs]
    total = [r.t_finished - r.t_submitted for r in reqs]
    latency = {
        "service_ms_p50": pct(service, 50), "service_ms_p99": pct(service, 99),
        "total_ms_p50": pct(total, 50), "total_ms_p99": pct(total, 99),
    }
    stats = sched.stats
    occupancy = stats["emitted"] / max(stats["slot_steps"], 1)
    return {
        "latency": latency,
        "occupancy": round(occupancy, 4),
        "sched_stats": stats,
        "chunk": chunk,
        "narrow_admit": narrow,
        "pipeline": pipeline,
        "requests": n_requests,
        "generated_tokens": generated,
        "ingested_tokens": ingested,
        "wall_s": round(wall, 2),
        "generated_tok_s": round(med[0], 1),
        "generated_tok_s_range": [round(gen_rates[0], 1), round(gen_rates[-1], 1)],
        "total_tok_s": round((generated + ingested) / wall, 1),
        "warmup_s": round(warmup_s, 1),
    }


def main():
    model, params = build()
    chunks = tuple(
        int(c) for c in os.environ.get("OQT_SERVE_CHUNKS", "64,32,16,1").split(",")
    )
    pipeline = int(os.environ.get("OQT_SERVE_PIPELINE", "1"))
    rows = []
    if os.environ.get("OQT_SERVE_AB"):
        # A/B the narrow admission against the full masked admission on ONE
        # engine (shared compile cache), alternating arms to decorrelate any
        # machine-state drift from the arm.
        import jax
        import jax.numpy as jnp

        device = jax.devices()[0]
        params = jax.tree.map(lambda a: jax.device_put(a, device), params)
        from onnx_quantize_tpu.engine import InferenceEngine

        engine = InferenceEngine(
            model, params, max_batch=32,
            max_seq=int(os.environ.get("OQT_SERVE_MAX_SEQ", "512")),
            kv_quant=True, dtype=jnp.bfloat16)
        for chunk in chunks:
            for narrow in (True, False, True, False):
                rows.append(serve(model, params, chunk, pipeline=pipeline,
                                  narrow=narrow, engine=engine, repeats=3))
                print(json.dumps(rows[-1]), flush=True)
        name = os.environ.get("OQT_SERVE_MODEL", "270m").lower()
        print(json.dumps({"probe": f"serving_{name}_ab", "rows": rows}))
        return
    for chunk in chunks:
        rows.append(serve(model, params, chunk, pipeline=pipeline))
        print(json.dumps(rows[-1]), flush=True)
    name = os.environ.get("OQT_SERVE_MODEL", "270m").lower()
    print(json.dumps({"probe": f"serving_{name}", "rows": rows}))


if __name__ == "__main__":
    main()
