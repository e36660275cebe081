"""Serving A/B: speculative decoding composed with continuous batching.

VERDICT r4 #3's bench half. The exactness half is pinned on CPU
(tests/engine/test_spec_scheduler.py: greedy streams token-for-token equal
to the plain scheduler). Here the production-shaped throughput question runs
on the chip, with STRUCTURED weights (models/structured.py) so logits are
peaked and the draft/target relationship is meaningful rather than
random-argmax noise.

Self-speculation pairing (the only honest pairing without trained
checkpoints): target = bf16 270M, draft = the SAME weights W4-quantized.
Acceptance between them is a real, measurable quantity (how often does int4
flip the greedy token), and the config is a real deployment pattern.

Arms:
  cb_bf16      — plain continuous batching on the bf16 target
                 (chunk=16, pipeline=48, narrow: the round-5 serving config).
  cb_w4        — plain CB on the W4 engine (what you'd ship if draft
                 quality were acceptable as the OUTPUT: the ceiling for any
                 speculation gain).
  spec_w4draft — SpeculativeScheduler: W4 draft proposes k tokens, bf16
                 target verifies; output = target-quality stream.
  spec_self    — draft IS the target (acceptance 1.0): prices the
                 composition at perfect acceptance; any loss here is
                 scheduler/tunnel overhead, not draft quality.

Run alone on the chip:
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/tpu_bench_spec_serving.py
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = int(os.environ.get("OQT_SPEC_K", "3"))
ROUNDS = int(os.environ.get("OQT_SPEC_ROUNDS", "8"))
N_REQ = int(os.environ.get("OQT_SPEC_REQUESTS", "64"))


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    import onnx_quantize_tpu as oqt
    from onnx_quantize_tpu.engine import (
        ContinuousBatchingScheduler,
        InferenceEngine,
    )
    from onnx_quantize_tpu.engine.speculative import SpeculativeDecoder
    from onnx_quantize_tpu.engine.spec_scheduler import SpeculativeScheduler
    from onnx_quantize_tpu.models.gemma3 import GEMMA3_270M, Gemma3
    from onnx_quantize_tpu.models.gemma3 import fuse_gemma3_projections
    from onnx_quantize_tpu.models.structured import structured_params

    cpu = jax.devices("cpu")[0]
    dev = jax.devices()[0]
    cfg = dataclasses.replace(GEMMA3_270M, dtype="bfloat16")
    model = Gemma3(cfg)
    with jax.default_device(cpu):
        params_f = structured_params(model)
        qcfg = oqt.QConfig(weights=oqt.QWeightArgs(dtype="uint4", group_size=128),
                           ignore=["lm_head"])
        params_q, _ = oqt.quantize(model, params_f, qcfg)
        head = oqt.QConfig(weights=oqt.QWeightArgs(dtype="int8", group_size=-1,
                                                   symmetric=True),
                           ignore=[r"^layers\."])
        params_q, _ = oqt.quantize(model, params_q, head)
        params_f = fuse_gemma3_projections(params_f)
        params_q = fuse_gemma3_projections(params_q)
    put = lambda p: jax.tree.map(lambda a: jax.device_put(a, dev), p)
    params_f, params_q = put(params_f), put(params_q)

    eng_f = InferenceEngine(model, params_f, max_batch=32, max_seq=512,
                            kv_quant="int8", dtype=jnp.bfloat16)
    eng_q = InferenceEngine(model, params_q, max_batch=32, max_seq=512,
                            kv_quant="int8", dtype=jnp.bfloat16)
    # Separate draft engines (own caches) sharing each param set.
    dft_q = InferenceEngine(model, params_q, max_batch=32, max_seq=512,
                            kv_quant="int8", dtype=jnp.bfloat16)
    dft_f = InferenceEngine(model, params_f, max_batch=32, max_seq=512,
                            kv_quant="int8", dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    prompts = [
        (list(rng.integers(1, model.cfg.vocab_size,
                           size=int(rng.integers(32, 129)))),
         int(rng.integers(48, 97)))
        for _ in range(N_REQ)
    ]

    rows = []

    def run_cb(name, engine):
        def make():
            s = ContinuousBatchingScheduler(engine, chunk=16, pipeline=48)
            s.narrow_admit = True
            return s

        for rep in range(4):  # rep 0 = warmup (compiles)
            sched = make()
            reqs = [sched.submit(p, max_new_tokens=m) for p, m in prompts]
            t0 = time.time()
            sched.run()
            wall = time.time() - t0
            if rep == 0:
                continue
            gen = sum(len(r.output) for r in reqs)
            rows.append({"arm": name, "rep": rep, "generated_tok_s":
                         round(gen / wall, 1), "wall_s": round(wall, 3)})
        best = max(r["generated_tok_s"] for r in rows if r["arm"] == name)
        print(json.dumps({"arm": name, "best_tok_s": best}), flush=True)

    def run_spec(name, target, draft):
        spec = SpeculativeDecoder(target, draft, k=K)

        def make():
            return SpeculativeScheduler(spec, rounds=ROUNDS)

        stats = None
        for rep in range(4):
            sched = make()
            reqs = [sched.submit(p, max_new_tokens=m) for p, m in prompts]
            t0 = time.time()
            sched.run()
            wall = time.time() - t0
            if rep == 0:
                continue
            gen = sum(len(r.output) for r in reqs)
            stats = sched.stats
            accept = (stats["emitted"] / max(stats["live_rounds"], 1) - 1) / K
            rows.append({"arm": name, "rep": rep,
                         "generated_tok_s": round(gen / wall, 1),
                         "wall_s": round(wall, 3),
                         "accept_rate": round(accept, 3),
                         "calls": stats["calls"]})
        best = max(r["generated_tok_s"] for r in rows if r["arm"] == name)
        print(json.dumps({"arm": name, "best_tok_s": best,
                          "accept": rows[-1]["accept_rate"]}), flush=True)

    run_cb("cb_bf16", eng_f)
    run_cb("cb_w4", eng_q)
    run_spec("spec_w4draft", eng_f, dft_q)
    run_spec("spec_self", eng_f, dft_f)
    print(json.dumps({"probe": "spec_serving_ab", "k": K, "rounds": ROUNDS,
                      "requests": N_REQ, "rows": rows}))


if __name__ == "__main__":
    main()
