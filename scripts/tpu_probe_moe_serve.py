"""Why is MoE serving admission-bound? (round 5c follow-up)

serve_r5c measured MoE at 3,777 gen tok/s = 34.6% of its fixed-batch
ceiling, vs 53% for both dense families on the identical workload; the
decomposition leaves ~1.34 s of a 2.37 s wall in admission rounds
(~149 ms each vs 18 ms at 270M / ~40 ms at 1B). Hypothesis: admission
prefills (M = A*T_pad ~= 2048) take the ragged path FROM THE FUSED SOURCE,
which dequantizes the whole concatenated MLP (3.7 GB of traffic at this
config) and sorts inside EVERY admission round — the dequant-once trade
only amortizes at much larger M, and dense-masked fused admission should
cost ~5-10 ms at this M.

Arms (one engine per arm — the model stamp changes traced programs):
  ragged_auto — repro of serve_r5c moe_c16 (ragged at M>=128)
  ragged_off  — use_ragged_prefill=False on every block: admission prefills
                run the dense-masked fused path
  admit_auto / admit_off — max_new=2 (admission-priced) for both modes

Run alone on the chip:
  PYTHONPATH=/root/repo:$PYTHONPATH OQT_SERVE_MODEL=moe python scripts/tpu_probe_moe_serve.py
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
os.environ.setdefault("OQT_SERVE_MODEL", "moe")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    import tpu_bench_serving as tbs
    from onnx_quantize_tpu.engine import (
        ContinuousBatchingScheduler,
        InferenceEngine,
    )

    model, params = tbs.build()
    device = jax.devices()[0]
    params = jax.tree.map(lambda a: jax.device_put(a, device), params)

    rng0 = np.random.default_rng(0)
    standard = [
        (list(rng0.integers(1, model.cfg.vocab_size,
                            size=int(rng0.integers(32, 129)))),
         int(rng0.integers(48, 97)))
        for _ in range(128)
    ]
    rng1 = np.random.default_rng(0)
    admitty = [
        (list(rng1.integers(1, model.cfg.vocab_size,
                            size=int(rng1.integers(32, 129)))), 2)
        for _ in range(128)
    ]

    rows = []

    def arm(name, ragged, prompts):
        for blk in model.blocks:
            blk.mlp.use_ragged_prefill = ragged
        engine = InferenceEngine(model, params, max_batch=32, max_seq=512,
                                 kv_quant=True, dtype=jnp.bfloat16)

        def make():
            s = ContinuousBatchingScheduler(engine, chunk=16, pipeline=48)
            s.narrow_admit = True
            return s

        warm = make()
        for p, m in prompts:
            warm.submit(p, max_new_tokens=m)
        warm.run()
        runs = []
        for _ in range(3):
            sched = make()
            reqs = [sched.submit(p, max_new_tokens=m) for p, m in prompts]
            t0 = time.time()
            sched.run()
            wall = time.time() - t0
            gen = sum(len(r.output) for r in reqs)
            runs.append((gen / wall, wall, gen, sched.stats))
        runs.sort()
        med = runs[len(runs) // 2]
        row = {"arm": name, "ragged": str(ragged),
               "generated_tok_s": round(med[0], 1),
               "range": [round(runs[0][0], 1), round(runs[-1][0], 1)],
               "wall_s": round(med[1], 2), "generated": med[2],
               "admit_rounds": med[3]["admit_rounds"],
               "occupancy": round(med[3]["emitted"] / max(med[3]["slot_steps"], 1), 4)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    arm("ragged_auto", "auto", standard)
    arm("ragged_off", False, standard)
    arm("admit_auto", "auto", admitty)
    arm("admit_off", False, admitty)
    print(json.dumps({"probe": "moe_serve_ragged", "rows": rows}))


if __name__ == "__main__":
    main()
