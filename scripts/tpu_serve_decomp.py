"""Serving-utilization decomposition + round-5 headline attempt (VERDICT #1).

Round-4 finding: serving plateaued at 43-49% of the fixed-batch decode
ceiling across families, with the lost half unattributed. The CPU simulation
(occ_sim) showed SLOT-STEP occupancy was already ~73% under the old
scheduler, so the wall-clock gap must live in: (a) admission-round prefill
compute (the full masked admission runs a (B, T_pad) forward every admission
round), (b) inter-group pipeline stalls (host parse + dispatch between
groups), (c) the per-round tunnel overhead itself.

Arms (one shared engine → shared compile cache; every arm full-workload
warmed first):

1. repro         — chunk=32 pipeline=4, full masked admission (round-4 config)
2. deep          — chunk=32 pipeline=24: planned admissions make the WHOLE
                   workload one pipelined group (no inter-group stalls)
3. deep+narrow   — same, rows-only (A, T_pad) admission prefill (the
                   admission-compute lever; planned per-round admissions
                   make admission rounds ~3x more frequent, so narrow now
                   matters where round 4 measured a wash)
4. c16+narrow    — chunk=16 pipeline=48: finer chunks raise occupancy
                   (0.795 vs 0.729 simulated) at 2x the round count
5. decode-arm    — 32 requests (exactly fills slots) max_new=96: one
                   admission round then pure decode — the serving-shaped
                   decode ceiling
6. admit-arm     — 128 requests max_new=2: admission-dominated; its tok/s
                   prices an admission round directly

Run alone on the chip:
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/tpu_serve_decomp.py
"""

import json
import os

os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import tpu_bench_serving as tbs
    from onnx_quantize_tpu.engine import InferenceEngine

    model, params = tbs.build()
    device = jax.devices()[0]
    params = jax.tree.map(lambda a: jax.device_put(a, device), params)
    engine = InferenceEngine(model, params, max_batch=32, max_seq=512,
                             kv_quant=True, dtype=jnp.bfloat16)

    rows = []

    def arm(name, chunk, pipeline, narrow, n_requests=128, fixed_new=None,
            repeats=3):
        rng = np.random.default_rng(0)
        kw = dict(chunk=chunk, pipeline=pipeline, narrow=narrow,
                  engine=engine, repeats=repeats, n_requests=n_requests)
        if fixed_new is not None:
            # Patch the workload: serve() builds its own prompts; replicate
            # its construction with a fixed max_new by monkey-causing the rng
            # — simpler to inline a custom run here.
            row = serve_fixed(tbs, model, engine, chunk, pipeline, narrow,
                              n_requests, fixed_new, repeats)
        else:
            row = tbs.serve(model, None, **kw)
        row["arm"] = name
        rows.append(row)
        print(json.dumps(row), flush=True)

    def serve_fixed(tbs, model, engine, chunk, pipeline, narrow, n_requests,
                    fixed_new, repeats):
        import time

        from onnx_quantize_tpu.engine import ContinuousBatchingScheduler

        rng = np.random.default_rng(0)
        prompts = [
            (list(rng.integers(1, model.cfg.vocab_size,
                               size=int(rng.integers(32, 129)))), fixed_new)
            for _ in range(n_requests)
        ]

        def make():
            s = ContinuousBatchingScheduler(engine, chunk=chunk,
                                            pipeline=pipeline)
            s.narrow_admit = narrow
            return s

        warm = make()
        for p, m in prompts:
            warm.submit(p, max_new_tokens=m)
        warm.run()
        runs = []
        for _ in range(repeats):
            sched = make()
            reqs = [sched.submit(p, max_new_tokens=m) for p, m in prompts]
            t0 = time.time()
            sched.run()
            wall = time.time() - t0
            generated = sum(len(r.output) for r in reqs)
            runs.append((generated / wall, generated, wall, sched.stats))
        runs.sort()
        med = runs[len(runs) // 2]
        return {
            "chunk": chunk, "pipeline": pipeline, "narrow_admit": narrow,
            "requests": n_requests, "generated_tokens": med[1],
            "wall_s": round(med[2], 2), "generated_tok_s": round(med[0], 1),
            "generated_tok_s_range": [round(runs[0][0], 1), round(runs[-1][0], 1)],
            "occupancy": round(med[3]["emitted"] / max(med[3]["slot_steps"], 1), 4),
            "sched_stats": med[3],
        }

    arm("repro_r4", 32, 4, False)
    arm("deep", 32, 24, False)
    arm("deep_narrow", 32, 24, True)
    arm("c16_narrow", 16, 48, True)
    arm("decode_arm", 32, 24, False, n_requests=32, fixed_new=96)
    arm("admit_arm", 32, 24, False, n_requests=128, fixed_new=2)
    arm("admit_arm_narrow", 32, 24, True, n_requests=128, fixed_new=2)

    print(json.dumps({"probe": "serve_decomp_r5", "rows": rows}))


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
