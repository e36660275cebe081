"""Per-round timing probe for the serve_chunk scheduler path.

Categorizes each scheduler round (admit vs no-admit, active slots) and times
it, to locate where the serving wall-clock goes. Run alone on the chip:

  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/tpu_probe_serve_rounds.py
"""

import json
import os
import time

os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")

import numpy as np


def main():
    import dataclasses
    import sys

    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import _build

    from onnx_quantize_tpu.engine import ContinuousBatchingScheduler, InferenceEngine
    from onnx_quantize_tpu.models.gemma3 import GEMMA3_270M

    cfg = dataclasses.replace(GEMMA3_270M, dtype="bfloat16")
    model, params = _build(cfg, quantized=True, cpu_device=jax.devices("cpu")[0])
    device = jax.devices()[0]
    params = jtu.tree_map(lambda a: jax.device_put(a, device), params)
    engine = InferenceEngine(model, params, max_batch=32, max_seq=512,
                             kv_quant=True, dtype=jnp.bfloat16)

    chunk = 16
    rng = np.random.default_rng(0)
    prompts = [
        (list(rng.integers(1, model.cfg.vocab_size,
                           size=int(rng.integers(32, 129)))),
         int(rng.integers(48, 97)))
        for _ in range(128)
    ]

    # Warm all program variants: one run of the same full workload.
    warm = ContinuousBatchingScheduler(engine, chunk=chunk)
    for p, m in prompts:
        warm.submit(p, max_new_tokens=m)
    t0 = time.time()
    warm.run()
    print(json.dumps({"warm_full_s": round(time.time() - t0, 1)}), flush=True)

    sched = ContinuousBatchingScheduler(engine, chunk=chunk)
    reqs = [sched.submit(p, max_new_tokens=m) for p, m in prompts]
    rounds = []
    t_all = time.time()
    while sched.has_work:
        n_queue = len(sched.queue)
        n_active = sum(s is not None for s in sched.slots)
        free = 32 - n_active
        will_admit = min(free, n_queue)
        t0 = time.time()
        sched.step()
        dt = time.time() - t0
        rounds.append({"admit": will_admit, "active": n_active, "dt_ms": round(dt * 1e3, 1)})
    wall = time.time() - t_all
    generated = sum(len(r.output) for r in reqs)

    admit_rounds = [r for r in rounds if r["admit"] > 0]
    plain_rounds = [r for r in rounds if r["admit"] == 0]
    print(json.dumps({
        "rounds": len(rounds),
        "wall_s": round(wall, 2),
        "generated_tok_s": round(generated / wall, 1),
        "admit_rounds": len(admit_rounds),
        "admit_dt_ms": [r["dt_ms"] for r in admit_rounds],
        "plain_dt_ms": [r["dt_ms"] for r in plain_rounds],
    }, indent=None), flush=True)
    for r in rounds:
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
