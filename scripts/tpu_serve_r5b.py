"""Serving round 5b: batched blob fetch + workload-mix closure (VERDICT #1).

Follow-up to scripts/tpu_serve_decomp.py, which pinned the terms:
wall = decode(slot_steps)/rate_fixed + admission_prefill (ZERO residual at
chunk=32), with chunk=16 host-bound on per-round blob fetches (~28 ms each).
The scheduler now stacks a pipelined group's blobs on device and fetches
ONCE, which should make chunk=16's higher occupancy (0.795 vs 0.729)
actually cash out.

Arms:
  c32_narrow     — round-5a best (17.6k) re-run under the batched fetch
  c16_narrow     — chunk=16 pipeline=48: the previously host-bound config
  gen32 / gen16  — generation-heavy workload (max_new 128-256): prompt
                   ingest becomes a small share of the wall, so the
                   generated-tok/s utilization bound rises — this arm shows
                   where the scheduler lands when the workload lets it.

Run alone on the chip:
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/tpu_serve_r5b.py
"""

import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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

    def arm(name, chunk, pipeline, gen_heavy=False):
        if gen_heavy:
            os.environ["OQT_SERVE_NEW_LO"] = "128"
            os.environ["OQT_SERVE_NEW_HI"] = "257"
        else:
            os.environ.pop("OQT_SERVE_NEW_LO", None)
            os.environ.pop("OQT_SERVE_NEW_HI", None)
        row = tbs.serve(model, None, chunk, pipeline=pipeline, narrow=True,
                        engine=engine, repeats=3)
        row["arm"] = name
        rows.append(row)
        print(json.dumps(row), flush=True)

    arm("c32_narrow", 32, 24)
    arm("c16_narrow", 16, 48)
    arm("gen32_narrow", 32, 24, gen_heavy=True)
    arm("gen16_narrow", 16, 48, gen_heavy=True)
    print(json.dumps({"probe": "serve_r5b", "rows": rows}))


if __name__ == "__main__":
    main()
