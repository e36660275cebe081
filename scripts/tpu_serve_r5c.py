"""Serving round 5c: chunk=8 occupancy push + family rows under the r5 config.

With the batched blob fetch, the host chain is one sync per pipelined group,
so finer chunks only pay per-round DISPATCH (~1-2 ms host work) — chunk=8
should lift occupancy toward ~0.86 (less budget rounding + shorter drain
tails) for ~4% less decode-term time. Measures at 270M; then pins the 1B and
MoE serving rows under the round-5 headline config (chunk=16, pipeline=48,
narrow, batched fetch) so the serving table covers the families.

Run alone on the chip:
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/tpu_serve_r5c.py
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

    rows = []

    def family(name, arms):
        os.environ["OQT_SERVE_MODEL"] = name
        model, params = tbs.build()
        device = jax.devices()[0]
        params = jax.tree.map(lambda a: jax.device_put(a, device), params)
        engine = InferenceEngine(model, params, max_batch=32, max_seq=512,
                                 kv_quant=True, dtype=jnp.bfloat16)
        for arm_name, chunk, pipeline in arms:
            row = tbs.serve(model, None, chunk, pipeline=pipeline,
                            narrow=True, engine=engine, repeats=3)
            row["arm"] = f"{name}_{arm_name}"
            rows.append(row)
            print(json.dumps(row), flush=True)
        del engine, params
        import gc

        gc.collect()

    family("270m", [("c16", 16, 48), ("c8", 8, 96)])
    family("1b", [("c16", 16, 48)])
    family("moe", [("c16", 16, 48)])
    print(json.dumps({"probe": "serve_r5c", "rows": rows}))


if __name__ == "__main__":
    main()
