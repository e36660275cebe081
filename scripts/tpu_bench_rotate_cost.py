"""On-chip cost of the QuaRot ONLINE rotations (R3 q/k, R4 down-input).

The weight-space folds (R1/R2 and the Hᵀ halves of R3/R4) are free at
runtime; what this prices is the per-step online work: the per-head q/k
transform after RoPE (R3) and the blockwise Hadamard on the down_proj input
(R4) — each a small dense matmul XLA fuses into the surrounding step.
Expectation from the step-cost model: ~free at decode shapes (the transforms
are O(d·head_dim) / O(d·block) next to the O(d·N) projections).

Arms (same engine build recipe as bench.py, 1B W4 g128 + int8 KV; the stamp
changes the traced program, so each arm compiles its own decode scan):
  none / qk (R3) / down (R4) / qk+down

Cost is slope-timed decode tok/s (bench.py doctrine), arms interleaved at the
sample level is impossible across programs, so each arm reports its own
median+spread and the table reads as ratios to the 'none' arm.

Run alone on the chip:
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/tpu_bench_rotate_cost.py
"""

import dataclasses
import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from bench import _build, _decode_tput
    from onnx_quantize_tpu.models.gemma3 import GEMMA3_1B
    from onnx_quantize_tpu.prepasses.rotate import (
        clear_online_rotations,
        stamp_online_rotations,
    )

    cpu = jax.devices("cpu")[0]
    device = jax.devices()[0]
    cfg = dataclasses.replace(GEMMA3_1B, dtype="bfloat16")
    model, params = _build(cfg, quantized=True, cpu_device=cpu, head="int8")

    rows = []
    base = None
    for name, qk, down in [("none", False, False), ("qk", True, False),
                           ("down", False, True), ("qk+down", True, True)]:
        clear_online_rotations(model)
        if qk or down:
            # Cost-only stamp: weights are NOT folded, so logits are not
            # meaningful — the traced compute (and therefore the timing) is
            # identical to the folded deployment.
            stamp_online_rotations(model, qk=qk, down=down)
        med, lo, hi = _decode_tput(
            model, params, device, batch=32, prompt_len=128, steps=64,
            kv_quant="int8", max_seq=512,
        )
        if name == "none":
            base = med
        row = {"arm": name, "decode_tok_s": round(med, 1),
               "spread": [round(lo, 1), round(hi, 1)],
               "vs_none": round(med / base, 4)}
        rows.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"probe": "rotate_online_cost_1b", "rows": rows}))


if __name__ == "__main__":
    main()
