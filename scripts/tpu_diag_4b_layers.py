"""Isolate the 4B engine's per-layer vs fixed per-step decode cost.

The 4B bench measured 26.9 ms/step quantized while per-op probes
(tpu_probe_step_costs.py --set 4b) predict ~5.3 ms — and the bf16 baseline
carries the same ~4x inflation, so the slack is engine-structural, not a
kernel regression. This probe runs the REAL engine decode loop on 4B-width
configs truncated to L layers (L = 2, 8, 17): per-layer in-engine cost is the
slope over L, and the intercept is the fixed per-step cost (embed, lm_head,
argmax, scan plumbing). Comparing both against the isolated-op numbers
pinpoints where the inflation lives.

Run alone on the chip:
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/tpu_diag_4b_layers.py
"""

import dataclasses
import json
import os
import time

os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")

import numpy as np


def run(num_layers: int, quantized: bool = True):
    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu

    import onnx_quantize_tpu as oqt
    from onnx_quantize_tpu.engine import InferenceEngine
    from onnx_quantize_tpu.models.gemma3 import (
        GEMMA3_4B,
        Gemma3,
        fuse_gemma3_projections,
    )

    cpu = jax.devices("cpu")[0]
    dev = jax.devices()[0]
    cfg = dataclasses.replace(GEMMA3_4B, dtype="bfloat16", num_layers=num_layers)
    model = Gemma3(cfg)
    with jax.default_device(cpu):
        params = model.init(jax.random.key(0))
        if quantized:
            params, _ = oqt.quantize(model, params, oqt.QConfig(
                weights=oqt.QWeightArgs(dtype="uint4", group_size=128),
                ignore=["lm_head"],
            ))
            params, _ = oqt.quantize(model, params, oqt.QConfig(
                weights=oqt.QWeightArgs(dtype="int8", group_size=-1, symmetric=True),
                ignore=[r"^layers\."],
            ))
        params = fuse_gemma3_projections(params)
    params = jtu.tree_map(lambda a: jax.device_put(a, dev), params)

    batch, prompt_len, steps = 32, 128, 64
    engine = InferenceEngine(
        model, params, max_batch=batch, max_seq=512,
        kv_quant=quantized, dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    ids = rng.integers(1, cfg.vocab_size, size=(batch, prompt_len)).astype(np.int32)
    lengths = np.full((batch,), prompt_len, np.int32)
    cache, logits = engine.prefill(engine.new_cache(), ids, lengths)
    tokens = np.asarray(np.argmax(logits, -1), np.int32)

    lo, hi = steps, 4 * steps
    cache, g = engine.decode_multi(cache, tokens, steps=lo)
    tokens = np.asarray(g)[:, -1]
    cache, g = engine.decode_multi(cache, tokens, steps=hi)
    tokens = np.asarray(g)[:, -1]

    def timed(n):
        nonlocal cache, tokens
        ts = []
        for _ in range(3):
            t0 = time.time()
            cache, g = engine.decode_multi(cache, tokens, steps=n)
            jax.block_until_ready(g)
            ts.append(time.time() - t0)
        tokens = np.asarray(g)[:, -1]
        return ts

    t_lo, t_hi = timed(lo), timed(hi)
    pairs = [(h - l) / (hi - lo) for l, h in zip(sorted(t_lo), sorted(t_hi))]
    us = float(np.median(pairs)) * 1e6
    return us


def main():
    rows = []
    for L in (2, 8, 17):
        us = run(L, quantized=True)
        rows.append({"layers": L, "us_per_step": round(us, 1)})
        print(json.dumps(rows[-1]), flush=True)
    # Least-squares slope/intercept over the three points.
    Ls = np.array([r["layers"] for r in rows], np.float64)
    ys = np.array([r["us_per_step"] for r in rows], np.float64)
    slope, intercept = np.polyfit(Ls, ys, 1)
    print(json.dumps({
        "probe": "diag_4b_layers",
        "per_layer_us": round(float(slope), 1),
        "fixed_us": round(float(intercept), 1),
        "rows": rows,
    }))


if __name__ == "__main__":
    main()
