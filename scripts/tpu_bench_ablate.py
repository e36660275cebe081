"""Engine-level decode ablations: attribute the step cost to components.

Each arm is the real engine decode loop (bench.py machinery) with ONE knob
changed from the headline config. Differences between arms attribute the
step cost causally — unlike standalone op probes, which fuse differently
from the scan'd engine program (BENCH.md round-2 caveat).

Arms:
  headline            W4 g128 body + int8 lm_head + int8 KV, S_max=512
  smax=256 / 1024     KV-read cost slope (cache reads scale with S_max)
  kv=bf16             int8-KV saving (quantized arm with unquantized cache)
  lmhead=w4 / fp      lm_head kernel choice (W4 g64 vs int8 vs bf16)

Run alone on the chip: python scripts/tpu_bench_ablate.py [arm ...]
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(lmhead="int8", body="w4", model_name="270m"):
    import dataclasses

    import jax

    import onnx_quantize_tpu as oqt
    from onnx_quantize_tpu.models.gemma3 import (
        GEMMA3_1B,
        GEMMA3_4B,
        GEMMA3_270M,
        Gemma3,
        fuse_gemma3_projections,
    )

    cpu = jax.devices("cpu")[0]
    base = {"1b": GEMMA3_1B, "4b": GEMMA3_4B}.get(model_name, GEMMA3_270M)
    cfg = dataclasses.replace(base, dtype="bfloat16")
    model = Gemma3(cfg)
    with jax.default_device(cpu):
        params = model.init(jax.random.key(0))
        if body == "fp":
            pass  # bf16 body (baseline arm)
        elif body == "w8":
            qconfig = oqt.QConfig(
                weights=oqt.QWeightArgs(dtype="int8", group_size=-1, symmetric=True),
                ignore=["lm_head"],
            )
        elif body == "q8":
            # Full-int8 QLinear execution (the reference's QLinearMatMul mode,
            # SURVEY §2B): s8 x s8 MXU dots with static requant epilogues.
            # Calibrated on random token ids (same distribution the decode
            # bench feeds, so the static ranges match the benched stream).
            calib = np.random.default_rng(7).integers(
                1, cfg.vocab_size, size=(8, 128)
            ).astype(np.int32)
            qconfig = oqt.QConfig(
                weights=oqt.QWeightArgs(dtype="int8", group_size=-1, symmetric=True),
                input_activations=oqt.QActivationArgs(dtype="uint8", is_static=True),
                output_activations=oqt.QActivationArgs(dtype="uint8", is_static=True),
                format="qlinear",
                calibration_data=calib,
                ignore=["lm_head"],
            )
        else:
            qconfig = oqt.QConfig(
                weights=oqt.QWeightArgs(dtype="uint4", group_size=128),
                ignore=["lm_head"],
            )
        if body != "fp":
            params, _ = oqt.quantize(model, params, qconfig)
        if body == "w4a8":
            from onnx_quantize_tpu import ops as oqt_ops

            params = oqt_ops.convert_to_w4a8(params)
        if lmhead == "int8":
            head = oqt.QConfig(
                weights=oqt.QWeightArgs(dtype="int8", group_size=-1, symmetric=True),
                ignore=[r"^layers\."],
            )
            params, _ = oqt.quantize(model, params, head)
        elif lmhead == "w4":
            head = oqt.QConfig(
                weights=oqt.QWeightArgs(dtype="uint4", group_size=64),
                ignore=[r"^layers\."],
            )
            params, _ = oqt.quantize(model, params, head)
        # lmhead == "fp": leave bf16
        params = fuse_gemma3_projections(params)
    return model, params


def tput(model, params, *, kv_quant=True, max_seq=512, batch=32,
         prompt_len=128, steps=64, repeats=5, fused=False):
    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu

    from onnx_quantize_tpu.engine import InferenceEngine

    device = jax.devices()[0]
    params = jtu.tree_map(lambda a: jax.device_put(a, device), params)
    engine = InferenceEngine(
        model, params, max_batch=batch, max_seq=max_seq, kv_quant=kv_quant,
        dtype=jnp.bfloat16, fused_attention=fused,
    )
    rng = np.random.default_rng(0)
    ids = rng.integers(1, model.cfg.vocab_size, size=(batch, prompt_len)).astype(np.int32)
    lengths = np.full((batch,), prompt_len, np.int32)
    cache, logits = engine.prefill(engine.new_cache(), ids, lengths)
    tokens = np.asarray(np.argmax(logits, -1), np.int32)

    # Slope timing (BENCH.md timing rules): warm both scan lengths with a
    # true value sync, then tokens/s = extra tokens / extra time so the
    # ~32 ms/call tunnel overhead cancels.
    steps_lo, steps_hi = steps, 4 * steps
    cache, generated = engine.decode_multi(cache, tokens, steps=steps_lo)
    tokens = np.asarray(generated)[:, -1]
    cache, generated = engine.decode_multi(cache, tokens, steps=steps_hi)
    tokens = np.asarray(generated)[:, -1]

    def timed(n_steps):
        nonlocal cache, tokens
        samples = []
        for _ in range(repeats):
            t0 = time.time()
            cache, generated = engine.decode_multi(cache, tokens, steps=n_steps)
            jax.block_until_ready(generated)
            samples.append(time.time() - t0)
        tokens = np.asarray(generated)[:, -1]
        return samples

    t_lo, t_hi = timed(steps_lo), timed(steps_hi)
    extra = batch * (steps_hi - steps_lo)
    pairs = [extra / (hi - lo) for lo, hi in zip(sorted(t_lo), sorted(t_hi))]
    return float(np.median(pairs)), float(np.min(pairs)), float(np.max(pairs))


ARMS = {
    "headline": dict(),
    "baseline": dict(body="fp", lmhead="fp", kv_quant=False),
    "smax256": dict(max_seq=256),
    "smax1024": dict(max_seq=1024),
    "kvbf16": dict(kv_quant=False),
    "fused": dict(fused=True),
    "lmhead_w4": dict(lmhead="w4"),
    "lmhead_fp": dict(lmhead="fp"),
    "body_w8": dict(body="w8"),
    "body_w4a8": dict(body="w4a8"),
    "body_q8": dict(body="q8"),
    "body_w8_fused": dict(body="w8", fused=True),
}


def main():
    args = sys.argv[1:]
    model_name = "270m"
    if "--model" in args:
        i = args.index("--model")
        model_name = args[i + 1].lower()
        del args[i : i + 2]
    want = args or list(ARMS)
    built = {}
    for name in want:
        knobs = dict(ARMS[name])
        lmhead = knobs.pop("lmhead", "int8")
        body = knobs.pop("body", "w4")
        key = (lmhead, body)
        if key not in built:
            built[key] = build(lmhead, body, model_name)
        model, params = built[key]
        med, lo, hi = tput(model, params, **knobs)
        us_per_step = 32 * 64 / med * 1e6 / 64
        print(json.dumps({
            "arm": name, "model": model_name, "tok_s": round(med, 1),
            "spread": [round(lo, 1), round(hi, 1)],
            "us_per_step": round(us_per_step, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
