"""A/B the int4 vs int8 KV cache on the long-context decode path.

Question: int4 halves the cache bytes, but the attend must unpack nibbles —
does XLA fuse the unpack into the attention dots (like it fuses the int8
casts), or does it materialize an unpacked int8/bf16 cache per step and LOSE
on traffic (0.5 read + 1 write + 1 read per element vs int8's 1 read)?

Setup: the engine's scan'd decode (the headline path) at a long context —
prompt fills most of max_seq so every step's attend reads ~the whole cache.
Decode tok/s via the slope between two scan lengths (bench.py rules: fixed
~32 ms tunnel overhead cancels). At the 1B shape (L=26, Hkv=1, D=256,
S=2048, B=32) the int8 cache is ~0.87 GB -> ~1.1 ms/step of pure cache reads
at the 819 GB/s roofline, a large share of the ~2.2 ms step.

Run alone on the chip:
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/tpu_probe_kv4.py
"""

import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402

from bench import _build, _decode_tput  # noqa: E402

MODEL = os.environ.get("OQT_PROBE_MODEL", "1b")
MAX_SEQ = int(os.environ.get("OQT_PROBE_MAX_SEQ", 2048))
PROMPT = int(os.environ.get("OQT_PROBE_PROMPT", MAX_SEQ - 128))
BATCH = int(os.environ.get("OQT_PROBE_BATCH", 32))
STEPS = int(os.environ.get("OQT_PROBE_STEPS", 16))


def main():
    device = jax.devices()[0]
    assert device.platform != "cpu", "this probe needs the chip"
    cpu = jax.devices("cpu")[0]

    from onnx_quantize_tpu.models.gemma3 import GEMMA3_1B, GEMMA3_270M

    cfg = {"270m": GEMMA3_270M, "1b": GEMMA3_1B}[MODEL]
    model, params = _build(cfg, quantized=True, cpu_device=cpu)

    results = {}
    for kv in ("int8", "int4"):
        med, lo, hi = _decode_tput(
            model, params, device, batch=BATCH, prompt_len=PROMPT,
            steps=STEPS, kv_quant=kv, max_seq=MAX_SEQ, repeats=5,
        )
        results[kv] = med
        print(json.dumps({
            "probe": "kv4", "model": MODEL, "kv": kv, "batch": BATCH,
            "prompt": PROMPT, "max_seq": MAX_SEQ,
            "tok_s": round(med, 1), "lo": round(lo, 1), "hi": round(hi, 1),
        }), flush=True)

    print(json.dumps({
        "probe": "kv4", "model": MODEL,
        "int4_vs_int8": round(results["int4"] / results["int8"], 3),
    }), flush=True)


if __name__ == "__main__":
    main()
