"""On-chip accuracy closure: structured-model perplexity through the TPU path.

The accuracy pins (tests/integration/test_structured_ppl.py) freeze absolute
perplexities computed on CPU through the jnp oracle. This runs the SAME
model/tokens through the TPU execution path — Pallas kernels where eligible,
the M-routed dense-dequant path at window-scale M — and compares against the
frozen pins, closing the loop between the perf claims (measured on TPU) and
the accuracy claims (pinned on CPU).

Expected deltas are small but nonzero: TPU f32 matmuls run as bf16 passes by
default, and reduction orders differ.

Run alone on the chip:
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/tpu_check_ppl.py
"""

import json
import os

os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")

import jax

import onnx_quantize_tpu as oqt
from onnx_quantize_tpu.models.structured import STRUCTURED_GEMMA3, zipf_tokens
from onnx_quantize_tpu.tools.perplexity import perplexity_from_tokens

# Frozen CPU pins (tests/integration/test_structured_ppl.py).
PINS = {
    "fp32": 1272.083,
    "rtn_int8_channel": 1262.499,
    "rtn_uint4_g128": 1353.948,
}


def main():
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        model, params = STRUCTURED_GEMMA3()
        tokens = zipf_tokens(3072, 2048)
        q8, _ = oqt.quantize(model, params, oqt.QConfig(
            weights=oqt.QWeightArgs(dtype="int8", group_size=-1),
            ignore=["lm_head"],
        ))
        q4, _ = oqt.quantize(model, params, oqt.QConfig(
            weights=oqt.QWeightArgs(dtype="uint4", group_size=128),
            ignore=["lm_head"],
        ))

    dev = jax.devices()[0]
    rows = []
    for name, p in (("fp32", params), ("rtn_int8_channel", q8),
                    ("rtn_uint4_g128", q4)):
        p_dev = jax.tree.map(lambda a: jax.device_put(a, dev), p)
        ppl = perplexity_from_tokens(model, p_dev, tokens,
                                     max_length=1024, stride=512)
        rows.append({
            "config": name,
            "tpu_ppl": round(float(ppl), 3),
            "cpu_pin": PINS[name],
            "delta": round(float(ppl) - PINS[name], 3),
        })
        print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"probe": "tpu_ppl_closure", "rows": rows}))


if __name__ == "__main__":
    main()
