"""On-chip KV-quantization accuracy closure at 1B / S=2048.

CPU pins (tests/engine/test_kv_ppl.py) freeze decode-path perplexities per KV
mode on the small structured model. This confirms the same instrument on the
real chip at production scale: a 1B-config Gemma-3 (structured weights, bf16)
scored over S=2048 windows through ``InferenceEngine.score_nll`` — one token
prefilled, 2046 teacher-forced decode steps inside one ``lax.scan`` program,
every K/V row passing through the configured int8/int4 quantize→dequantize
chain before being attended.

Reported per KV mode: decode-path ppl, delta vs the fp-KV arm, and mean
next-token NLL. The fp arm doubles as the exactness anchor (it must agree
with the CPU semantics; reduction-order/bf16 deltas only).

Run alone on the chip:
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/tpu_check_kv_ppl.py
"""

import json
import os
import time

os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")

import jax
import numpy as np

S = int(os.environ.get("OQT_KVPPL_S", "2048"))
ROWS = int(os.environ.get("OQT_KVPPL_ROWS", "4"))


def main():
    from onnx_quantize_tpu.engine import InferenceEngine
    from onnx_quantize_tpu.models.gemma3 import GEMMA3_1B, Gemma3
    from onnx_quantize_tpu.models.structured import structured_params, zipf_tokens

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        model = Gemma3(GEMMA3_1B)
        params = structured_params(model)
        tokens = zipf_tokens(ROWS * S, model.cfg.vocab_size).reshape(ROWS, S)

    dev = jax.devices()[0]
    params = jax.tree.map(lambda a: jax.device_put(a, dev), params)

    rows, fp_ppl = [], None
    for kv in [False, "int8", "int4"]:
        eng = InferenceEngine(
            model, params, max_batch=ROWS, max_seq=S, kv_quant=kv,
            dtype=model.cfg.jnp_dtype,
        )
        t0 = time.time()
        nll, cnt = eng.score_nll(tokens)
        wall = time.time() - t0
        ppl = float(np.exp(nll.sum() / cnt.sum()))
        if kv is False:
            fp_ppl = ppl
        rows.append({
            "kv": str(kv), "S": S, "rows": ROWS,
            "ppl": round(ppl, 3),
            "delta_vs_fp": round(ppl - fp_ppl, 3),
            "mean_nll": round(float(nll.sum() / cnt.sum()), 5),
            "wall_s": round(wall, 1),
        })
        print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"probe": "tpu_kv_ppl_closure", "model": "1b", "rows": rows}))


if __name__ == "__main__":
    main()
