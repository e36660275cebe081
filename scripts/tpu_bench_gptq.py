"""GPTQ quantize-time on the chip (SURVEY §7 hard part #2).

Round 1 measured the single-XLA-program `lax.fori_loop` block sweep at 1.1 s
warm for a 2048x2048 g128 weight on 4 CPU cores; this times the same program
with the sweep dispatched to the TPU. The sweep is inherently sequential in
the column-block dimension, so this measures how well the formulation hides
that (few big programs, error propagation as matmuls).

Run alone on the chip:
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/tpu_bench_gptq.py
"""

import json
import os
import time

os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")

import numpy as np

from onnx_quantize_tpu.algorithms.gptq import gptq_quantize
from onnx_quantize_tpu.core.dtypes import QuantType
from onnx_quantize_tpu.core.enums import QuantizationStrategy


def main():
    rng = np.random.default_rng(0)
    rows = []
    for K, N, gs in ((2048, 2048, 128), (1152, 6912, 128)):
        W = (0.05 * rng.standard_normal((K, N))).astype(np.float32)
        X = rng.standard_normal((256, K)).astype(np.float32)

        t0 = time.time()
        q, s, zp = gptq_quantize(
            W, X, QuantType.QUInt4, QuantizationStrategy.GROUP, gs,
        )
        cold = time.time() - t0

        warm = []
        for _ in range(3):
            t0 = time.time()
            gptq_quantize(W, X, QuantType.QUInt4, QuantizationStrategy.GROUP, gs)
            warm.append(time.time() - t0)
        rows.append({
            "shape": f"{K}x{N} g{gs}",
            "cold_s": round(cold, 2),
            "warm_s": round(float(np.median(warm)), 2),
        })
        print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"probe": "gptq_quantize_time", "rows": rows}))


if __name__ == "__main__":
    main()
