"""Numeric roofline gate (VERDICT r4 #6 / BASELINE.md gate 2).

For each flagship decode shape, measures the quantized kernel AND the
same-shape dense-bf16 control in the same session, and emits the gate
metric: ``pct_of_dense_control`` (achieved byte rate vs the platform's own
demonstrated dense rate). Gate: W4A8 g128 >= 85% of the dense control at the
three flagship decode shapes (percent-of-datasheet is also reported, but the
dense control is the honest per-shape ceiling on this runtime).

Run alone on the chip:
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/tpu_roofline_gate.py
"""

import json
import os

os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")

import numpy as np

SHAPES = [
    # (label, M, K, N, kernel)
    ("1b_lm_head_decode", 32, 1152, 262144, "w4"),
    ("1b_gate_up_decode", 32, 1152, 13824, "w4"),
    ("1b_gate_up_decode_w4a8", 32, 1152, 13824, "w4a8"),
    ("1b_qkv_decode", 32, 1152, 1152, "w4"),
    ("prefill_2k", 1024, 2048, 2048, "w4"),
]


def main():
    import jax
    import jax.tree_util as jtu

    from onnx_quantize_tpu.algorithms.rtn import rtn_quantize
    from onnx_quantize_tpu.core.dtypes import QuantType
    from onnx_quantize_tpu.core.enums import QuantizationStrategy
    from onnx_quantize_tpu.nn.qtensor import ActQuantSpec, make_qtensor
    from onnx_quantize_tpu.tools.benchmark import bench_quantized_matmul

    cpu = jax.devices("cpu")[0]
    dev = jax.devices()[0]
    rows = []
    gate_rows = []
    for label, M, K, N, kernel in SHAPES:
        with jax.default_device(cpu):
            rng = np.random.default_rng(0)
            w = (0.1 * rng.standard_normal((K, N))).astype(np.float32)
            q, s, zp = rtn_quantize(
                w, QuantType.QUInt4, QuantizationStrategy.GROUP, 128, False, False
            )
            extra = {}
            if kernel == "w4a8":
                extra["input_quant"] = ActQuantSpec(
                    mode="dynamic", dtype="int8", symmetric=True
                )
            qt = make_qtensor(
                q, s, zp, quant_type=QuantType.QUInt4,
                strategy=QuantizationStrategy.GROUP, group_size=128,
                symmetric=False, reduce_range=False, **extra,
            )
        # Gate rows measure the SHIPPED engine configuration: scale/zp baked
        # into the kernels' (G/2, 2, N) group-pair layout once at load
        # (engine.prepare_kernel_scales). Unbaked, the per-call
        # pad/convert/reshape prep runs in-program — ~8 extra fused kernels
        # per call that the tiny decode shapes cannot hide (round-2 HLO
        # diagnosis; the same reason the engine bakes at load).
        from onnx_quantize_tpu.engine import prepare_kernel_scales

        with jax.default_device(cpu):
            qt_baked = prepare_kernel_scales({"w": qt})["w"]
        qt = jtu.tree_map(lambda a: jax.device_put(a, dev), qt)
        qt_baked = jtu.tree_map(lambda a: jax.device_put(a, dev), qt_baked)
        row = bench_quantized_matmul(qt_baked, M, iters=50, with_control=True)
        raw = bench_quantized_matmul(qt, M, iters=50)
        row["label"] = label
        row["kernel"] = kernel
        row["unbaked_time_us"] = raw["time_us"]
        row["unbaked_hbm_gbps"] = raw["hbm_gbps"]
        rows.append(row)
        if "decode" in label:
            gate_rows.append(row)
        print(json.dumps(row), flush=True)

    gate_pass = all(r["pct_of_dense_control"] >= 85.0 for r in gate_rows)
    print(json.dumps({
        "probe": "roofline_gate_r5",
        "gate": "w4/w4a8 g128 >= 85% of same-shape dense control (decode shapes)",
        "gate_pass": bool(gate_pass),
        "decode_pcts": {r["label"]: r["pct_of_dense_control"] for r in gate_rows},
        "rows": rows,
    }))


if __name__ == "__main__":
    main()
