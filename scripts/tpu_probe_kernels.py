"""Probe the retuned W4/W8 kernels at the decode-binding shapes.

Measures the shapes that dominate the 270M decode step (BENCH.md round-2):
the 262k lm_head (grid-instance-overhead-bound before the pairs-per-block /
full-N retune) and the body projections. Run alone on the chip:
  JAX_PLATFORMS="axon,cpu" python scripts/tpu_probe_kernels.py
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def bench(fn, x, iters=30):
    @jax.jit
    def loop(x0):
        def body(i, carry):
            y = fn(x0 + carry * 1e-30)
            return jnp.sum(y) * 0.0 + carry

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    loop(x).block_until_ready()
    t = time.time()
    loop(x).block_until_ready()
    return (time.time() - t) / iters


def main():
    from onnx_quantize_tpu.algorithms.rtn import rtn_quantize
    from onnx_quantize_tpu.core.dtypes import QuantType
    from onnx_quantize_tpu.core.enums import QuantizationStrategy
    from onnx_quantize_tpu.nn.qtensor import make_qtensor
    from onnx_quantize_tpu.ops.dispatch import quantized_matmul_pallas

    dev = jax.devices()[0]
    cpu = jax.devices("cpu")[0]
    print("device:", dev, flush=True)
    rng = np.random.default_rng(0)
    put = lambda a: jax.device_put(a, dev)
    import jax.tree_util as jtu

    def mk(K, N, qt_kind, gs):
        with jax.default_device(cpu):
            w = (0.05 * rng.standard_normal((K, N))).astype(np.float32)
            if qt_kind == "w4":
                q, s, z = rtn_quantize(w, QuantType.QUInt4, QuantizationStrategy.GROUP,
                                       gs, False, False)
                t = make_qtensor(q, s, z, quant_type=QuantType.QUInt4,
                                 strategy=QuantizationStrategy.GROUP, group_size=gs,
                                 symmetric=False, reduce_range=False)
            else:
                q, s, z = rtn_quantize(w, QuantType.QInt8, QuantizationStrategy.CHANNEL,
                                       -1, True, False)
                t = make_qtensor(q, s, z, quant_type=QuantType.QInt8,
                                 strategy=QuantizationStrategy.CHANNEL, group_size=-1,
                                 symmetric=True, reduce_range=False)
        return jtu.tree_map(put, t)

    M = 32
    shapes = [
        ("lm_head_w4_g64", 640, 262144, "w4", 64),
        ("lm_head_w8_sym", 640, 262144, "w8", -1),
        ("oproj_w4_g128", 1024, 640, "w4", 128),
        ("down_w4_g128", 2048, 640, "w4", 128),
        ("gateup_w4_g128", 640, 4096, "w4", 128),
    ]
    for name, K, N, kind, gs in shapes:
        qt = mk(K, N, kind, gs)
        with jax.default_device(cpu):
            x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
        x = put(x)
        sec = bench(lambda a, qt=qt: quantized_matmul_pallas(a, qt, None), x)
        wbytes = int(np.asarray(qt.data).nbytes)
        print(json.dumps({
            "bench": name, "us": round(sec * 1e6, 1),
            "w_gbps": round(wbytes / sec / 1e9, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
