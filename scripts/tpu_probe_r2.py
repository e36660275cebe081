"""Round-2 TPU probe: validate + time the new kernels on the chip.

One process, few programs (compiles are 1-5 min each on this runtime):
  1. flash_decode_int8 correctness vs jnp oracle at Gemma-3-270M decode shape.
  2. flash_decode_int8 timing vs the dequantize-then-attend XLA path.
  3. W4(g64) lm_head matmul timing vs the int8 W8 kernel (the decode
     bandwidth hog: 640 x 262144 at M=32).

Run: JAX_PLATFORMS="axon,cpu" python scripts/tpu_probe_r2.py
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
    from onnx_quantize_tpu.ops.kernels.flash_decode import (
        flash_decode_int8,
        flash_decode_int8_reference,
    )

    dev = jax.devices()[0]
    cpu = jax.devices("cpu")[0]
    print("device:", dev)

    # ── 1+2: flash decode at Gemma-3-270M shape: B=32, S=512, Hq=4, Hkv=1, D=256
    B, S, Hq, Hkv, D = 32, 512, 4, 1, 256
    rng = np.random.default_rng(0)
    with jax.default_device(cpu):
        q = jnp.asarray(rng.standard_normal((B, Hq, D)) * 0.3, jnp.float32)
        k_q = jnp.asarray(rng.integers(-127, 128, (B, S, Hkv, D)), jnp.int8)
        v_q = jnp.asarray(rng.integers(-127, 128, (B, S, Hkv, D)), jnp.int8)
        k_s = jnp.asarray(0.01 + 0.02 * rng.random((B, S, Hkv)), jnp.float32)
        v_s = jnp.asarray(0.01 + 0.02 * rng.random((B, S, Hkv)), jnp.float32)
        pos = jnp.asarray(rng.integers(100, 400, (B,)), jnp.int32)
        ref = np.asarray(flash_decode_int8_reference(q, k_q, k_s, v_q, v_s, pos, window=None))

    put = lambda a: jax.device_put(a, dev)
    q, k_q, v_q, k_s, v_s, pos = map(put, (q, k_q, v_q, k_s, v_s, pos))

    out = np.asarray(flash_decode_int8(q, k_q, k_s, v_q, v_s, pos, window=None))
    err = float(np.abs(out - ref).max())
    print(json.dumps({"check": "flash_decode_tpu_vs_oracle", "max_abs_err": err}))
    assert err < 2e-3, err

    sec_fd = bench(
        lambda qq: flash_decode_int8(qq, k_q, k_s, v_q, v_s, pos, window=None), q
    )

    def xla_path(qq):
        k = k_q.astype(jnp.float32) * k_s[..., None]
        v = v_q.astype(jnp.float32) * v_s[..., None]
        qg = qq.reshape(B, Hkv, Hq // Hkv, D)
        scores = jnp.einsum("bkgh,bskh->bkgs", qg, k)
        slots = jnp.arange(S, dtype=jnp.int32)
        mask = slots[None, :] <= pos[:, None]
        scores = jnp.where(mask[:, None, None, :], scores, -1e30)
        p = jax.nn.softmax(scores, axis=-1)
        return jnp.einsum("bkgs,bskh->bkgh", p, v).reshape(B, Hq, D)

    sec_xla = bench(xla_path, q)
    kv_bytes = 2 * B * S * Hkv * D  # int8 K+V
    print(json.dumps({
        "bench": "decode_attention_B32_S512",
        "fused_us": round(sec_fd * 1e6, 1),
        "xla_dequant_us": round(sec_xla * 1e6, 1),
        "fused_gbps_kv": round(kv_bytes / sec_fd / 1e9, 1),
        "speedup": round(sec_xla / sec_fd, 2),
    }))

    # ── 3: lm_head shapes: W4 g64 vs W8 int8-channel at M=32 (decode B=32)
    from onnx_quantize_tpu.algorithms.rtn import rtn_quantize
    from onnx_quantize_tpu.core.dtypes import QuantType
    from onnx_quantize_tpu.core.enums import QuantizationStrategy
    from onnx_quantize_tpu.nn.qtensor import make_qtensor
    from onnx_quantize_tpu.ops.dispatch import quantized_matmul_pallas
    from onnx_quantize_tpu.ops.reference import quantized_matmul_jnp

    K, N, M = 640, 262144, 32
    with jax.default_device(cpu):
        w = (0.05 * rng.standard_normal((K, N))).astype(np.float32)
        x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)

        q4, s4, z4 = rtn_quantize(w, QuantType.QUInt4, QuantizationStrategy.GROUP, 64, False, False)
        qt4 = make_qtensor(q4, s4, z4, quant_type=QuantType.QUInt4,
                           strategy=QuantizationStrategy.GROUP, group_size=64,
                           symmetric=False, reduce_range=False)
        q8, s8, z8 = rtn_quantize(w, QuantType.QInt8, QuantizationStrategy.CHANNEL, -1, True, False)
        qt8 = make_qtensor(q8, s8, z8, quant_type=QuantType.QInt8,
                           strategy=QuantizationStrategy.CHANNEL, group_size=-1,
                           symmetric=True, reduce_range=False)
        # jnp oracle for the TPU correctness check below (CPU, f32)
        y_ref = np.asarray(quantized_matmul_jnp(np.asarray(x, np.float32)[:2], qt4))

    import jax.tree_util as jtu
    qt4 = jtu.tree_map(put, qt4)
    qt8 = jtu.tree_map(put, qt8)
    x = put(x)

    y4 = np.asarray(quantized_matmul_pallas(x, qt4, None))
    err = float(np.abs(y4[:2] - y_ref).max() / (np.abs(y_ref).max() + 1e-9))
    print(json.dumps({"check": "w4_lmhead_tpu_rel_err", "rel_err": err}))

    sec4 = bench(lambda a: quantized_matmul_pallas(a, qt4, None), x)
    sec8 = bench(lambda a: quantized_matmul_pallas(a, qt8, None), x)
    b4 = int(np.asarray(qt4.data).nbytes + np.asarray(qt4.scale).nbytes * 2)
    b8 = int(np.asarray(qt8.data).nbytes)
    print(json.dumps({
        "bench": "lm_head_640x262144_M32",
        "w4g64_us": round(sec4 * 1e6, 1), "w4_gbps": round(b4 / sec4 / 1e9, 1),
        "w8chan_us": round(sec8 * 1e6, 1), "w8_gbps": round(b8 / sec8 / 1e9, 1),
        "w4_vs_w8_speedup": round(sec8 / sec4, 2),
    }))


if __name__ == "__main__":
    main()
