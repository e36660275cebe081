"""Decompose the 270M decode step cost on the chip.

Arms (all M=32 decode shapes, one layer / one op each, chained in-jit):
  lm_head: bf16 dense (336 MB), int8 W8 (168 MB), W4 g64 / g128 (84 MB)
  body:    bf16 dense vs W4 g128 at the fused gate_up shape (640 x 4096)
  attn:    XLA int8-KV dequant-attend at (B=32, S=512, Hq=4, Hkv=1, D=256)

Every arm's chain reads the full output via jnp.sum, so the harness overhead
is constant per output shape; the bf16 dense arm calibrates it (its stream
cost is known). Run alone on the chip:
  python scripts/tpu_probe_step_costs.py
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def bench(fn, x, *operands, iters_lo=150, iters_hi=600):
    # Operands (weights, caches) MUST be jit arguments, not closure captures:
    # captured arrays are embedded as HLO constants, and the tunneled remote
    # compile service rejects >~100 MB programs with HTTP 413.
    def timed(iters):
        @jax.jit
        def loop(x0, seed, *ops):
            def body(i, carry):
                # tanh-mixing is load-bearing: with a plain `x0 + carry*eps`
                # input chain XLA DISTRIBUTES the dot over the scalar add
                # (dot(x0+s, W) -> dot(x0, W) + s*colsum(W)) and hoists both
                # loop-invariant dots out of the while body — verified via
                # compiled-HLO cost analysis. A nonlinearity between the
                # carry and the operand cannot commute with the matmul.
                xi = jnp.tanh(x0 + carry).astype(x0.dtype)
                y = fn(xi, *ops)
                # abs() blocks the sibling rewrite sum(dot(x,W)) ->
                # (colsum x)@(rowsum W).
                return jnp.sum(jnp.abs(y)).astype(jnp.float32) * 1e-30 + carry

            return jax.lax.fori_loop(0, iters, body, seed)

        # float() on the warm result is load-bearing: on this tunneled
        # runtime block_until_ready RETURNS IMMEDIATELY while cold
        # compile+execution are still in flight (verified: cold block 3 ms,
        # cold value fetch 238 s) — only a value materialization truly
        # synchronizes. After one true sync, warm block_until_ready is
        # honest. Median of 3 with fresh seeds; see BENCH.md timing rules.
        float(loop(x, jnp.float32(0.0), *operands))
        times = []
        for rep in range(3):
            t = time.time()
            loop(x, jnp.float32((rep + 1) * 1e-6), *operands).block_until_ready()
            times.append(time.time() - t)
        return float(np.median(times))

    # Slope measurement: each warm call carries a ~32 ms fixed sync/transfer
    # overhead through the tunnel (measured by the harness-floor arm), so
    # per-iteration cost is the SLOPE between two trip counts, not T/iters.
    # The overhead JITTERS by several ms run-to-run, so the slope delta must
    # dwarf it: pilot-measure the per-iteration cost, then scale the trip
    # counts so (t_hi - t_lo) targets ~300 ms (small <10 us arms read 0.0 or
    # terabytes/s otherwise — two corrupted probe runs on 2026-08-17).
    t_lo, t_hi = timed(iters_lo), timed(iters_hi)
    est = max(t_hi - t_lo, 1e-9) / (iters_hi - iters_lo)
    want_hi = int(0.3 / est)
    if want_hi > 2 * iters_hi:
        iters_hi = min(want_hi, 200_000)
        iters_lo = iters_hi // 4
        t_lo, t_hi = timed(iters_lo), timed(iters_hi)
    return max(t_hi - t_lo, 1e-9) / (iters_hi - iters_lo)


def make_qt(w, dtype, group_size, cpu):
    from onnx_quantize_tpu.algorithms.rtn import rtn_quantize
    from onnx_quantize_tpu.core.dtypes import QuantType
    from onnx_quantize_tpu.core.enums import QuantizationStrategy
    from onnx_quantize_tpu.nn.qtensor import make_qtensor
    import jax.tree_util as jtu

    with jax.default_device(cpu):
        if dtype == "int8":
            q, s, zp = rtn_quantize(
                w, QuantType.QInt8, QuantizationStrategy.CHANNEL, None, True, False
            )
            qt = make_qtensor(
                q, s, zp, quant_type=QuantType.QInt8,
                strategy=QuantizationStrategy.CHANNEL, group_size=None,
                symmetric=True, reduce_range=False,
            )
        else:
            q, s, zp = rtn_quantize(
                w, QuantType.QUInt4, QuantizationStrategy.GROUP, group_size,
                False, False,
            )
            qt = make_qtensor(
                q, s, zp, quant_type=QuantType.QUInt4,
                strategy=QuantizationStrategy.GROUP, group_size=group_size,
                symmetric=False, reduce_range=False,
            )
    dev = jax.devices()[0]
    return jtu.tree_map(lambda a: jax.device_put(a, dev), qt)


def main():
    import sys

    from onnx_quantize_tpu.ops.dispatch import quantized_matmul_pallas

    cpu = jax.devices("cpu")[0]
    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    out = []

    def report(name, sec, mbytes):
        row = {"arm": name, "us": round(sec * 1e6, 1),
               "eff_gbps": round(mbytes * 1e6 / sec / 1e9, 1)}
        out.append(row)
        print(json.dumps(row), flush=True)

    M = 32

    if "--set" in sys.argv and sys.argv[sys.argv.index("--set") + 1] == "4b":
        # Gemma-3-4B decode shapes (hidden 2560, intermediate 10240, 34
        # layers, Hq=8/Hkv=4): the first 4B bench measured 26.9 ms/step
        # quantized where per-shape physics predicts ~7.5 ms — which ops
        # are off the expected rates at these (wider) shapes?
        shapes = {
            "qkv 2560x4096": (2560, 4096),
            "o_proj 2048x2560": (2048, 2560),
            "gate_up 2560x20480": (2560, 20480),
            "down 10240x2560": (10240, 2560),
            "lm_head_4b 2560x262144": (2560, 262144),
        }
        for name, (K, N) in shapes.items():
            w = (0.05 * rng.standard_normal((K, N))).astype(np.float32)
            x = jax.device_put(
                jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16), dev)
            wb = jax.device_put(jnp.asarray(w, jnp.bfloat16), dev)
            report(f"{name} bf16", bench(lambda a, wt: a @ wt, x, wb),
                   2 * K * N / 1e6)
            qt4 = make_qt(w, "uint4", 128, cpu)
            report(f"{name} W4 g128",
                   bench(lambda a, qt: quantized_matmul_pallas(a, qt, None), x, qt4),
                   K * N / 2 / 1e6)
            qt8 = make_qt(w, "int8", None, cpu)
            report(f"{name} W8 int8",
                   bench(lambda a, qt: quantized_matmul_pallas(a, qt, None), x, qt8),
                   K * N / 1e6)

        # GQA int8-KV attend at the 4B decode shape (Hkv=4 -> 4x the cache
        # bytes per layer of 270M/1B).
        B, S, Hq, Hkv, D = 32, 512, 8, 4, 256
        k8 = jax.device_put(jnp.asarray(
            rng.integers(-127, 127, size=(B, S, Hkv, D)), jnp.int8), dev)
        v8 = jax.device_put(jnp.asarray(
            rng.integers(-127, 127, size=(B, S, Hkv, D)), jnp.int8), dev)
        ks = jax.device_put(jnp.asarray(
            0.01 + 0.001 * rng.random((B, S, Hkv)), jnp.float32), dev)
        vs = jax.device_put(jnp.asarray(
            0.01 + 0.001 * rng.random((B, S, Hkv)), jnp.float32), dev)
        q = jax.device_put(jnp.asarray(
            rng.standard_normal((B, Hq, D)), jnp.bfloat16), dev)
        mask = jax.device_put(
            (jnp.arange(S)[None, :] < 192).astype(jnp.float32), dev)
        G = Hq // Hkv

        def attend_gqa(qv, k8_, v8_, ks_, vs_, mask_):
            # Scale-folded (no dequantized cache): scores = (q . k8) * ks.
            qg = qv.reshape(B, Hkv, G, D)
            logits = jnp.einsum(
                "bkgd,bskd->bkgs", qg.astype(jnp.float32), k8_.astype(jnp.float32)
            ) * ks_.transpose(0, 2, 1)[:, :, None, :]
            logits = jnp.where(mask_[:, None, None, :] > 0, logits, -1e30)
            p = jax.nn.softmax(logits, axis=-1)
            pv = p * vs_.transpose(0, 2, 1)[:, :, None, :]
            o = jnp.einsum("bkgs,bskd->bkgd", pv, v8_.astype(jnp.float32))
            return o

        report("attn int8-KV GQA (1 layer)",
               bench(attend_gqa, q, k8, v8, ks, vs, mask),
               2 * B * S * Hkv * D / 1e6)
        print(json.dumps({"probe": "step_costs_4b", "rows": out}))
        return

    if "--set" in sys.argv and sys.argv[sys.argv.index("--set") + 1] == "1b":
        # Gemma-3-1B decode body shapes (hidden 1152, intermediate 6912,
        # 26 layers): where does the quantized 1B step lose its byte
        # advantage? (bench.py 1b arm measured only 1.10x vs bf16.)
        shapes = {
            "qkv 1152x1536": (1152, 1536),
            "o_proj 1024x1152": (1024, 1152),
            "gate_up 1152x13824": (1152, 13824),
            "down 6912x1152": (6912, 1152),
            "lm_head_1b 1152x262144": (1152, 262144),
        }
        for name, (K, N) in shapes.items():
            w = (0.05 * rng.standard_normal((K, N))).astype(np.float32)
            x = jax.device_put(
                jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16), dev)
            wb = jax.device_put(jnp.asarray(w, jnp.bfloat16), dev)
            report(f"{name} bf16", bench(lambda a, wt: a @ wt, x, wb),
                   2 * K * N / 1e6)
            qt4 = make_qt(w, "uint4", 128, cpu)
            report(f"{name} W4 g128",
                   bench(lambda a, qt: quantized_matmul_pallas(a, qt, None), x, qt4),
                   K * N / 2 / 1e6)
            qt8 = make_qt(w, "int8", None, cpu)
            report(f"{name} W8 int8",
                   bench(lambda a, qt: quantized_matmul_pallas(a, qt, None), x, qt8),
                   K * N / 1e6)
        print(json.dumps({"probe": "step_costs_1b", "rows": out}))
        return
    # ---- lm_head family: K=640, N=262144 ----
    K, N = 640, 262144
    w = (0.05 * rng.standard_normal((K, N))).astype(np.float32)
    x = jax.device_put(
        jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16), dev)

    wb = jax.device_put(jnp.asarray(w, jnp.bfloat16), dev)
    report("lm_head bf16 dense", bench(lambda a, wt: a @ wt, x, wb),
           2 * K * N / 1e6)

    qt8 = make_qt(w, "int8", None, cpu)
    report("lm_head W8 int8 sym",
           bench(lambda a, qt: quantized_matmul_pallas(a, qt, None), x, qt8),
           K * N / 1e6)

    for gs in (64, 128):
        qt4 = make_qt(w, "uint4", gs, cpu)
        report(f"lm_head W4 g{gs}",
               bench(lambda a, qt: quantized_matmul_pallas(a, qt, None), x, qt4),
               K * N / 2 / 1e6)

    # ---- body: fused gate_up shape 640 x 4096 ----
    K2, N2 = 640, 4096
    w2 = (0.05 * rng.standard_normal((K2, N2))).astype(np.float32)
    x2 = jax.device_put(jnp.asarray(rng.standard_normal((M, K2)), jnp.bfloat16), dev)
    w2b = jax.device_put(jnp.asarray(w2, jnp.bfloat16), dev)
    report("gate_up bf16 dense", bench(lambda a, wt: a @ wt, x2, w2b),
           2 * K2 * N2 / 1e6)
    qt4b = make_qt(w2, "uint4", 128, cpu)
    report("gate_up W4 g128",
           bench(lambda a, qt: quantized_matmul_pallas(a, qt, None), x2, qt4b),
           K2 * N2 / 2 / 1e6)

    # ---- attention: XLA int8-KV dequant-attend, one layer ----
    B, S, Hq, Hkv, D = 32, 512, 4, 1, 256
    k8 = jax.device_put(jnp.asarray(
        rng.integers(-127, 127, size=(B, S, Hkv, D)), jnp.int8), dev)
    v8 = jax.device_put(jnp.asarray(
        rng.integers(-127, 127, size=(B, S, Hkv, D)), jnp.int8), dev)
    ks = jax.device_put(jnp.asarray(
        0.01 + 0.001 * rng.random((B, S, Hkv, 1)), jnp.float32), dev)
    vs = jax.device_put(jnp.asarray(
        0.01 + 0.001 * rng.random((B, S, Hkv, 1)), jnp.float32), dev)
    q = jax.device_put(jnp.asarray(
        rng.standard_normal((B, Hq, D)), jnp.bfloat16), dev)
    mask = jax.device_put(
        (jnp.arange(S)[None, :] < 192).astype(jnp.float32), dev)

    def attend(qv, k8_, v8_, ks_, vs_, mask_):
        kf = k8_.astype(jnp.float32) * ks_
        vf = v8_.astype(jnp.float32) * vs_
        # (B, Hq, D) x (B, S, D) -> (B, Hq, S); Hkv=1 broadcast
        logits = jnp.einsum("bhd,bsd->bhs", qv.astype(jnp.float32), kf[:, :, 0])
        logits = jnp.where(mask_[:, None, :] > 0, logits, -1e30)
        p = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("bhs,bsd->bhd", p, vf[:, :, 0])
        return o

    report("attn int8-KV XLA (1 layer)",
           bench(attend, q, k8, v8, ks, vs, mask),
           2 * B * S * D / 1e6)

    # harness floor: trivially small op, same chain structure
    report("harness floor (32x640 add)", bench(lambda a: a + 1.0, x), 0.001)

    print(json.dumps({"probe": "step_costs", "rows": out}))


if __name__ == "__main__":
    main()
