"""Headline benchmark: Gemma-3-270M W4(g128) decode throughput per chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The measurement is the serving configuration from BASELINE.json config 4/5:
Gemma-3-270M, weights INT4 group-128 (RTN; fused Pallas dequant-matmul
kernels), int8 KV cache, batched greedy decode through the engine.
``vs_baseline`` is the speedup over the same engine running fp32 weights —
the reference publishes no throughput numbers (BASELINE.md), so fp32-on-TPU is
the baseline the quantized path must beat.

Runs on whatever accelerator jax exposes (the driver runs it on one TPU v5e
chip); falls back to a tiny config on CPU so the script always emits a line.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")

import numpy as np


def _build(model_cfg, quantized: bool, cpu_device, head: str = "int8"):
    import jax

    import onnx_quantize_tpu as oqt
    from onnx_quantize_tpu.models.gemma3 import Gemma3

    from onnx_quantize_tpu.models.gemma3 import fuse_gemma3_projections

    model = Gemma3(model_cfg)
    moe = model_cfg.num_experts > 0
    with jax.default_device(cpu_device):
        params = model.init(jax.random.key(0))
        if quantized:
            # Transformer projections: W4 group-128. The lm_head (the decode
            # bandwidth hog at 262k vocab) is quantized in a second pass —
            # per-site config mixing via ignore patterns. int8 per-channel
            # wins at shallow K (640/1152: the W4 unpack is bandwidth-wasted
            # at fat N); W4 g64 wins at 4B's K=2560 where the unpack
            # amortizes (BENCH.md round 2 cont., +2.5% end-to-end).
            qconfig = oqt.QConfig(
                weights=oqt.QWeightArgs(dtype="uint4", group_size=128),
                ignore=["lm_head"] + ([r"\.router$"] if moe else []),
            )
            params, _ = oqt.quantize(model, params, qconfig)
            if head == "w4":
                head_cfg = oqt.QConfig(
                    weights=oqt.QWeightArgs(dtype="uint4", group_size=64),
                    ignore=[r"^layers\."],
                )
            else:
                head_cfg = oqt.QConfig(
                    weights=oqt.QWeightArgs(dtype="int8", group_size=-1,
                                            symmetric=True),
                    ignore=[r"^layers\."],
                )
            params, _ = oqt.quantize(model, params, head_cfg)
        # Horizontal q/k/v + gate/up fusion halves the per-step launch count
        # (applied to baseline and quantized alike).
        params = fuse_gemma3_projections(params)
        if moe:
            # Engine layout: concatenated experts — ONE fat-N gate_up + ONE
            # deep-K down per layer (combine folded into the accumulator),
            # the W4 kernel's best regimes (scripts/tpu_probe_moe.py).
            from onnx_quantize_tpu.engine import prepare_kernel_scales
            from onnx_quantize_tpu.models.moe import fuse_moe_experts

            params = fuse_moe_experts(prepare_kernel_scales(params))
    return model, params


def _decode_tput(model, params, device, batch=8, prompt_len=128, steps=64,
                 kv_quant=True, max_seq=512, repeats=5):
    """Decode tokens/s via the SLOPE between two scan lengths.

    Every warm device call on the tunneled runtime carries a ~32 ms fixed
    sync/transfer overhead (BENCH.md timing rules), which would deflate both
    arms and pull the quantized/baseline ratio toward 1. Timing the scan'd
    decode at ``steps`` and ``4*steps`` and dividing the extra tokens by the
    extra time cancels the fixed overhead exactly.
    """
    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu

    from onnx_quantize_tpu.engine import InferenceEngine

    params = jtu.tree_map(lambda a: jax.device_put(a, device), params)
    # OQT_BENCH_FUSED_ATTN=1 opts into the Pallas flash-decode kernel; the
    # default keeps the XLA dequant-attend path, which wins at this model
    # scale on this runtime (see BENCH.md round-2 notes).
    fused = "auto" if os.environ.get("OQT_BENCH_FUSED_ATTN") else False
    mega = "auto" if os.environ.get("OQT_BENCH_MEGAKERNEL") else False
    engine = InferenceEngine(
        model, params, max_batch=batch, max_seq=max_seq, kv_quant=kv_quant,
        dtype=model.cfg.jnp_dtype if model.cfg.dtype != "float32" else jnp.float32,
        fused_attention=fused if kv_quant else False,
        mlp_megakernel=mega,
    )
    rng = np.random.default_rng(0)
    ids = rng.integers(1, model.cfg.vocab_size, size=(batch, prompt_len)).astype(np.int32)
    lengths = np.full((batch,), prompt_len, np.int32)

    cache = engine.new_cache()
    cache, logits = engine.prefill(cache, ids, lengths)
    tokens = np.asarray(np.argmax(logits, axis=-1), np.int32)

    steps_lo, steps_hi = steps, 4 * steps

    # Warm BOTH scan programs; np.asarray is the true sync (block_until_ready
    # returns early on cold calls on this runtime — BENCH.md timing rules).
    cache, generated = engine.decode_multi(cache, tokens, steps=steps_lo)
    tokens = np.asarray(generated)[:, -1]
    cache, generated = engine.decode_multi(cache, tokens, steps=steps_hi)
    tokens = np.asarray(generated)[:, -1]

    # Median of N timed repeats per scan length: run-to-run variance on this
    # runtime is ±10-15%, so a single sample can't distinguish a 1.2x from a
    # 1.02x. Repeats reuse the warmed programs and cache slots (KV writes
    # past max_seq drop, identically for both arms).
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

    t_lo = timed(steps_lo)
    t_hi = timed(steps_hi)
    extra = batch * (steps_hi - steps_lo)
    pairs = [extra / (hi - lo) for lo, hi in zip(sorted(t_lo), sorted(t_hi))]
    return (
        float(np.median(pairs)),
        float(np.min(pairs)),
        float(np.max(pairs)),
    )


def main():
    import jax

    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = jax.devices()[0]
    device = jax.devices()[0]
    on_accel = device.platform != "cpu"

    from onnx_quantize_tpu.models.gemma3 import (
        GEMMA3_1B,
        GEMMA3_270M,
        Gemma3Config,
    )

    import dataclasses

    # OQT_BENCH_MODEL=1b/4b benches the larger family members (weight bytes
    # dominate the step there, so quantization separates much harder from
    # bf16 — see BENCH.md); the driver default stays the 270M flagship.
    model_name = os.environ.get("OQT_BENCH_MODEL", "270m").lower()

    if on_accel:
        from onnx_quantize_tpu.models.gemma3 import GEMMA3_4B

        if model_name == "moe":
            # Mixtral-convention 8x top-2 MoE (~1.2B params, ~0.36B active):
            # per decode step ALL resident expert weights stream from HBM
            # regardless of routing, so weight bytes dominate the step even
            # harder than dense — the regime where quantization pays most.
            from onnx_quantize_tpu.models.moe import moe_config

            base = moe_config(
                num_experts=8, num_experts_per_tok=2,
                moe_intermediate_size=2816, shared_expert_size=0,
                norm_topk_prob=True, vocab_size=32_768, hidden_size=1024,
                intermediate_size=2816, num_layers=16, num_heads=8,
                num_kv_heads=2, head_dim=128, rope_theta=1_000_000.0,
            )
        else:
            base = {"1b": GEMMA3_1B, "4b": GEMMA3_4B}.get(model_name, GEMMA3_270M)
        cfg = dataclasses.replace(base, dtype="bfloat16")
        # B=32: decode on this runtime is per-step-cost bound, so throughput
        # scales with batch until memory pressure (see BENCH.md).
        # OQT_BENCH_BATCH overrides for batch-scaling experiments.
        batch, prompt_len, steps, max_seq = 32, 128, 64, 512
        batch = int(os.environ.get("OQT_BENCH_BATCH", batch))
    else:
        cfg = Gemma3Config.tiny(
            hidden_size=128, intermediate_size=256, num_layers=2, num_heads=2,
            num_kv_heads=2, head_dim=64, vocab_size=512,
        )
        batch, prompt_len, steps, max_seq = 2, 16, 8, 64

    head = "w4" if model_name == "4b" else "int8"
    # OQT_BENCH_KV=int4 runs the quantized arm on the packed int4 KV cache
    # (kv_cache.py); default int8. OQT_BENCH_SEQ stretches the context
    # (prompt fills all but `steps` of it) for KV-bound regimes.
    kv_mode = os.environ.get("OQT_BENCH_KV", "int8")
    if "OQT_BENCH_SEQ" in os.environ:
        max_seq = int(os.environ["OQT_BENCH_SEQ"])
        prompt_len = max_seq - 4 * steps
    model_q, params_q = _build(cfg, quantized=True, cpu_device=cpu, head=head)
    tput_q, lo_q, hi_q = _decode_tput(
        model_q, params_q, device, batch=batch, prompt_len=prompt_len,
        steps=steps, max_seq=max_seq, kv_quant=kv_mode,
    )

    model_f, params_f = _build(cfg, quantized=False, cpu_device=cpu)
    tput_f, lo_f, hi_f = _decode_tput(
        model_f, params_f, device, batch=batch, prompt_len=prompt_len,
        steps=steps, kv_quant=False, max_seq=max_seq,
    )

    # One JSON line; medians for both arms plus per-arm spread so the ratio
    # is reproducible, not a point estimate (VERDICT r1 #10).
    print(
        json.dumps(
            {
                "metric": (
                    "moe_8x2816_top2_w4g128_decode_tokens_per_sec_per_chip"
                    if model_name == "moe"
                    else f"gemma3_{model_name}_w4g128_decode_tokens_per_sec_per_chip"
                ),
                "value": round(tput_q, 1),
                "unit": "tokens/s",
                "vs_baseline": round(tput_q / tput_f, 3),
                "baseline_bf16_tokens_per_sec": round(tput_f, 1),
                "quantized_spread": [round(lo_q, 1), round(hi_q, 1)],
                "baseline_spread": [round(lo_f, 1), round(hi_f, 1)],
            }
        )
    )


if __name__ == "__main__":
    main()
