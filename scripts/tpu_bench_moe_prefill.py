"""MoE prefill: sorted ragged_dot grouped matmul vs dense-masked execution.

The dense-masked scheme computes every expert over every token (right at
decode, where bytes dominate); at prefill M the MLP pays E/top_k x the routed
FLOPs. The ragged path sorts (token, choice) pairs by expert and runs ONE
grouped matmul per projection — compute proportional to routed tokens.

Measures the bench.py MoE config's prefill (B=8, T=512) both ways plus the
bf16 baseline, slope-timed (two prompt lengths cancel the fixed per-call
overhead). Run on an idle machine; TPU only.

Usage: python scripts/tpu_bench_moe_prefill.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build(quantized: bool):
    import jax

    import onnx_quantize_tpu as oqt
    from onnx_quantize_tpu.engine import prepare_kernel_scales
    from onnx_quantize_tpu.models.gemma3 import Gemma3, fuse_gemma3_projections
    from onnx_quantize_tpu.models.moe import fuse_moe_experts, moe_config

    cfg = moe_config(
        num_experts=8, num_experts_per_tok=2, moe_intermediate_size=2816,
        shared_expert_size=0, norm_topk_prob=True, vocab_size=32_768,
        hidden_size=1024, intermediate_size=2816, num_layers=16, num_heads=8,
        num_kv_heads=2, head_dim=128, rope_theta=1_000_000.0, dtype="bfloat16",
    )
    model = Gemma3(cfg)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = model.init(jax.random.key(0))
        if quantized:
            params, _ = oqt.quantize(
                model, params,
                oqt.QConfig(weights=oqt.QWeightArgs(dtype="uint4", group_size=128),
                            ignore=["lm_head", r"\.router$"]))
            params, _ = oqt.quantize(
                model, params,
                oqt.QConfig(weights=oqt.QWeightArgs(dtype="int8", group_size=-1,
                                                    symmetric=True),
                            ignore=[r"^layers\.", r"^embed$"]))
        params = fuse_moe_experts(
            prepare_kernel_scales(fuse_gemma3_projections(params)))
    return model, params


def prefill_tput(model, params, ragged: bool, batch=8, T_lo=256, T_hi=512,
                 repeats=5):
    import jax

    from onnx_quantize_tpu.engine import InferenceEngine

    for block in model.blocks:
        block.mlp.use_ragged_prefill = ragged
    device = jax.devices()[0]
    params = jax.tree.map(lambda a: jax.device_put(a, device), params)
    engine = InferenceEngine(model, params, max_batch=batch, max_seq=1024,
                             kv_quant=True, dtype=model.cfg.jnp_dtype)
    rng = np.random.default_rng(0)

    def run(T):
        ids = rng.integers(1, 32_768, size=(batch, T)).astype(np.int32)
        lengths = np.full((batch,), T, np.int32)
        cache = engine.new_cache()
        cache, logits = engine.prefill(cache, ids, lengths)
        return logits

    # Warm both programs; value fetch is the true sync.
    float(np.asarray(run(T_lo))[0, 0])
    float(np.asarray(run(T_hi))[0, 0])

    def timed(T):
        out = []
        for _ in range(repeats):
            t0 = time.time()
            r = run(T)
            jax.block_until_ready(r)
            out.append(time.time() - t0)
        return out

    lo, hi = timed(T_lo), timed(T_hi)
    extra_tok = batch * (T_hi - T_lo)
    pairs = [extra_tok / (h - l) for l, h in zip(sorted(lo), sorted(hi))]
    return float(np.median(pairs)), float(np.min(pairs)), float(np.max(pairs))


def main():
    print("== quantized (W4 g128 experts, int8 head) ==")
    model, params = build(quantized=True)
    for ragged in (False, True):
        med, lo, hi = prefill_tput(model, params, ragged)
        print(f"ragged={ragged}: {med:.0f} tok/s [{lo:.0f}, {hi:.0f}]")
    print("== bf16 baseline ==")
    model, params = build(quantized=False)
    for ragged in (False, True):
        med, lo, hi = prefill_tput(model, params, ragged)
        print(f"ragged={ragged}: {med:.0f} tok/s [{lo:.0f}, {hi:.0f}]")


if __name__ == "__main__":
    main()
