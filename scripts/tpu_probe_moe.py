"""Decompose the MoE decode step cost on the chip (bench.py moe config).

Arms (M=32 decode shapes, d=1024, moe_inter=2816, E=8 top-2, W4 g128):
  1. one expert fused gate_up W4 kernel        (x @ W4(1024, 5632))
  2. one expert down W4 kernel                 (x @ W4(2816, 1024))
  3. bf16 dense controls of both shapes
  4. the FULL stacked Gemma3MoEMLP layer (dense-masked loop: router + top-k
     + one_hot combine + 8x(mask, gate_up, act, down, weight-accumulate))
  5. the same without the input-masking multiply

Reading: (4) vs 8x[(1)+(2)] separates kernel time from glue; (1)/(3) pin the
W4 kernels against their byte rooflines. Run ALONE on the chip:
  python scripts/tpu_probe_moe.py
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")

import numpy as np

import jax
import jax.numpy as jnp

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from tpu_probe_step_costs import bench  # noqa: E402


def main():
    cpu = jax.devices("cpu")[0]
    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    M, d, inter, E = 32, 1024, 2816, 8

    def report(name, sec, mbytes):
        gbs = mbytes / 1e3 / sec if sec > 0 else float("nan")
        print(f"{name:42s} {sec*1e6:9.1f} us   {gbs:7.1f} GB/s")

    from onnx_quantize_tpu.engine import prepare_kernel_scales
    from onnx_quantize_tpu.ops import quantized_matmul

    x_d = jnp.asarray(rng.standard_normal((M, d)), jnp.bfloat16)
    x_i = jnp.asarray(rng.standard_normal((M, inter)), jnp.bfloat16)

    # 1/2: single-expert kernels. make_qt returns device-resident QTensors;
    # bake the kernel scale layout host-side first.
    def qt_baked(w):
        from onnx_quantize_tpu.algorithms.rtn import rtn_quantize
        from onnx_quantize_tpu.core.dtypes import QuantType
        from onnx_quantize_tpu.core.enums import QuantizationStrategy
        from onnx_quantize_tpu.nn.qtensor import make_qtensor

        with jax.default_device(cpu):
            q, s, zp = rtn_quantize(
                w, QuantType.QUInt4, QuantizationStrategy.GROUP, 128, False,
                False,
            )
            qt = make_qtensor(
                q, s, zp, quant_type=QuantType.QUInt4,
                strategy=QuantizationStrategy.GROUP, group_size=128,
                symmetric=False, reduce_range=False,
            )
            qt = prepare_kernel_scales({"w": qt})["w"]
        return jax.tree.map(lambda a: jax.device_put(a, dev), qt)

    w_gu = qt_baked(rng.standard_normal((d, 2 * inter)).astype(np.float32))
    w_dn = qt_baked(rng.standard_normal((inter, d)).astype(np.float32))
    gu_mb = (d * inter + 2 * (d // 128) * 2 * inter * 4 * 2) / 1e6
    dn_mb = (inter * d // 2 + (inter // 128) * d * 4 * 2) / 1e6

    t = bench(lambda xv, wv: quantized_matmul(xv, wv), x_d, w_gu)
    report("gate_up W4 g128 (1024x5632)", t, gu_mb)
    t = bench(lambda xv, wv: quantized_matmul(xv, wv), x_i, w_dn)
    report("down    W4 g128 (2816x1024)", t, dn_mb)

    # 3: dense bf16 controls
    gub = jnp.asarray(rng.standard_normal((d, 2 * inter)), jnp.bfloat16)
    dnb = jnp.asarray(rng.standard_normal((inter, d)), jnp.bfloat16)
    t = bench(lambda xv, wv: jnp.dot(xv, wv, preferred_element_type=jnp.float32),
              x_d, gub)
    report("gate_up bf16 dense", t, d * 2 * inter * 2 / 1e6)
    t = bench(lambda xv, wv: jnp.dot(xv, wv, preferred_element_type=jnp.float32),
              x_i, dnb)
    report("down    bf16 dense", t, inter * d * 2 / 1e6)

    # 4/5: full MoE MLP layer (stacked, dense-masked)
    import onnx_quantize_tpu as oqt
    from onnx_quantize_tpu.models.gemma3 import Gemma3, fuse_gemma3_projections
    from onnx_quantize_tpu.models.moe import (
        fuse_moe_experts,
        moe_config,
        stack_moe_experts,
    )

    cfg = moe_config(
        num_experts=E, num_experts_per_tok=2, moe_intermediate_size=inter,
        shared_expert_size=0, norm_topk_prob=True, vocab_size=1024,
        hidden_size=d, intermediate_size=inter, num_layers=1, num_heads=8,
        num_kv_heads=2, head_dim=128, dtype="bfloat16",
    )
    model = Gemma3(cfg)
    with jax.default_device(cpu):
        params = model.init(jax.random.key(0))
        qp, _ = oqt.quantize(
            model, params,
            oqt.QConfig(weights=oqt.QWeightArgs(dtype="uint4", group_size=128),
                        ignore=["lm_head", r"\.router$", r"^embed$"]))
        stacked = stack_moe_experts(
            prepare_kernel_scales(fuse_gemma3_projections(qp)))
        stacked_bf16 = stack_moe_experts(
            fuse_gemma3_projections(
                jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                             if getattr(a, "dtype", None) == jnp.float32 else a,
                             params)))
    mlp_params = jax.device_put(stacked["layers.0"]["mlp"], dev)
    mlp_bf16 = jax.device_put(stacked_bf16["layers.0"]["mlp"], dev)
    mlp_module = model.blocks[0].mlp
    mlp_module.use_ragged_prefill = False

    x3 = x_d.reshape(M, 1, d)  # decode shape (B, 1, d)
    expert_mb = E * (gu_mb + dn_mb)

    def run_mlp(xv, p):
        return mlp_module(p, xv)

    t = bench(lambda xv, p: run_mlp(xv, p), x3, mlp_params)
    report(f"FULL MoE MLP layer W4 loop ({E} experts)", t, expert_mb)
    t = bench(lambda xv, p: run_mlp(xv, p), x3, mlp_bf16)
    report("FULL MoE MLP layer bf16 loop", t,
           E * (d * 2 * inter + inter * d) * 2 / 1e6)

    # 6: the concatenated-experts layout (ONE fat-N gate_up + ONE deep-K down)
    with jax.default_device(cpu):
        fused = fuse_moe_experts(prepare_kernel_scales(
            fuse_gemma3_projections(qp)))
        fused_bf16 = fuse_moe_experts(
            fuse_gemma3_projections(
                jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                             if getattr(a, "dtype", None) == jnp.float32 else a,
                             params)))
    fparams = jax.device_put(fused["layers.0"]["mlp"], dev)
    fbf16 = jax.device_put(fused_bf16["layers.0"]["mlp"], dev)
    assert "_fused_experts" in fused["layers.0"]["mlp"]
    t = bench(lambda xv, p: run_mlp(xv, p), x3, fparams)
    report("FULL MoE MLP layer W4 CONCAT", t, expert_mb)
    t = bench(lambda xv, p: run_mlp(xv, p), x3, fbf16)
    report("FULL MoE MLP layer bf16 CONCAT", t,
           E * (d * 2 * inter + inter * d) * 2 / 1e6)


if __name__ == "__main__":
    main()
