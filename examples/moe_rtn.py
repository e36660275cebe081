"""Quantize an MoE model (Mixtral/Qwen-MoE family) with RTN uint4 group-128.

The reference quantizes every MatMul site in any ONNX graph; an MoE model is
simply a model with E× more Linear sites (per-expert gate/up/down plus a tiny
router). The standard recipe carries over: W4 g128 on every expert
projection, the router and lm_head left in fp (the router is accuracy-
critical and ~0.01% of the bytes; the lm_head follows the reference's
``ignore=["lm_head"]`` example config).

Usage:
    python examples/moe_rtn.py --output qmoe_rtn [--hf-weights DIR] [--tiny]
    # --hf-weights: a local Qwen1.5-MoE-A2.7B safetensors dir
"""

import argparse

import jax

import onnx_quantize_tpu as oqt
from onnx_quantize_tpu.checkpoint import save_checkpoint
from onnx_quantize_tpu.models.moe import (
    QWEN15_MOE_A27B,
    MoE,
    load_qwen_moe_hf,
    tiny_moe_config,
)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--output", default="qmoe_rtn")
    parser.add_argument(
        "--hf-weights", default=None,
        help="Directory with HF safetensors for Qwen/Qwen1.5-MoE-A2.7B; "
        "random init if omitted.",
    )
    parser.add_argument("--tiny", action="store_true",
                        help="Toy config (CPU-friendly smoke run).")
    args = parser.parse_args()

    cfg = tiny_moe_config(moe_intermediate_size=128) if args.tiny else QWEN15_MOE_A27B
    model = MoE(cfg)
    if args.hf_weights:
        params = load_qwen_moe_hf(model, args.hf_weights)
    else:
        params = model.init(jax.random.key(0))

    qconfig = oqt.QConfig(
        weights=oqt.QWeightArgs(
            dtype="uint4", group_size=128 if not args.tiny else 16
        ),
        ignore=["lm_head", r"\.router$", r"\.shared_gate$"],
    )
    qparams, plan = oqt.quantize(model, params, qconfig)
    save_checkpoint(args.output, model, qparams, plan)
    print(f"saved quantized checkpoint to {args.output}")
    print("engine layout: fuse_gemma3_projections + stack_moe_experts at load")


if __name__ == "__main__":
    main()
