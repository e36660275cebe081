"""Quantize a Llama-3.2 model with RTN int8 group-128, lm_head ignored.

Same recipe as the reference's Gemma-3 example
(``/root/reference/examples/gemma3/gemma3_rtn.py:47-59``) applied to the
Llama family — the decoder, kernels, engine, and TP path are shared
(``models/llama.py``), so the quantization configs carry over unchanged.

Usage:
    python examples/llama_rtn.py --output qllama_rtn [--hf-weights DIR] [--tiny]
"""

import argparse

import jax

import onnx_quantize_tpu as oqt
from onnx_quantize_tpu.checkpoint import save_checkpoint
from onnx_quantize_tpu.models.llama import (
    LLAMA32_1B,
    Llama,
    load_llama_hf,
    tiny_llama_config,
)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--output", default="qllama_rtn")
    parser.add_argument(
        "--hf-weights", default=None,
        help="Directory with HF safetensors for meta-llama/Llama-3.2-1B; "
        "random init if omitted.",
    )
    parser.add_argument("--tiny", action="store_true",
                        help="Toy config (CPU-friendly smoke run).")
    args = parser.parse_args()

    cfg = tiny_llama_config() if args.tiny else LLAMA32_1B
    model = Llama(cfg)
    if args.hf_weights:
        params = load_llama_hf(model, args.hf_weights)
    else:
        params = model.init(jax.random.key(0))

    qconfig = oqt.QConfig(
        weights=oqt.QWeightArgs(dtype="int8", group_size=128),
        ignore=["lm_head"],
    )
    qparams, plan = oqt.quantize(model, params, qconfig)
    save_checkpoint(args.output, model, qparams, plan)
    print(f"saved quantized checkpoint to {args.output}")


if __name__ == "__main__":
    main()
