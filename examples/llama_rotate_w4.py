"""W4 Llama with the rotation pre-pass: outlier-proof low-bit quantization.

The QuaRot-style recipe: fold a randomized-Hadamard basis change into the
weights FIRST (exact logits, zero runtime cost — ``prepasses/rotate.py``),
then RTN-quantize to 4 bits. On outlier-heavy weights the rotation recovers
most of the quantization-induced perplexity gap (see
``tests/integration/test_rotate_ppl.py``: int4 per-channel 52 ppl over fp
plain, ~3 ppl rotated). Works on pre-norm-convention models
(Llama/Qwen/Mixtral); pairs with GPTQ or AWQ by listing them after
``RotateConfig`` in ``preprocessors``.

Usage:
    python examples/llama_rotate_w4.py --output qllama_rot [--hf-weights DIR]
        [--tiny] [--gptq]
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
    parser.add_argument("--output", default="qllama_rot")
    parser.add_argument(
        "--hf-weights", default=None,
        help="Directory with HF safetensors; random init if omitted.",
    )
    parser.add_argument("--tiny", action="store_true",
                        help="Toy config (CPU-friendly smoke run).")
    parser.add_argument("--gptq", action="store_true",
                        help="Run GPTQ (in the rotated basis) instead of RTN.")
    parser.add_argument("--calib-tokens", default=None,
                        help=".npy token array for GPTQ calibration.")
    args = parser.parse_args()

    cfg = tiny_llama_config() if args.tiny else LLAMA32_1B
    model = Llama(cfg)
    if args.hf_weights:
        params = load_llama_hf(model, args.hf_weights)
    else:
        params = model.init(jax.random.key(0))

    if args.gptq:
        weights = oqt.QWeightArgs(dtype="uint4", group_size=128,
                                  algorithm=oqt.GPTQConfig())
    else:
        weights = oqt.QWeightArgs(dtype="uint4", group_size=128)  # RTN default
    calib = None
    if args.gptq:
        import numpy as np

        calib = (np.load(args.calib_tokens) if args.calib_tokens
                 else np.random.default_rng(0).integers(
                     1, cfg.vocab_size, size=(8, 128)).astype(np.int32))

    qconfig = oqt.QConfig(
        weights=weights,
        preprocessors=[oqt.RotateConfig(mode="hadamard", seed=0)],
        calibration_data=calib,
        ignore=["lm_head"],
    )
    qparams, plan = oqt.quantize(model, params, qconfig)
    save_checkpoint(args.output, model, qparams, plan)
    print(f"saved rotated {'GPTQ' if args.gptq else 'RTN'} uint4 checkpoint "
          f"to {args.output}")


if __name__ == "__main__":
    main()
