"""Quantize Gemma-3-270M with AWQ uint4 group-128 using calibration text.

Mirror of ``/root/reference/examples/gemma3/gemma3_awq.py:13-66``: wikitext
calibration samples drive the AWQ scale search before 4-bit RTN quantization.

Usage:
    python examples/gemma3/gemma3_awq.py --output qgemma3_awq \
        [--hf-weights DIR] [--calib-tokens tokens.npy]
"""

import argparse

import numpy as np

import jax

import onnx_quantize_tpu as oqt
from onnx_quantize_tpu.checkpoint import save_checkpoint
from onnx_quantize_tpu.models.gemma3 import GEMMA3_270M, Gemma3


def _calibration_ids(args, vocab_size: int, num_samples: int = 32, seq_len: int = 256):
    if args.calib_tokens:
        tokens = np.load(args.calib_tokens)
        usable = (len(tokens) // seq_len) * seq_len
        return tokens[:usable].reshape(-1, seq_len)[:num_samples].astype(np.int32)
    rng = np.random.default_rng(0)
    return rng.integers(1, min(vocab_size, 100), size=(num_samples, seq_len)).astype(np.int32)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--output", default="qgemma3_awq")
    parser.add_argument("--hf-weights", default=None)
    parser.add_argument("--calib-tokens", default=None,
                        help="Pre-tokenized wikitext .npy for calibration.")
    args = parser.parse_args()

    model = Gemma3(GEMMA3_270M)
    if args.hf_weights:
        from onnx_quantize_tpu.models.import_hf import load_gemma3_hf

        params = load_gemma3_hf(model, args.hf_weights)
    else:
        params = model.init(jax.random.key(0))

    calib = _calibration_ids(args, model.cfg.vocab_size)
    qconfig = oqt.QConfig(
        weights=oqt.QWeightArgs(dtype="uint4", group_size=128),
        preprocessors=[oqt.AwqConfig()],
        ignore=["lm_head"],
        calibration_data=calib,
        calibration_params=oqt.CalibrationParams(num_samples=len(calib), batch_size=4),
    )
    qparams, plan = oqt.quantize(model, params, qconfig)
    save_checkpoint(args.output, model, qparams, plan)
    print(f"saved quantized checkpoint to {args.output}")


if __name__ == "__main__":
    main()
