"""BERT-classifier quantization demo (the reference's SST-2 story, runnable).

The reference validates quantization on DistilBERT-SST2 via its integration
tests (`/root/reference/test/integration/bert/`); this demo reproduces that
flow end to end without network access: deterministically train a BERT-style
encoder on the synthetic sentiment task, quantize it per config, and print
the accuracy table (compare `test_bert_weights_only.py:10-65`'s
0.94/0.93/0.94/0.94 pattern).

    python examples/bert/bert_sst2.py [--steps 400] [--eval 512]
"""

import argparse

import jax

import onnx_quantize_tpu as oqt
from onnx_quantize_tpu.models.bert import (
    BertClassifier,
    BertConfig,
    accuracy,
    synthetic_sst2,
    train_classifier,
)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=400)
    parser.add_argument("--eval", type=int, default=512)
    parser.add_argument("--cpu", action="store_true",
                        help="force CPU (default: whatever jax exposes)")
    args = parser.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    cfg = BertConfig()
    model = BertClassifier(cfg)
    print(f"training ({args.steps} steps, deterministic) ...")
    params = train_classifier(model, steps=args.steps)

    eval_ids, eval_mask, eval_labels = synthetic_sst2(args.eval, cfg, seed=99)
    calib_ids, calib_mask, _ = synthetic_sst2(128, cfg, seed=41)
    calib = {"input_ids": calib_ids, "attention_mask": calib_mask}

    def acc(p):
        return accuracy(model, p, eval_ids, eval_mask, eval_labels)

    rows = [("fp32", acc(params))]

    configs = [
        ("uint8 / per-channel", dict(
            weights=oqt.QWeightArgs(dtype="uint8", symmetric=False, group_size=-1))),
        ("uint4 / group-128 RTN", dict(
            weights=oqt.QWeightArgs(dtype="uint4", strategy="group", group_size=128))),
        ("uint4 / group-128 HQQ", dict(
            weights=oqt.QWeightArgs(dtype="uint4", strategy="group", group_size=128,
                                    algorithm=oqt.HqqConfig(early_stop=False)))),
        ("int8 / per-channel AWQ", dict(
            weights=oqt.QWeightArgs(dtype="int8", group_size=-1),
            preprocessors=[oqt.AwqConfig()], calibration_data=calib)),
        ("W8A8 static + SmoothQuant", dict(
            weights=oqt.QWeightArgs(dtype="uint8", symmetric=False, group_size=-1),
            input_activations=oqt.QActivationArgs(dtype="uint8", is_static=True),
            preprocessors=[oqt.SmoothQuantConfig(alpha=0.5)],
            calibration_data=calib)),
    ]
    for name, kwargs in configs:
        qparams, _ = oqt.quantize(model, params, oqt.QConfig(**kwargs))
        rows.append((name, acc(qparams)))

    width = max(len(n) for n, _ in rows)
    print(f"\n{'config'.ljust(width)}  accuracy")
    for name, value in rows:
        print(f"{name.ljust(width)}  {value:.4f}")


if __name__ == "__main__":
    main()
