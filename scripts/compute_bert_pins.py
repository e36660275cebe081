"""Compute the frozen accuracy pins for tests/integration/test_bert_classifier.py.

Run once on CPU; paste the printed dict values into the test file.
"""

import json

import jax

jax.config.update("jax_platforms", "cpu")

import onnx_quantize_tpu as oqt
from onnx_quantize_tpu.models.bert import (
    BertClassifier,
    BertConfig,
    accuracy,
    synthetic_sst2,
    train_classifier,
)

cfg = BertConfig()
model = BertClassifier(cfg)
params = train_classifier(model)
eval_ids, eval_mask, eval_labels = synthetic_sst2(512, cfg, seed=99)
calib_ids, calib_mask, _ = synthetic_sst2(128, cfg, seed=41)
calib = {"input_ids": calib_ids, "attention_mask": calib_mask}

results = {"fp32": accuracy(model, params, eval_ids, eval_mask, eval_labels)}
print("fp32", results["fp32"], flush=True)


def run(name, **kwargs):
    qparams, _ = oqt.quantize(model, params, oqt.QConfig(**kwargs))
    acc = accuracy(model, qparams, eval_ids, eval_mask, eval_labels)
    results[name] = acc
    print(name, acc, flush=True)


# weights-only
run("uint8_channel", weights=oqt.QWeightArgs(dtype="uint8", symmetric=False, group_size=-1))
run("uint4_g128_rtn", weights=oqt.QWeightArgs(dtype="uint4", strategy="group", group_size=128))
run("uint4_g128_hqq", weights=oqt.QWeightArgs(dtype="uint4", strategy="group", group_size=128,
                                              algorithm=oqt.HqqConfig(early_stop=False)))
run("int8_channel_awq", weights=oqt.QWeightArgs(dtype="int8", group_size=-1),
    preprocessors=[oqt.AwqConfig()], calibration_data=calib)

# weights + input acts
def act(w, a, sym, static, pre, outputs):
    kwargs = dict(
        weights=oqt.QWeightArgs(dtype=w, symmetric=sym, group_size=-1),
        input_activations=oqt.QActivationArgs(dtype=a, is_static=static),
        calibration_data=calib,
    )
    if outputs:
        kwargs["output_activations"] = oqt.QActivationArgs(dtype=a, is_static=static)
    if pre == "sq":
        kwargs["preprocessors"] = [oqt.SmoothQuantConfig(alpha=0.5)]
    elif pre == "awq_clip":
        kwargs["preprocessors"] = [oqt.AwqConfig(clip_search=True)]
    elif pre == "awq":
        kwargs["preprocessors"] = [oqt.AwqConfig()]
    return kwargs


run("w_uint8_a_uint8_dynamic", **act("uint8", "uint8", False, False, None, False))
run("w_uint8_a_uint8_static_sq", **act("uint8", "uint8", False, True, "sq", False))
run("w_uint8_a_uint8_static_awq_clip", **act("uint8", "uint8", False, True, "awq_clip", False))
run("w_int8_a_int8_static_sym", **act("int8", "int8", True, True, None, False))

run("wio_uint8_dynamic", **act("uint8", "uint8", False, False, None, True))
run("wio_uint8_static_sq", **act("uint8", "uint8", False, True, "sq", True))
run("wio_uint8_static_awq", **act("uint8", "uint8", False, True, "awq", True))
run("wio_int8_static_sym", **act("int8", "int8", True, True, None, True))

print(json.dumps(results, indent=2))
