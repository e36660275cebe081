"""BERT-classifier integration pins — the reference's SST-2 tier, air-gapped.

Mirrors the reference's three integration files config-for-config:
``/root/reference/test/integration/bert/test_bert_weights_only.py:10-65``,
``test_bert_weights_inputs.py:11-68`` and
``test_bert_weights_inputs_outputs.py:18-79``. The reference downloads
DistilBERT-SST2 and asserts exact accuracies on a 100-sample GLUE slice; this
environment has no network, so the model is a deterministically *trained*
BERT-style encoder on a synthetic sentiment task
(``onnx_quantize_tpu.models.bert``) reaching a DistilBERT-like fp32 accuracy,
and the per-config quantized accuracies are pinned absolutely the same way
(0.94/0.93/0.89 pattern). The model is multi-input (ids + mask), so these
tests also exercise dict calibration data end to end.

Pins were computed once on CPU f32 and frozen. Eval set: 512 held-out
samples, so one flipped sample moves accuracy by ~0.002; ATOL allows ~3
sample flips for cross-version XLA reduction-order drift.
"""

import pytest

import onnx_quantize_tpu as oqt
from onnx_quantize_tpu.models.bert import (
    BertClassifier,
    BertConfig,
    accuracy,
    synthetic_sst2,
    train_classifier,
)

ATOL = 0.008

FP32_ACCURACY = 0.92578125


@pytest.fixture(scope="module")
def bert():
    cfg = BertConfig()
    model = BertClassifier(cfg)
    params = train_classifier(model)
    eval_ids, eval_mask, eval_labels = synthetic_sst2(512, cfg, seed=99)
    calib_ids, calib_mask, _ = synthetic_sst2(128, cfg, seed=41)
    calib = {
        "input_ids": calib_ids,
        "attention_mask": calib_mask,
    }
    return model, params, (eval_ids, eval_mask, eval_labels), calib


def _quantized_accuracy(bert, **cfg_kwargs):
    model, params, (ids, mask, labels), calib = bert
    qconfig = oqt.QConfig(**cfg_kwargs)
    qparams, _ = oqt.quantize(model, params, qconfig)
    return accuracy(model, qparams, ids, mask, labels)


def test_fp32_baseline(bert):
    model, params, (ids, mask, labels), _ = bert
    assert accuracy(model, params, ids, mask, labels) == pytest.approx(
        FP32_ACCURACY, abs=ATOL
    )


# --- weights-only grid (test_bert_weights_only.py:10-65) -------------------

WEIGHTS_ONLY = [
    # (name, dtype, strategy/group, algorithm, preprocessors, pinned accuracy)
    ("uint8_channel", dict(dtype="uint8", symmetric=False, group_size=-1), None),
    ("uint4_g128_rtn", dict(dtype="uint4", strategy="group", group_size=128), None),
    ("uint4_g128_hqq", dict(dtype="uint4", strategy="group", group_size=128,
                            algorithm=oqt.HqqConfig(early_stop=False)), None),
    ("int8_channel_awq", dict(dtype="int8", group_size=-1), "awq"),
]

WEIGHTS_ONLY_PINS = {
    "uint8_channel": 0.92578125,
    "uint4_g128_rtn": 0.921875,
    "uint4_g128_hqq": 0.921875,
    "int8_channel_awq": 0.92578125,
}


@pytest.mark.parametrize("name, wargs, pre", WEIGHTS_ONLY,
                         ids=[c[0] for c in WEIGHTS_ONLY])
def test_bert_weights_only(bert, name, wargs, pre):
    _, _, _, calib = bert
    kwargs = dict(weights=oqt.QWeightArgs(**wargs))
    if pre == "awq":
        kwargs["preprocessors"] = [oqt.AwqConfig()]
        kwargs["calibration_data"] = calib
    acc = _quantized_accuracy(bert, **kwargs)
    assert acc == pytest.approx(WEIGHTS_ONLY_PINS[name], abs=ATOL), (
        f"{name}: accuracy {acc:.4f} drifted from pin {WEIGHTS_ONLY_PINS[name]}"
    )


# --- weights + input activations (test_bert_weights_inputs.py:11-68) -------

WEIGHTS_INPUTS = [
    ("w_uint8_a_uint8_dynamic", "uint8", "uint8", False, False, None),
    ("w_uint8_a_uint8_static_sq", "uint8", "uint8", False, True, "sq"),
    ("w_uint8_a_uint8_static_awq_clip", "uint8", "uint8", False, True, "awq_clip"),
    ("w_int8_a_int8_static_sym", "int8", "int8", True, True, None),
]

WEIGHTS_INPUTS_PINS = {
    "w_uint8_a_uint8_dynamic": 0.92578125,
    "w_uint8_a_uint8_static_sq": 0.92578125,
    "w_uint8_a_uint8_static_awq_clip": 0.92578125,
    "w_int8_a_int8_static_sym": 0.92578125,
}


def _act_config(bert, w_dtype, a_dtype, symmetric, is_static, pre, with_outputs):
    _, _, _, calib = bert
    kwargs = dict(
        weights=oqt.QWeightArgs(dtype=w_dtype, symmetric=symmetric, group_size=-1),
        input_activations=oqt.QActivationArgs(dtype=a_dtype, is_static=is_static),
        calibration_data=calib,
    )
    if with_outputs:
        kwargs["output_activations"] = oqt.QActivationArgs(
            dtype=a_dtype, is_static=is_static
        )
    if pre == "sq":
        kwargs["preprocessors"] = [oqt.SmoothQuantConfig(alpha=0.5)]
    elif pre == "awq_clip":
        kwargs["preprocessors"] = [oqt.AwqConfig(clip_search=True)]
    elif pre == "awq":
        kwargs["preprocessors"] = [oqt.AwqConfig()]
    return kwargs


@pytest.mark.parametrize("name, w, a, sym, static, pre", WEIGHTS_INPUTS,
                         ids=[c[0] for c in WEIGHTS_INPUTS])
def test_bert_weights_inputs(bert, name, w, a, sym, static, pre):
    acc = _quantized_accuracy(
        bert, **_act_config(bert, w, a, sym, static, pre, with_outputs=False)
    )
    assert acc == pytest.approx(WEIGHTS_INPUTS_PINS[name], abs=ATOL), (
        f"{name}: accuracy {acc:.4f} drifted from pin {WEIGHTS_INPUTS_PINS[name]}"
    )


# --- weights + input + output acts (test_bert_weights_inputs_outputs.py) ---

WEIGHTS_INPUTS_OUTPUTS = [
    ("wio_uint8_dynamic", "uint8", "uint8", False, False, None),
    ("wio_uint8_static_sq", "uint8", "uint8", False, True, "sq"),
    ("wio_uint8_static_awq", "uint8", "uint8", False, True, "awq"),
    ("wio_int8_static_sym", "int8", "int8", True, True, None),
]

WEIGHTS_INPUTS_OUTPUTS_PINS = {
    "wio_uint8_dynamic": 0.927734375,
    "wio_uint8_static_sq": 0.92578125,
    "wio_uint8_static_awq": 0.92578125,
    "wio_int8_static_sym": 0.92578125,
}


@pytest.mark.parametrize("name, w, a, sym, static, pre", WEIGHTS_INPUTS_OUTPUTS,
                         ids=[c[0] for c in WEIGHTS_INPUTS_OUTPUTS])
def test_bert_weights_inputs_outputs(bert, name, w, a, sym, static, pre):
    acc = _quantized_accuracy(
        bert, **_act_config(bert, w, a, sym, static, pre, with_outputs=True)
    )
    assert acc == pytest.approx(WEIGHTS_INPUTS_OUTPUTS_PINS[name], abs=ATOL), (
        f"{name}: accuracy {acc:.4f} drifted from pin "
        f"{WEIGHTS_INPUTS_OUTPUTS_PINS[name]}"
    )
