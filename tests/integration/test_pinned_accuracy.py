"""Integration-style accuracy pinning.

The analogue of the reference's integration tier (``test/integration/bert/*``,
SURVEY.md §4.7), which pins *exact* accuracy per config on a fixed model +
dataset. Without network access we pin the quantization-induced error of a
fixed-seed Gemma-3 (tiny) on a fixed token set per config — any numerics
change in an algorithm or kernel moves these numbers and trips the pin.
"""

import numpy as np
import pytest

import jax

import onnx_quantize_tpu as oqt
from onnx_quantize_tpu.models.gemma3 import Gemma3, Gemma3Config


@pytest.fixture(scope="module")
def fixed_model():
    model = Gemma3(Gemma3Config.tiny())
    params = model.init(jax.random.key(1234))
    rng = np.random.default_rng(99)
    ids = rng.integers(1, 250, size=(4, 16)).astype(np.int32)
    baseline = np.asarray(model(params, ids))
    return model, params, ids, baseline


def _rel_err(model, params, qconfig, ids, baseline):
    qparams, _ = oqt.quantize(model, params, qconfig)
    out = np.asarray(model(qparams, ids))
    return float(np.mean(np.abs(out - baseline)) / np.mean(np.abs(baseline)))


# Pinned ceilings: measured on the fixed seed, then frozen with ~25% headroom.
# A numerics regression in qparams/kernels shows up as a pin violation.
CONFIG_PINS = [
    ("int8_tensor", dict(weights=dict(dtype="int8")), 0.020),
    ("int8_channel", dict(weights=dict(dtype="int8", group_size=-1)), 0.015),
    ("uint8_channel", dict(weights=dict(dtype="uint8", group_size=-1)), 0.015),
    ("int8_g32", dict(weights=dict(dtype="int8", group_size=32)), 0.017),
    ("uint4_g32", dict(weights=dict(dtype="uint4", group_size=32)), 0.22),
    ("int4_g32_sym", dict(weights=dict(dtype="int4", group_size=32, symmetric=True)), 0.30),
    ("int8_channel_mse", dict(weights=dict(dtype="int8", group_size=-1, mse=True)), 0.015),
]


@pytest.mark.parametrize("name, cfg, pin", CONFIG_PINS, ids=[c[0] for c in CONFIG_PINS])
def test_pinned_weight_only(fixed_model, name, cfg, pin):
    model, params, ids, baseline = fixed_model
    qconfig = oqt.QConfig(**cfg, ignore=["lm_head"])
    err = _rel_err(model, params, qconfig, ids, baseline)
    assert err <= pin, f"{name}: rel err {err:.4f} exceeded pin {pin}"
    assert err > 0  # must actually quantize


def test_pinned_hqq_beats_rtn_uint4(fixed_model):
    model, params, ids, baseline = fixed_model
    rtn = oqt.QConfig(
        weights=oqt.QWeightArgs(dtype="uint4", group_size=32), ignore=["lm_head"]
    )
    hqq = oqt.QConfig(
        weights=oqt.QWeightArgs(
            dtype="uint4", strategy="group", group_size=32, algorithm=oqt.HqqConfig()
        ),
        ignore=["lm_head"],
    )
    err_rtn = _rel_err(model, params, rtn, ids, baseline)
    err_hqq = _rel_err(model, params, hqq, ids, baseline)
    assert err_hqq <= err_rtn * 1.1


def test_pinned_gptq_beats_rtn_int4(fixed_model):
    model, params, ids, baseline = fixed_model
    calib = np.random.default_rng(5).integers(1, 250, size=(16, 16)).astype(np.int32)
    rtn = oqt.QConfig(
        weights=oqt.QWeightArgs(dtype="int4", group_size=32), ignore=["lm_head"]
    )
    gptq = oqt.QConfig(
        weights=oqt.QWeightArgs(
            dtype="int4", group_size=32, algorithm=oqt.GPTQConfig(block_size=32)
        ),
        ignore=["lm_head"],
        calibration_data=calib,
        calibration_params=oqt.CalibrationParams(num_samples=16, batch_size=8),
    )
    err_rtn = _rel_err(model, params, rtn, ids, baseline)
    err_gptq = _rel_err(model, params, gptq, ids, baseline)
    assert err_gptq <= err_rtn


def test_pinned_static_w8a8_smoothquant(fixed_model):
    model, params, ids, baseline = fixed_model
    qconfig = oqt.QConfig(
        weights=oqt.QWeightArgs(dtype="int8"),
        input_activations=oqt.QActivationArgs(dtype="uint8"),
        output_activations=oqt.QActivationArgs(dtype="uint8"),
        preprocessors=[oqt.SmoothQuantConfig(alpha=0.5)],
        calibration_data=ids,
        calibration_params=oqt.CalibrationParams(num_samples=4, batch_size=4),
        ignore=["lm_head"],
    )
    err = _rel_err(model, params, qconfig, ids, baseline)
    assert err <= 0.25
