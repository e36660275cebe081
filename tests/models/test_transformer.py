import numpy as np
import pytest

import jax

import onnx_quantize_tpu as oqt
from onnx_quantize_tpu.models.transformer import TransformerConfig, TransformerLM


@pytest.fixture(scope="module")
def lm():
    model = TransformerLM(TransformerConfig())
    params = model.init(jax.random.key(0))
    return model, params


def test_forward_and_sites(lm):
    model, params = lm
    ids = np.arange(16, dtype=np.int32).reshape(1, 16) % 512
    logits = model(params, ids)
    assert logits.shape == (1, 16, 512)
    sites = model.linear_sites()
    # 6 Gemm sites per block (q/k/v/o + fc_in/fc_out) + MatMul lm_head.
    assert len(sites) == 6 * model.cfg.num_layers + 1
    gemm = [s for s in sites if s.op_type == "Gemm"]
    assert len(gemm) == 6 * model.cfg.num_layers


def test_baseline_config2_w8_dynamic(lm, rng):
    """BASELINE config 2: int8 per-channel weights + dynamic uint8 inputs."""
    model, params = lm
    ids = rng.integers(0, 512, size=(2, 16)).astype(np.int32)
    y0 = np.asarray(model(params, ids))
    qc = oqt.QConfig(
        weights=oqt.QWeightArgs(dtype="int8", group_size=-1),
        input_activations=oqt.QActivationArgs(dtype="uint8", is_static=False),
        ignore=["lm_head"],
    )
    qparams, plan = oqt.quantize(model, params, qc)
    assert len(plan) == 6 * model.cfg.num_layers
    y1 = np.asarray(model(qparams, ids))
    rel = np.mean(np.abs(y1 - y0)) / np.mean(np.abs(y0))
    assert rel < 0.1


def test_baseline_config3_static_percentile(lm, rng):
    """BASELINE config 3: static W8A8 with percentile clipping."""
    model, params = lm
    ids = rng.integers(0, 512, size=(8, 16)).astype(np.int32)
    qc = oqt.QConfig(
        weights=oqt.QWeightArgs(dtype="int8", group_size=-1),
        input_activations=oqt.QActivationArgs(dtype="uint8"),
        output_activations=oqt.QActivationArgs(dtype="uint8"),
        calibration_params=oqt.CalibrationParams(
            method="percentile", percentile=0.995, num_samples=8, batch_size=4
        ),
        calibration_data=ids,
        ignore=["lm_head"],
    )
    qparams, plan = oqt.quantize(model, params, qc)
    for entry in plan:
        assert entry.input_scale is not None
    y = np.asarray(model(qparams, ids))
    assert np.all(np.isfinite(y))
