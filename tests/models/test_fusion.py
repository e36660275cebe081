import numpy as np
import pytest

import jax

import onnx_quantize_tpu as oqt
from onnx_quantize_tpu.models.gemma3 import Gemma3, Gemma3Config, fuse_gemma3_projections
from onnx_quantize_tpu.nn import QTensor


@pytest.fixture(scope="module")
def tiny():
    model = Gemma3(Gemma3Config.tiny())
    params = model.init(jax.random.key(0))
    return model, params


def test_fused_fp_forward_matches(tiny, rng):
    model, params = tiny
    ids = rng.integers(1, 250, size=(2, 8)).astype(np.int32)
    y0 = np.asarray(model(params, ids))
    fused = fuse_gemma3_projections(params)
    assert "_fused_qkv" in fused["layers.0"]["attn"]
    assert "q_proj" not in fused["layers.0"]["attn"]
    y1 = np.asarray(model(fused, ids))
    np.testing.assert_allclose(y1, y0, atol=2e-5)


def test_fused_quantized_forward_matches(tiny, rng):
    model, params = tiny
    qc = oqt.QConfig(
        weights=oqt.QWeightArgs(dtype="uint4", group_size=32), ignore=["lm_head"]
    )
    qparams, _ = oqt.quantize(model, params, qc)
    ids = rng.integers(1, 250, size=(2, 8)).astype(np.int32)
    y0 = np.asarray(model(qparams, ids))
    fused = fuse_gemma3_projections(qparams)
    qkv = fused["layers.0"]["attn"]["_fused_qkv"]["w"]
    assert isinstance(qkv, QTensor)
    cfg = model.cfg
    assert qkv.meta.shape == (
        cfg.hidden_size,
        (cfg.num_heads + 2 * cfg.num_kv_heads) * cfg.head_dim,
    )
    y1 = np.asarray(model(fused, ids))
    np.testing.assert_allclose(y1, y0, atol=2e-5)


def test_fusion_skipped_with_prescale(tiny, rng):
    """AWQ/SmoothQuant prescales make fusion invalid; must be skipped."""
    model, params = tiny
    qc = oqt.QConfig(
        weights=oqt.QWeightArgs(dtype="uint4", group_size=32),
        preprocessors=[oqt.AwqConfig()],
        ignore=["lm_head"],
        calibration_data=rng.integers(1, 250, size=(8, 8)).astype(np.int32),
        calibration_params=oqt.CalibrationParams(num_samples=8, batch_size=4),
    )
    qparams, _ = oqt.quantize(model, params, qc)
    fused = fuse_gemma3_projections(qparams)
    assert "_fused_qkv" not in fused["layers.0"]["attn"]
    assert "q_proj" in fused["layers.0"]["attn"]


def test_fusion_skipped_for_per_tensor(tiny, rng):
    model, params = tiny
    qc = oqt.QConfig(weights=oqt.QWeightArgs(dtype="int8"), ignore=["lm_head"])
    qparams, _ = oqt.quantize(model, params, qc)
    fused = fuse_gemma3_projections(qparams)
    assert "_fused_qkv" not in fused["layers.0"]["attn"]
