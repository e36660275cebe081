"""Mixed per-site configs via sequential quantize() passes (the bench.py
pattern: W4 body + int8 lm_head)."""

import numpy as np

import jax

import onnx_quantize_tpu as oqt
from onnx_quantize_tpu.checkpoint import load_params, save_params
from onnx_quantize_tpu.models.gemma3 import Gemma3, Gemma3Config, fuse_gemma3_projections
from onnx_quantize_tpu.nn import QTensor


def test_two_pass_mixed_quantization(rng):
    model = Gemma3(Gemma3Config.tiny())
    params = model.init(jax.random.key(0))

    pass1 = oqt.QConfig(
        weights=oqt.QWeightArgs(dtype="uint4", group_size=32), ignore=["lm_head"]
    )
    qparams, _ = oqt.quantize(model, params, pass1)
    pass2 = oqt.QConfig(
        weights=oqt.QWeightArgs(dtype="int8", group_size=-1, symmetric=True),
        ignore=[r"^layers\."],
    )
    qparams, plan2 = oqt.quantize(model, qparams, pass2)

    head = qparams["lm_head"]["w"]
    body = qparams["layers.0"]["attn"]["q_proj"]["w"]
    assert isinstance(head, QTensor) and head.meta.quant_type == "int8"
    assert isinstance(body, QTensor) and body.meta.quant_type == "uint4"

    ids = rng.integers(1, 250, size=(2, 8)).astype(np.int32)
    y = np.asarray(model(qparams, ids))
    assert np.all(np.isfinite(y))


def test_second_pass_skips_already_quantized(rng):
    model = Gemma3(Gemma3Config.tiny())
    params = model.init(jax.random.key(0))
    qc = oqt.QConfig(weights=oqt.QWeightArgs(dtype="uint4", group_size=32))
    qparams, _ = oqt.quantize(model, params, qc)
    before = qparams["layers.0"]["attn"]["q_proj"]["w"]
    # Re-running with an overlapping config must not crash or re-quantize.
    qparams2, _ = oqt.quantize(model, qparams, qc)
    after = qparams2["layers.0"]["attn"]["q_proj"]["w"]
    assert after.meta == before.meta
    np.testing.assert_array_equal(np.asarray(after.data), np.asarray(before.data))


def test_fused_params_checkpoint_roundtrip(tmp_path, rng):
    model = Gemma3(Gemma3Config.tiny())
    params = model.init(jax.random.key(0))
    qc = oqt.QConfig(
        weights=oqt.QWeightArgs(dtype="uint4", group_size=32), ignore=["lm_head"]
    )
    qparams, _ = oqt.quantize(model, params, qc)
    fused = fuse_gemma3_projections(qparams)
    ids = rng.integers(1, 250, size=(1, 8)).astype(np.int32)
    y0 = np.asarray(model(fused, ids))

    path = str(tmp_path / "fused_ckpt")
    save_params(path, fused)
    reloaded, _ = load_params(path)
    y1 = np.asarray(model(reloaded, ids))
    np.testing.assert_allclose(y1, y0, atol=1e-6)
