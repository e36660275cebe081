import numpy as np

import jax

import onnx_quantize_tpu as oqt
from onnx_quantize_tpu.checkpoint import load_checkpoint, load_params, save_checkpoint
from onnx_quantize_tpu.models.gemma3 import Gemma3, Gemma3Config


def test_quantized_checkpoint_roundtrip(tmp_path, rng):
    model = Gemma3(Gemma3Config.tiny())
    params = model.init(jax.random.key(0))
    qc = oqt.QConfig(
        weights=oqt.QWeightArgs(dtype="uint4", group_size=32), ignore=["lm_head"]
    )
    qparams, plan = oqt.quantize(model, params, qc)
    ids = np.array([[1, 2, 3, 4]], np.int32)
    y0 = np.asarray(model(qparams, ids))

    path = str(tmp_path / "ckpt")
    save_checkpoint(path, model, qparams, plan)

    model2, params2 = load_checkpoint(path)
    assert model2.cfg == model.cfg
    y1 = np.asarray(model2(params2, ids))
    np.testing.assert_allclose(y1, y0, atol=1e-6)


def test_qbias_roundtrip(tmp_path, rng):
    from tests.helpers import GemmModel

    model = GemmModel()
    params = model.random_params(rng)
    x = (0.1 * rng.standard_normal((4, 16))).astype(np.float32)
    qc = oqt.QConfig(
        format="qlinear",
        weights=oqt.QWeightArgs(dtype="int8", group_size=-1, symmetric=True),
        input_activations=oqt.QActivationArgs(dtype="uint8"),
        output_activations=oqt.QActivationArgs(dtype="uint8"),
        calibration_data=x,
    )
    qparams, plan = oqt.quantize(model, params, qc)
    y0 = np.asarray(model(qparams, x))

    from onnx_quantize_tpu.checkpoint import save_params

    path = str(tmp_path / "ckpt2")
    save_params(path, qparams)
    params2, _ = load_params(path)
    y1 = np.asarray(model(params2, x))
    np.testing.assert_allclose(y1, y0, atol=1e-6)
