import numpy as np

from onnx_quantize_tpu import QActivationArgs, QConfig, QWeightArgs, SmoothQuantConfig
from onnx_quantize_tpu.calibration import calibrate_model
from onnx_quantize_tpu.plan import build_plan, stamp_qconfig

from ..helpers import GemmModel


def _setup(rng, alpha=0.5):
    model = GemmModel()
    x = rng.standard_normal((16, 16)).astype(np.float32)
    qc = QConfig(
        weights=QWeightArgs(dtype="int8"),
        input_activations=QActivationArgs(dtype="uint8"),
        preprocessors=[SmoothQuantConfig(alpha=alpha)],
        calibration_data=x,
    )
    model.finalize()
    plan = build_plan(model.linear_sites(), qc)
    params = model.random_params(rng)
    calibrate_model(model, params, plan, qc)
    stamp_qconfig(plan, qc)
    return model, params, plan, qc, x


def test_smooth_quant_fp_output_invariance(rng):
    """Folding s into W and 1/s into x must leave the fp output unchanged."""
    model, params, plan, qc, x = _setup(rng)
    y0 = np.asarray(model(params, x))

    from onnx_quantize_tpu.utils import copy_tree

    params2 = copy_tree(params)
    sq_pass = qc.preprocessors[0].build_pass(qc)
    modified = sq_pass(model, params2, plan, qc)
    assert modified
    y1 = np.asarray(model(params2, x))
    np.testing.assert_allclose(y1, y0, atol=5e-5)


def test_smooth_quant_prescale_present_on_all_sites(rng):
    model, params, plan, qc, x = _setup(rng)
    sq_pass = qc.preprocessors[0].build_pass(qc)
    sq_pass(model, params, plan, qc)
    assert "prescale" in params["fc1"]
    assert "prescale" in params["fc2"]


def test_smooth_quant_updates_captured_inputs_in_place(rng):
    """The in-place updated captured inputs must equal a fresh re-calibration
    of the transformed model (the critical property at
    ``test_smooth_quant.py:70-108``)."""
    model, params, plan, qc, x = _setup(rng)
    sq_pass = qc.preprocessors[0].build_pass(qc)
    sq_pass(model, params, plan, qc)

    updated = {e.name: e.captured_input.copy() for e in plan}

    plan2 = build_plan(model.linear_sites(), qc)
    calibrate_model(model, params, plan2, qc)
    for name, cap in updated.items():
        np.testing.assert_allclose(cap, plan2[name].captured_input, atol=1e-5)


def test_smooth_quant_scale_formula(rng):
    model, params, plan, qc, x = _setup(rng, alpha=0.5)
    w_before = np.asarray(params["fc1"]["w"]).copy()
    cap = plan["fc1"].captured_input.copy()
    sq_pass = qc.preprocessors[0].build_pass(qc)
    sq_pass(model, params, plan, qc)

    act_scale = np.maximum(np.max(np.abs(cap.reshape(-1, cap.shape[-1])), axis=0), 1e-5)
    w_scale = np.max(np.abs(w_before), axis=1)
    expected = np.power(act_scale, 0.5) / np.power(w_scale + 1e-9, 0.5)
    np.testing.assert_allclose(
        np.asarray(params["fc1"]["prescale"]), (1.0 / expected).astype(np.float32),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(params["fc1"]["w"]), expected.reshape(-1, 1) * w_before, rtol=1e-5
    )
