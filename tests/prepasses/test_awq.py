import numpy as np

from onnx_quantize_tpu import AwqConfig, QConfig, QWeightArgs
from onnx_quantize_tpu.calibration import calibrate_model
from onnx_quantize_tpu.plan import build_plan, stamp_qconfig

from ..helpers import TwoMatMul


def _setup(rng, clip_search=False):
    model = TwoMatMul()
    x = rng.standard_normal((32, 16)).astype(np.float32)
    qc = QConfig(
        weights=QWeightArgs(dtype="uint4", group_size=8),
        preprocessors=[AwqConfig(clip_search=clip_search)],
        calibration_data=x,
    )
    model.finalize()
    plan = build_plan(model.linear_sites(), qc)
    params = model.random_params(rng)
    calibrate_model(model, params, plan, qc)
    stamp_qconfig(plan, qc)
    return model, params, plan, qc, x


def test_awq_fp_output_invariance(rng):
    model, params, plan, qc, x = _setup(rng)
    y0 = np.asarray(model(params, x))
    awq_pass = qc.preprocessors[0].build_pass(qc)
    assert awq_pass(model, params, plan, qc)
    y1 = np.asarray(model(params, x))
    np.testing.assert_allclose(y1, y0, atol=5e-5)


def test_awq_reduces_quantized_output_error(rng):
    """AWQ-scaled weights must quantize at least as well as plain RTN."""
    from onnx_quantize_tpu import quantize

    model = TwoMatMul()
    params = model.random_params(rng)
    # Make fc1 channels wildly different in magnitude so scaling matters.
    w = np.asarray(params["fc1"]["w"]).copy()
    w[::2, :] *= 8.0
    params["fc1"]["w"] = w
    x = rng.standard_normal((32, 16)).astype(np.float32)
    y0 = np.asarray(model(params, x))

    qc_plain = QConfig(weights=QWeightArgs(dtype="uint4", group_size=8))
    qp_plain, _ = quantize(model, params, qc_plain)
    qc_awq = QConfig(
        weights=QWeightArgs(dtype="uint4", group_size=8),
        preprocessors=[AwqConfig()],
        calibration_data=x,
    )
    qp_awq, _ = quantize(model, params, qc_awq)

    err_plain = np.mean((np.asarray(model(qp_plain, x)) - y0) ** 2)
    err_awq = np.mean((np.asarray(model(qp_awq, x)) - y0) ** 2)
    assert err_awq <= err_plain * 1.05


def test_awq_updates_captured_inputs_in_place(rng):
    model, params, plan, qc, x = _setup(rng)
    awq_pass = qc.preprocessors[0].build_pass(qc)
    awq_pass(model, params, plan, qc)
    updated = {e.name: e.captured_input.copy() for e in plan}

    plan2 = build_plan(model.linear_sites(), qc)
    calibrate_model(model, params, plan2, qc)
    for name, cap in updated.items():
        np.testing.assert_allclose(cap, plan2[name].captured_input, atol=1e-5)


def test_awq_clip_search_writes_clip_ratio(rng):
    model, params, plan, qc, x = _setup(rng, clip_search=True)
    awq_pass = qc.preprocessors[0].build_pass(qc)
    awq_pass(model, params, plan, qc)
    for entry in plan:
        ratio = entry.qconfig_dict["weights"]["clip_ratio"]
        assert 0.9 <= ratio <= 1.0
