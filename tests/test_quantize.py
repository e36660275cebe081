"""End-to-end quantize() tests, mirroring the reference grid
(``test/test_quantize.py:143-596``)."""

import numpy as np
import pytest

from onnx_quantize_tpu import (
    AwqConfig,
    GPTQConfig,
    HqqConfig,
    QActivationArgs,
    QConfig,
    QWeightArgs,
    SmoothQuantConfig,
    quantize,
)
from onnx_quantize_tpu.nn.qtensor import QBias, QTensor

from .helpers import FanOutModel, GemmModel, MixedModel, TwoMatMul


def _x(rng, d=16, n=8):
    return rng.standard_normal((n, d)).astype(np.float32)


def _run_quantize(rng, model, qconfig, atol=1e-1, d=16):
    """Quantize and compare against fp on the calibration data itself,
    mirroring the reference helper (``test_quantize.py:104-140``, which
    evaluates with ``samples={"X": calibration_data}`` so static activation
    ranges cover the eval inputs)."""
    params = model.random_params(rng)
    x = qconfig.calibration_data if qconfig.calibration_data is not None else _x(rng, d)
    x = np.asarray(x)
    y0 = np.asarray(model(params, x))
    qparams, plan = quantize(model, params, qconfig)
    y1 = np.asarray(model(qparams, x))
    assert y1.shape == y0.shape
    np.testing.assert_allclose(y1, y0, atol=atol)
    return qparams, plan


@pytest.mark.parametrize("model_cls", [TwoMatMul, GemmModel])
@pytest.mark.parametrize("dtype", ["int8", "uint8"])
@pytest.mark.parametrize("group_size", [None, -1, 8])
@pytest.mark.parametrize("symmetric", [False, True])
def test_weights_only_grid(rng, model_cls, dtype, group_size, symmetric):
    model = model_cls()
    qc = QConfig(
        weights=QWeightArgs(dtype=dtype, group_size=group_size, symmetric=symmetric)
    )
    qparams, plan = _run_quantize(rng, model, qc)
    assert len(plan) == 2
    for entry in plan:
        site = qparams[entry.site.param_path[0]]
        assert isinstance(site["w"], QTensor)


@pytest.mark.parametrize("dtype", ["int4", "uint4"])
@pytest.mark.parametrize("group_size", [None, -1, 8])
def test_weights_only_4bit(rng, dtype, group_size):
    # 4-bit error is larger; only structural + loose closeness (ref skips
    # closeness for 4-bit entirely, test_quantize.py:133-140).
    model = TwoMatMul()
    qc = QConfig(weights=QWeightArgs(dtype=dtype, group_size=group_size))
    params = model.random_params(rng)
    qparams, plan = quantize(model, params, qc)
    y = np.asarray(model(qparams, _x(rng)))
    assert np.all(np.isfinite(y))
    for entry in plan:
        qt = qparams[entry.site.param_path[0]]["w"]
        assert qt.meta.packed  # nibble packed


@pytest.mark.parametrize("mse", [False, True])
def test_weights_only_mse(rng, mse):
    model = TwoMatMul()
    qc = QConfig(weights=QWeightArgs(dtype="int8", group_size=-1, mse=mse))
    _run_quantize(rng, model, qc)


@pytest.mark.parametrize("is_static", [True, False])
def test_w8a8(rng, is_static):
    model = GemmModel()
    x = _x(rng)
    qc = QConfig(
        weights=QWeightArgs(dtype="int8"),
        input_activations=QActivationArgs(dtype="uint8", is_static=is_static),
        output_activations=QActivationArgs(dtype="uint8", is_static=is_static),
        calibration_data=x if is_static else None,
    )
    qparams, plan = _run_quantize(rng, model, qc)
    if is_static:
        for entry in plan:
            assert entry.input_scale is not None
            assert entry.output_scale is not None


def test_input_only_static(rng):
    model = TwoMatMul()
    qc = QConfig(
        weights=QWeightArgs(dtype="int8"),
        input_activations=QActivationArgs(dtype="uint8"),
        calibration_data=_x(rng),
    )
    _run_quantize(rng, model, qc)


def test_qlinear_format(rng):
    model = GemmModel()
    qc = QConfig(
        format="qlinear",
        weights=QWeightArgs(dtype="int8", group_size=-1, symmetric=True),
        input_activations=QActivationArgs(dtype="uint8"),
        output_activations=QActivationArgs(dtype="uint8"),
        calibration_data=_x(rng),
    )
    qparams, plan = _run_quantize(rng, model, qc)
    for entry in plan:
        site = qparams[entry.site.param_path[0]]
        assert isinstance(site["b"], QBias)
        assert site["b"].data.dtype == np.int32


def test_gptq_e2e(rng):
    model = TwoMatMul()
    qc = QConfig(
        weights=QWeightArgs(dtype="int8", group_size=8, algorithm=GPTQConfig(block_size=8)),
        calibration_data=_x(rng, n=32),
    )
    _run_quantize(rng, model, qc)


def test_hqq_e2e(rng):
    model = TwoMatMul()
    qc = QConfig(
        weights=QWeightArgs(
            dtype="uint4", strategy="group", group_size=16, algorithm=HqqConfig()
        ),
    )
    params = model.random_params(rng)
    qparams, plan = quantize(model, params, qc)
    y = np.asarray(model(qparams, _x(rng)))
    assert np.all(np.isfinite(y))
    # HQQ keeps a float zero point.
    qt = qparams["fc1"]["w"]
    assert qt.zero_point.dtype == np.float32


def test_smoothquant_e2e(rng):
    model = GemmModel()
    qc = QConfig(
        weights=QWeightArgs(dtype="int8"),
        input_activations=QActivationArgs(dtype="uint8"),
        output_activations=QActivationArgs(dtype="uint8"),
        preprocessors=[SmoothQuantConfig(alpha=0.5)],
        calibration_data=_x(rng),
    )
    qparams, plan = _run_quantize(rng, model, qc)
    # The prescale (folded Mul node) must be present.
    assert "prescale" in qparams["fc1"]


def test_awq_e2e(rng):
    model = TwoMatMul()
    qc = QConfig(
        weights=QWeightArgs(dtype="uint4", group_size=8),
        preprocessors=[AwqConfig(clip_search=True)],
        calibration_data=_x(rng, n=32),
    )
    params = model.random_params(rng)
    qparams, plan = quantize(model, params, qc)
    y = np.asarray(model(qparams, _x(rng)))
    assert np.all(np.isfinite(y))
    assert "prescale" in qparams["fc1"]
    # Clip search wrote a ratio back into the stamped config.
    assert plan["fc1"].qconfig_dict["weights"]["clip_ratio"] <= 1.0


def test_ignore_regex(rng):
    model = TwoMatMul()
    qc = QConfig(weights=QWeightArgs(dtype="int8"), ignore=["fc2"])
    params = model.random_params(rng)
    qparams, plan = quantize(model, params, qc)
    assert "fc1" in plan and "fc2" not in plan
    assert isinstance(qparams["fc1"]["w"], QTensor)
    assert not isinstance(qparams["fc2"]["w"], QTensor)


def test_per_op_type_targeting(rng):
    model = MixedModel()
    qc = QConfig(target_op_types=["Gemm"], weights=QWeightArgs(dtype="int8"))
    params = model.random_params(rng)
    qparams, plan = quantize(model, params, qc)
    assert "gemm" in plan and "mm" not in plan
    assert isinstance(qparams["gemm"]["w"], QTensor)
    assert not isinstance(qparams["mm"]["w"], QTensor)


def test_noop_config(rng):
    model = TwoMatMul()
    params = model.random_params(rng)
    qparams, plan = quantize(model, params, QConfig())
    assert len(plan) == 0
    x = _x(rng)
    np.testing.assert_array_equal(
        np.asarray(model(params, x)), np.asarray(model(qparams, x))
    )


def test_fan_out_shared_activation(rng):
    model = FanOutModel()
    qc = QConfig(
        weights=QWeightArgs(dtype="int8"),
        input_activations=QActivationArgs(dtype="uint8"),
        calibration_data=_x(rng),
    )
    qparams, plan = _run_quantize(rng, model, qc)
    # Both sites see the same input and must calibrate to the same scale.
    np.testing.assert_allclose(
        plan["left"].input_scale, plan["right"].input_scale, rtol=1e-6
    )


def test_untie_shared_weights(rng):
    model = FanOutModel()
    params = model.random_params(rng)
    params["right"]["w"] = params["left"]["w"]  # tie
    qc = QConfig(weights=QWeightArgs(dtype="int8", group_size=-1))
    qparams, plan = quantize(model, params, qc)
    assert isinstance(qparams["left"]["w"], QTensor)
    assert isinstance(qparams["right"]["w"], QTensor)
    assert qparams["left"]["w"] is not qparams["right"]["w"]


def test_original_params_not_mutated(rng):
    model = TwoMatMul()
    params = model.random_params(rng)
    w_before = np.asarray(params["fc1"]["w"]).copy()
    quantize(model, params, QConfig(weights=QWeightArgs(dtype="int8")))
    assert not isinstance(params["fc1"]["w"], QTensor)
    np.testing.assert_array_equal(np.asarray(params["fc1"]["w"]), w_before)


def test_invalid_inputs():
    model = TwoMatMul()
    with pytest.raises(TypeError, match="qconfig"):
        quantize(model, {}, {"weights": None})
    with pytest.raises(TypeError, match="model"):
        quantize("not a model", {}, QConfig())


@pytest.mark.parametrize("dtype", ["int8", "uint8"])
@pytest.mark.parametrize("group_size", [None, -1, 8])
def test_weights_only_reduce_range(rng, dtype, group_size):
    """reduce_range axis of the reference e2e grid (test_quantize.py:143-171):
    container values must stay inside the reduced range table
    (int8 -> [-64, 64], uint8 -> [0, 127]) and output stays close."""
    model = TwoMatMul()
    qc = QConfig(
        weights=QWeightArgs(dtype=dtype, group_size=group_size, reduce_range=True)
    )
    qparams, plan = _run_quantize(rng, model, qc)
    lo, hi = (-64, 64) if dtype == "int8" else (0, 127)
    for entry in plan:
        qt = qparams[entry.site.param_path[0]]["w"]
        assert qt.meta.reduce_range
        data = np.asarray(qt.data).astype(np.int32)
        assert data.min() >= lo and data.max() <= hi


@pytest.mark.parametrize("dtype", ["int4", "uint4"])
def test_weights_only_reduce_range_4bit(rng, dtype):
    """Reduced 4-bit ranges: uint4 -> [0, 7], int4 -> [-4, 3]."""
    model = TwoMatMul()
    qc = QConfig(weights=QWeightArgs(dtype=dtype, group_size=8, reduce_range=True))
    params = model.random_params(rng)
    qparams, plan = quantize(model, params, qc)
    assert np.all(np.isfinite(np.asarray(model(qparams, _x(rng)))))
    from onnx_quantize_tpu.nn.qtensor import unpack_k_pairs

    lo, hi = (-4, 3) if dtype == "int4" else (0, 7)
    for entry in plan:
        qt = qparams[entry.site.param_path[0]]["w"]
        vals = np.asarray(
            unpack_k_pairs(qt.data, qt.meta.shape[0], dtype == "int4", qt.meta.pack_group)
        ).astype(np.int32)
        assert vals.min() >= lo and vals.max() <= hi


@pytest.mark.parametrize("dtype", ["int4", "uint4", "int8"])
@pytest.mark.parametrize("group_size", [-1, 8])
@pytest.mark.parametrize("symmetric", [False, True])
def test_weights_only_mse_grid(rng, dtype, group_size, symmetric):
    """mse x group x 4-bit crosses (reference grid axis the r1 suite lacked).

    MSE-searched qparams must never do worse on weight MSE than plain minmax
    — checked per site against the dequantized weights."""
    if dtype == "int4" and not symmetric:
        pass  # asymmetric int4 is legal; keep the cross
    model = TwoMatMul()
    params = model.random_params(rng)

    def wmse(qparams):
        total = 0.0
        for name in ("fc1", "fc2"):
            w = np.asarray(params[name]["w"])
            qt = qparams[name]["w"]
            from onnx_quantize_tpu.ops.reference import dequantize_weight

            total += float(np.mean((np.asarray(dequantize_weight(qt)) - w) ** 2))
        return total

    qc_mm = QConfig(
        weights=QWeightArgs(dtype=dtype, group_size=group_size, symmetric=symmetric)
    )
    qc_mse = QConfig(
        weights=QWeightArgs(
            dtype=dtype, group_size=group_size, symmetric=symmetric, mse=True
        )
    )
    q_mm, _ = quantize(model, params, qc_mm)
    q_mse, _ = quantize(model, params, qc_mse)
    assert wmse(q_mse) <= wmse(q_mm) * 1.0001
