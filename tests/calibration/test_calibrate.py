import numpy as np
import pytest

from onnx_quantize_tpu import CalibrationParams, QActivationArgs, QConfig, QWeightArgs
from onnx_quantize_tpu.calibration import MinMaxCalibrator, calibrate_model, get_calibrator
from onnx_quantize_tpu.calibration.calibrate import _prepare_calibration_data
from onnx_quantize_tpu.core.qconfig import CalibrationMethod
from onnx_quantize_tpu.nn.module import InputSpec
from onnx_quantize_tpu.plan import build_plan

from ..helpers import GemmModel, TwoMatMul


def _plan_for(model, qc):
    model.finalize()
    return build_plan(model.linear_sites(), qc)


class TestBatching:
    def test_batches_shape(self):
        data = np.arange(40).reshape(20, 2).astype(np.float32)
        out = _prepare_calibration_data(data, batch_size=5, num_samples=20)
        assert out.shape == (4, 5, 2)

    def test_excess_samples_dropped(self):
        data = np.zeros((23, 2), np.float32)
        out = _prepare_calibration_data(data, batch_size=5, num_samples=23)
        assert out.shape == (4, 5, 2)

    def test_num_samples_clamped_to_total(self):
        data = np.zeros((7, 2), np.float32)
        out = _prepare_calibration_data(data, batch_size=10, num_samples=100)
        assert out.shape == (1, 7, 2)

    def test_single_batch_when_batch_ge_samples(self):
        data = np.zeros((8, 2), np.float32)
        out = _prepare_calibration_data(data, batch_size=16, num_samples=8)
        assert out.shape == (1, 8, 2)


class TestMinMaxCalibrator:
    def test_strict_minmax(self):
        c = MinMaxCalibrator()
        c.collect("a", np.array([1.0, 5.0]))
        c.collect("a", np.array([-2.0, 3.0]))
        rmin, rmax = c.compute_range("a")
        assert rmin == -2.0 and rmax == 5.0

    def test_zero_always_in_range(self):
        c = MinMaxCalibrator()
        c.collect("a", np.array([2.0, 5.0]))
        rmin, rmax = c.compute_range("a")
        assert rmin == 0.0 and rmax == 5.0

    def test_momentum_ema(self):
        c = MinMaxCalibrator(momentum=0.5)
        c.collect("a", np.array([0.0, 4.0]))
        c.collect("a", np.array([0.0, 8.0]))
        _, rmax = c.compute_range("a")
        assert rmax == pytest.approx(0.5 * 4 + 0.5 * 8)

    def test_missing_key_raises(self):
        with pytest.raises(KeyError):
            MinMaxCalibrator().compute_range("missing")

    def test_invalid_momentum(self):
        with pytest.raises(AssertionError):
            MinMaxCalibrator(momentum=1.5)


class TestFactory:
    def test_get_by_enum_and_string(self):
        assert isinstance(get_calibrator(CalibrationMethod.MINMAX), MinMaxCalibrator)
        assert isinstance(get_calibrator("minmax", momentum=0.5), MinMaxCalibrator)

    def test_unknown_method(self):
        with pytest.raises(ValueError):
            get_calibrator("kl-nope")


class TestCalibrateModel:
    def test_static_input_qparams_set(self, rng):
        model = TwoMatMul()
        x = rng.standard_normal((16, 16)).astype(np.float32)
        qc = QConfig(
            weights=QWeightArgs(dtype="int8"),
            input_activations=QActivationArgs(dtype="uint8"),
            calibration_data=x,
        )
        plan = _plan_for(model, qc)
        params = model.random_params(rng)
        calibrate_model(model, params, plan, qc)
        for entry in plan:
            assert entry.input_scale is not None
            assert entry.input_zero_point is not None
            assert entry.output_scale is None

    def test_random_fallback_uses_input_specs(self, rng):
        model = TwoMatMul()
        qc = QConfig(
            weights=QWeightArgs(dtype="int8"),
            input_activations=QActivationArgs(dtype="uint8"),
            calibration_params=CalibrationParams(num_samples=8, batch_size=4),
        )
        plan = _plan_for(model, qc)
        calibrate_model(model, model.random_params(rng), plan, qc)
        assert all(e.input_scale is not None for e in plan)

    def test_random_fallback_without_specs_raises(self, rng):
        model = TwoMatMul()
        model.input_specs = None
        qc = QConfig(
            weights=QWeightArgs(dtype="int8"),
            input_activations=QActivationArgs(dtype="uint8"),
        )
        plan = _plan_for(model, qc)
        with pytest.raises(ValueError, match="input_specs"):
            calibrate_model(model, model.random_params(rng), plan, qc)
        model.input_specs = [InputSpec("input", (16,))]

    def test_int_input_random_data(self, rng):
        """Integer inputs get token-id-range random data (ref :127-147)."""
        import jax.numpy as jnp

        from onnx_quantize_tpu import nn

        class EmbedModel(nn.Module):
            def __init__(self):
                super().__init__()
                self.proj = nn.Linear(8, 4, use_bias=False)
                self.input_specs = [InputSpec("input_ids", (3,), np.int32)]
                self.emb = None
                self.finalize()

            def __call__(self, params, ids, ctx=None):
                e = params["emb"][ids]  # (B, 3, 8)
                return self.proj(params["proj"], e, ctx=ctx)

            def random_params(self, rng):
                return {
                    "emb": jnp.asarray(rng.standard_normal((100, 8)).astype(np.float32)),
                    "proj": {"w": jnp.asarray(rng.standard_normal((8, 4)).astype(np.float32))},
                }

        model = EmbedModel()
        qc = QConfig(
            weights=QWeightArgs(dtype="int8"),
            input_activations=QActivationArgs(dtype="uint8"),
            calibration_params=CalibrationParams(num_samples=6, batch_size=3),
        )
        plan = _plan_for(model, qc)
        calibrate_model(model, model.random_params(rng), plan, qc)
        assert plan["proj"].input_scale is not None

    def test_multi_input_requires_dict(self, rng):
        from onnx_quantize_tpu import nn

        class TwoInput(nn.Module):
            def __init__(self):
                super().__init__()
                self.proj = nn.Linear(8, 4, use_bias=False)
                self.input_specs = [InputSpec("a", (8,)), InputSpec("b", (8,))]
                self.finalize()

            def __call__(self, params, a, b, ctx=None):
                return self.proj(params["proj"], a + b, ctx=ctx)

            def random_params(self, rng):
                import jax.numpy as jnp
                return {"proj": {"w": jnp.asarray(rng.standard_normal((8, 4)).astype(np.float32))}}

        model = TwoInput()
        qc = QConfig(
            weights=QWeightArgs(dtype="int8"),
            input_activations=QActivationArgs(dtype="uint8"),
            calibration_data=np.zeros((4, 8), np.float32),
        )
        plan = _plan_for(model, qc)
        with pytest.raises(ValueError, match="dict"):
            calibrate_model(model, model.random_params(rng), plan, qc)

        qc2 = QConfig(
            weights=QWeightArgs(dtype="int8"),
            input_activations=QActivationArgs(dtype="uint8"),
            calibration_data={
                "a": rng.standard_normal((4, 8)).astype(np.float32),
                "b": rng.standard_normal((4, 8)).astype(np.float32),
            },
        )
        plan2 = _plan_for(model, qc2)
        calibrate_model(model, model.random_params(rng), plan2, qc2)
        assert plan2["proj"].input_scale is not None

    def test_gptq_raw_inputs_captured(self, rng):
        from onnx_quantize_tpu import GPTQConfig

        model = GemmModel()
        x = rng.standard_normal((12, 16)).astype(np.float32)
        qc = QConfig(
            weights=QWeightArgs(dtype="int8", algorithm=GPTQConfig()),
            calibration_data=x,
            calibration_params=CalibrationParams(num_samples=12, batch_size=4),
        )
        plan = _plan_for(model, qc)
        calibrate_model(model, model.random_params(rng), plan, qc)
        cap = plan["fc1"].captured_input
        assert cap is not None
        assert cap.shape == (12, 16)
        np.testing.assert_allclose(cap, x, rtol=1e-6)

    def test_ignored_sites_not_calibrated(self, rng):
        model = TwoMatMul()
        qc = QConfig(
            weights=QWeightArgs(dtype="int8"),
            input_activations=QActivationArgs(dtype="uint8"),
            ignore=["fc2"],
            calibration_data=rng.standard_normal((8, 16)).astype(np.float32),
        )
        plan = _plan_for(model, qc)
        calibrate_model(model, model.random_params(rng), plan, qc)
        assert "fc2" not in plan
