"""Pre-pass driver: calibrate -> stamp -> preprocessors -> re-calibrate.

Mirrors ``/root/reference/src/onnx_quantize/pre_passes/__init__.py:45-90``. The
reference's structural passes map as follows in the param-tree world:

  * NameFixPass — site names are always unique dotted paths (structural no-op).
  * DuplicateInitializersPass — :func:`onnx_quantize_tpu.utils.untie_params`
    (applied by the quantize orchestrator before planning).
  * MatMul+Add→Gemm / StandarizeGemm — Linear sites already carry their bias
    and use the transB=0 ``(in, out)`` layout by construction.
"""

from __future__ import annotations

from onnx_quantize_tpu._logging import get_logger
from onnx_quantize_tpu.calibration import calibrate_model
from onnx_quantize_tpu.core.qconfig import QConfig
from onnx_quantize_tpu.plan import QuantPlan, stamp_qconfig
from onnx_quantize_tpu.prepasses.awq import AwqConfig, AwqPass
from onnx_quantize_tpu.prepasses.rotate import RotateConfig, RotatePass
from onnx_quantize_tpu.prepasses.smooth_quant import SmoothQuantConfig, SmoothQuantPass

logger = get_logger(__name__)

__all__ = ["apply_pre_passes", "AwqConfig", "AwqPass", "RotateConfig",
           "RotatePass", "SmoothQuantConfig", "SmoothQuantPass"]


def _needs_calibration(qconfig: QConfig) -> bool:
    """Whether any consumer needs a calibration run (ref ``__init__.py:29-42``)."""
    static_input = (
        qconfig.input_activations is not None and qconfig.input_activations.is_static
    )
    static_output = (
        qconfig.output_activations is not None and qconfig.output_activations.is_static
    )
    algo = qconfig.weights is not None and qconfig.weights.algorithm.requires_calibration
    preproc = any(p.requires_calibration for p in qconfig.preprocessors)
    return static_input or static_output or algo or preproc


def apply_pre_passes(model, params, plan: QuantPlan, qconfig: QConfig) -> None:
    """Calibrate, stamp per-site qconfigs, run preprocessors, re-calibrate.

    Mutates ``params`` (nested dicts) and ``plan`` in place.
    """
    if _needs_calibration(qconfig):
        logger.info("Running calibration")
        calibrate_model(model, params, plan, qconfig)

    stamp_qconfig(plan, qconfig)

    if qconfig.preprocessors:
        for pre_cfg in qconfig.preprocessors:
            pre_pass = pre_cfg.build_pass(qconfig)
            logger.info("Applying pre-pass %s", type(pre_pass).__name__)
            pre_pass(model, params, plan, qconfig)

        if any(p.requires_post_calibration for p in qconfig.preprocessors):
            logger.info("Re-calibrating after pre-processing passes")
            calibrate_model(model, params, plan, qconfig)

    # Calibration data is no longer needed past this point.
    qconfig.calibration_data = None
