from onnx_quantize_tpu.calibration.base import CalibrationData, Calibrator
from onnx_quantize_tpu.calibration.calibrate import calibrate_model, collect_activations
from onnx_quantize_tpu.calibration.entropy import EntropyCalibrator
from onnx_quantize_tpu.calibration.factory import get_calibrator, register_calibrator
from onnx_quantize_tpu.calibration.minmax import MinMaxCalibrator

__all__ = [
    "CalibrationData",
    "Calibrator",
    "EntropyCalibrator",
    "MinMaxCalibrator",
    "calibrate_model",
    "collect_activations",
    "get_calibrator",
    "register_calibrator",
]
