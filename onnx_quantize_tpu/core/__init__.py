from onnx_quantize_tpu.core.dtypes import QuantType
from onnx_quantize_tpu.core.enums import QFormat, QuantizationStrategy

__all__ = ["QuantType", "QFormat", "QuantizationStrategy"]
