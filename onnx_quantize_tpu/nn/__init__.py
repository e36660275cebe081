from onnx_quantize_tpu.nn.module import Context, Linear, Module, Sequential
from onnx_quantize_tpu.nn.qtensor import (
    ActQuantSpec,
    QBias,
    QTensor,
    QTensorMeta,
    make_qtensor,
)

__all__ = [
    "Context",
    "Linear",
    "Module",
    "Sequential",
    "ActQuantSpec",
    "QBias",
    "QTensor",
    "QTensorMeta",
    "make_qtensor",
]
