from onnx_quantize_tpu.parallel.mesh import data_sharding, make_mesh, replicated
from onnx_quantize_tpu.parallel.sharding import (
    GEMMA3_TP_RULES,
    qtensor_shardings,
    shard_params,
)
from onnx_quantize_tpu.parallel.tp import (
    build_param_specs,
    localize_params,
    site_kind,
)

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated",
    "GEMMA3_TP_RULES",
    "qtensor_shardings",
    "shard_params",
    "build_param_specs",
    "localize_params",
    "site_kind",
]
