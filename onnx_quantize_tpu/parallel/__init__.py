from onnx_quantize_tpu.parallel.mesh import data_sharding, make_mesh, replicated
from onnx_quantize_tpu.parallel.sharding import (
    GEMMA3_TP_RULES,
    qtensor_shardings,
    shard_params,
)
from onnx_quantize_tpu.parallel.cp import (
    cp_logits,
    cp_tp_logits,
    make_cp_forward,
    make_cp_mesh,
    make_cp_tp_mesh,
    zigzag_permutation,
)
from onnx_quantize_tpu.parallel.ep import a2a_moe_mlp
from onnx_quantize_tpu.parallel.pp import (
    make_pipeline_mesh,
    pipeline_stage_params,
    pp_logits,
)
from onnx_quantize_tpu.parallel.tp import (
    build_param_specs,
    localize_params,
    site_kind,
)

__all__ = [
    "a2a_moe_mlp",
    "cp_logits",
    "cp_tp_logits",
    "make_cp_forward",
    "make_cp_mesh",
    "make_cp_tp_mesh",
    "zigzag_permutation",
    "make_pipeline_mesh",
    "pipeline_stage_params",
    "pp_logits",
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
