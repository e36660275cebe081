from onnx_quantize_tpu.models.gemma3 import (
    GEMMA3_270M,
    GEMMA3_1B,
    GEMMA3_4B,
    Gemma3,
    Gemma3Config,
    fuse_gemma3_projections,
)
from onnx_quantize_tpu.models.bert import BertClassifier, BertConfig
from onnx_quantize_tpu.models.llama import (
    LLAMA32_1B,
    LLAMA32_3B,
    Llama,
    llama_config,
    load_llama_hf,
)
from onnx_quantize_tpu.models.moe import (
    MIXTRAL_8X7B,
    QWEN15_MOE_A27B,
    MoE,
    load_mixtral_hf,
    load_qwen_moe_hf,
    moe_config,
    stack_moe_experts,
    tiny_moe_config,
)
from onnx_quantize_tpu.models.transformer import TransformerConfig, TransformerLM

__all__ = [
    "MoE",
    "moe_config",
    "tiny_moe_config",
    "stack_moe_experts",
    "QWEN15_MOE_A27B",
    "MIXTRAL_8X7B",
    "load_qwen_moe_hf",
    "load_mixtral_hf",
    "BertClassifier",
    "BertConfig",
    "Llama",
    "llama_config",
    "LLAMA32_1B",
    "LLAMA32_3B",
    "load_llama_hf",
    "Gemma3",
    "Gemma3Config",
    "GEMMA3_270M",
    "GEMMA3_1B",
    "GEMMA3_4B",
    "fuse_gemma3_projections",
    "TransformerLM",
    "TransformerConfig",
]
