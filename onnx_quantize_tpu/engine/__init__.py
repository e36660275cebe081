from onnx_quantize_tpu.engine.engine import InferenceEngine, prepare_kernel_scales
from onnx_quantize_tpu.engine.kv_cache import KVCacheConfig, init_cache, read_kv, write_kv
from onnx_quantize_tpu.engine.sampling import SamplingParams, sample
from onnx_quantize_tpu.engine.scheduler import ContinuousBatchingScheduler, Request
from onnx_quantize_tpu.engine.spec_scheduler import SpeculativeScheduler
from onnx_quantize_tpu.engine.speculative import SpeculativeDecoder

__all__ = [
    "SpeculativeDecoder",
    "SpeculativeScheduler",
    "InferenceEngine",
    "prepare_kernel_scales",
    "KVCacheConfig",
    "init_cache",
    "read_kv",
    "write_kv",
    "SamplingParams",
    "sample",
    "ContinuousBatchingScheduler",
    "Request",
]
