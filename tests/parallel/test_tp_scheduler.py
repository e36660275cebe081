"""Continuous batching over the tensor-parallel engine (CPU mesh).

The serving stack and the TP execution path compose: the scheduler's batched
masked admission, chunked decode, and host-mirrored lengths must behave
identically whether the engine runs single-device or as one shard_map program
over a (data, model) mesh.
"""

import numpy as np

import jax

import onnx_quantize_tpu as oqt
from onnx_quantize_tpu.engine import ContinuousBatchingScheduler, InferenceEngine
from onnx_quantize_tpu.models.gemma3 import Gemma3, Gemma3Config
from onnx_quantize_tpu.parallel import make_mesh


def _quantized_tiny():
    cfg = Gemma3Config.tiny(
        hidden_size=128, intermediate_size=128, num_layers=2, num_heads=4,
        num_kv_heads=1, head_dim=32, vocab_size=256,
    )
    model = Gemma3(cfg)
    params = model.init(jax.random.key(0))
    qparams, _ = oqt.quantize(
        model, params, oqt.QConfig(weights=oqt.QWeightArgs(dtype="uint4", group_size=16))
    )
    return model, qparams


def _serve(model, params, mesh, chunk):
    engine = InferenceEngine(model, params, max_batch=2, max_seq=96,
                             kv_quant=True, mesh=mesh)
    sched = ContinuousBatchingScheduler(engine, chunk=chunk)
    rng = np.random.default_rng(11)
    reqs = [
        sched.submit(list(rng.integers(1, 256, size=int(rng.integers(3, 9)))),
                     max_new_tokens=int(rng.integers(3, 10)))
        for _ in range(5)
    ]
    sched.run()
    assert all(r.done for r in reqs)
    return [r.output for r in reqs]


def test_scheduler_over_tp_engine_matches_single_device():
    model, qparams = _quantized_tiny()
    mesh = make_mesh(model_parallel=4)

    base_chunked = _serve(model, qparams, None, chunk=4)
    tp_chunked = _serve(model, qparams, mesh, chunk=4)
    assert tp_chunked == base_chunked

    tp_per_step = _serve(model, qparams, mesh, chunk=1)
    assert tp_per_step == base_chunked
