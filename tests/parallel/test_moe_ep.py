"""Expert parallelism: the engine's (data x model) mesh path on an MoE model.

Stacked expert weights shard their leading axis over the model axis
(``Gemma3.tp_localize`` emits the "expert" rules), attention runs the usual
Megatron TP schedule, and the shared expert runs column->row TP — all inside
ONE shard_map program per engine step. Equivalence is asserted numerically
against the single-device engine (same bar as tests/parallel/test_tp_engine.py).
"""

import jax
import numpy as np
import pytest

import onnx_quantize_tpu as oqt
from onnx_quantize_tpu.engine import ContinuousBatchingScheduler, InferenceEngine
from onnx_quantize_tpu.models.gemma3 import Gemma3, fuse_gemma3_projections
from onnx_quantize_tpu.models.moe import (
    fuse_moe_experts,
    stack_moe_experts,
    tiny_moe_config,
)
from onnx_quantize_tpu.parallel import make_mesh


def _quantized_moe(shared: int = 128, layout=stack_moe_experts):
    # head_dim=32 keeps row-parallel o_proj shards at an even group count up
    # to 4-way TP; experts (4) divide tp in {1, 2, 4}.
    cfg = tiny_moe_config(
        shared_expert_size=shared, num_heads=4, num_kv_heads=2,
        hidden_size=64, head_dim=32, moe_intermediate_size=96,
    )
    model = Gemma3(cfg)
    params = model.init(jax.random.key(0))
    qc = oqt.QConfig(
        weights=oqt.QWeightArgs(dtype="uint4", group_size=16),
        ignore=[r"\.router$", r"\.shared_gate$"],
    )
    qparams, _ = oqt.quantize(model, params, qc)
    return model, layout(fuse_gemma3_projections(qparams))


@pytest.mark.parametrize("tp", [2, 4])
@pytest.mark.parametrize("layout", [stack_moe_experts, fuse_moe_experts],
                         ids=["stacked", "fused"])
def test_moe_ep_engine_matches_single_device(tp, layout):
    model, stacked = _quantized_moe(layout=layout)
    ids = np.random.default_rng(0).integers(1, 256, size=(4, 8)).astype(np.int32)
    lengths = np.full((4,), 8, np.int32)

    eng1 = InferenceEngine(model, stacked, max_batch=4, max_seq=32, kv_quant=True)
    c1, l1 = eng1.prefill(eng1.new_cache(), ids, lengths)
    first = np.asarray(np.argmax(l1, -1), np.int32)
    c1, gen1 = eng1.decode_multi(c1, first, steps=3)

    mesh = make_mesh(model_parallel=tp, devices=jax.devices()[:8])
    engN = InferenceEngine(model, stacked, max_batch=4, max_seq=32,
                           kv_quant=True, mesh=mesh)
    cN, lN = engN.prefill(engN.new_cache(), ids, lengths)
    firstN = np.asarray(np.argmax(lN, -1), np.int32)
    cN, genN = engN.decode_multi(cN, firstN, steps=3)

    np.testing.assert_allclose(
        np.asarray(lN), np.asarray(l1), atol=2e-4, rtol=1e-4,
        err_msg="EP prefill logits diverge from single-device engine",
    )
    np.testing.assert_array_equal(firstN, first)
    np.testing.assert_array_equal(np.asarray(genN), np.asarray(gen1))


def test_moe_ep_without_shared_expert():
    model, stacked = _quantized_moe(shared=0)
    ids = np.random.default_rng(1).integers(1, 256, size=(2, 6)).astype(np.int32)
    lengths = np.full((2,), 6, np.int32)
    mesh = make_mesh(model_parallel=4, devices=jax.devices()[:4])

    eng1 = InferenceEngine(model, stacked, max_batch=2, max_seq=16)
    c1, l1 = eng1.prefill(eng1.new_cache(), ids, lengths)
    engN = InferenceEngine(model, stacked, max_batch=2, max_seq=16, mesh=mesh)
    cN, lN = engN.prefill(engN.new_cache(), ids, lengths)
    np.testing.assert_allclose(np.asarray(lN), np.asarray(l1), atol=2e-4, rtol=1e-4)


def test_moe_ep_serve_rounds_match_single_device():
    """Chunked serve rounds (admission + per-slot decode in one program)
    compose with expert parallelism."""
    model, stacked = _quantized_moe()
    mesh = make_mesh(model_parallel=2, devices=jax.devices()[:4])
    rng = np.random.default_rng(2)
    prompts = [list(rng.integers(1, 256, size=int(n))) for n in (5, 3, 7, 4)]

    def run(mesh_arg):
        engine = InferenceEngine(model, stacked, max_batch=2, max_seq=32,
                                 kv_quant=True, mesh=mesh_arg)
        sched = ContinuousBatchingScheduler(engine, chunk=2, pipeline=2)
        reqs = [sched.submit(p, max_new_tokens=4) for p in prompts]
        sched.run()
        return [r.output for r in reqs]

    assert run(mesh) == run(None)


def test_moe_tp_rejects_indivisible_experts():
    cfg = tiny_moe_config(num_experts=3, num_heads=4, head_dim=32)
    with pytest.raises(ValueError, match="num_experts"):
        Gemma3(cfg).tp_localize(tp=2)
