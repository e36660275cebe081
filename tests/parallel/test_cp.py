"""Context parallelism: ring-attention equivalence on a CPU mesh.

``cp_logits`` shards tokens over a ``seq`` mesh axis and runs attention as a
K/V ring (or an all-gather-KV attend). Both modes must match the
single-device forward: bit-comparable for ``gather``, f32-accumulation
tolerance for ``ring`` (online softmax renormalizes). Layout (contiguous vs
zigzag) must not change results — positions travel with the tokens.
"""

import jax
import numpy as np
import pytest

import onnx_quantize_tpu as oqt
from onnx_quantize_tpu.models.gemma3 import Gemma3, Gemma3Config
from onnx_quantize_tpu.models.llama import tiny_llama_config
from onnx_quantize_tpu.models.moe import tiny_moe_config
from onnx_quantize_tpu.parallel.cp import (
    cp_logits,
    make_cp_mesh,
    zigzag_permutation,
)


def _llama(num_layers=2):
    cfg = tiny_llama_config(
        num_layers=num_layers, hidden_size=64, num_heads=4, num_kv_heads=2,
        head_dim=16,
    )
    model = Gemma3(cfg)
    params = model.init(jax.random.key(0))
    return model, params


def _ids(batch=2, seq=16):
    return np.random.default_rng(0).integers(1, 256, size=(batch, seq)).astype(np.int32)


@pytest.mark.parametrize("mode", ["ring", "gather"])
@pytest.mark.parametrize("layout", ["contiguous", "zigzag"])
def test_cp_matches_single_device_fp(mode, layout):
    model, params = _llama()
    ids = _ids()
    ref = np.asarray(model(params, ids))
    out = np.asarray(
        cp_logits(model, params, ids, make_cp_mesh(4), mode=mode, layout=layout)
    )
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)


def test_cp_quantized_matches_single_device():
    model, params = _llama()
    qc = oqt.QConfig(
        weights=oqt.QWeightArgs(dtype="uint4", group_size=16), ignore=["lm_head"]
    )
    qparams, _ = oqt.quantize(model, params, qc)
    ids = _ids()
    ref = np.asarray(model(qparams, ids))
    out = np.asarray(cp_logits(model, qparams, ids, make_cp_mesh(4)))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)


def test_cp_gemma_sliding_pattern():
    """Sliding-window layers: remote blocks outside the window are fully
    masked (the skipped-branch path) yet boundary blocks straddle it."""
    cfg = Gemma3Config.tiny(
        num_layers=4, sliding_pattern=2, hidden_size=64, num_heads=2,
        num_kv_heads=1, head_dim=32, sliding_window=6,
    )
    model = Gemma3(cfg)
    params = model.init(jax.random.key(1))
    ids = _ids(batch=2, seq=32)
    ref = np.asarray(model(params, ids))
    for layout in ("contiguous", "zigzag"):
        out = np.asarray(
            cp_logits(model, params, ids, make_cp_mesh(8), layout=layout)
        )
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)


def test_cp_moe_routing_is_token_pointwise():
    """MoE experts compose with CP unchanged: routing is per-token."""
    cfg = tiny_moe_config(num_layers=2)
    model = Gemma3(cfg)
    params = model.init(jax.random.key(2))
    ids = _ids(batch=2, seq=16)
    ref = np.asarray(model(params, ids))
    out = np.asarray(cp_logits(model, params, ids, make_cp_mesh(4)))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)


def test_zigzag_permutation_structure():
    perm = zigzag_permutation(16, 4)
    assert sorted(perm.tolist()) == list(range(16))
    # Device 0's shard = first chunk + mirrored last chunk.
    assert perm[:4].tolist() == [0, 1, 14, 15]
    with pytest.raises(ValueError, match="zigzag"):
        zigzag_permutation(12, 4)


def test_cp_validation_errors():
    model, params = _llama()
    with pytest.raises(ValueError, match="not divisible"):
        cp_logits(model, params, _ids(seq=10), make_cp_mesh(4))
    with pytest.raises(ValueError, match="unknown cp mode"):
        cp_logits(model, params, _ids(), make_cp_mesh(4), mode="nope")
    with pytest.raises(ValueError, match="unknown layout"):
        cp_logits(model, params, _ids(), make_cp_mesh(4), layout="nope")


def test_cp_tp_2d_matches_single_device():
    """2D (seq x model): ring attention + Megatron TP in one shard_map —
    ppermutes ride the seq submesh, psums the model submesh."""
    from onnx_quantize_tpu.parallel import cp_tp_logits, make_cp_tp_mesh

    model, params = _llama()
    ids = _ids()
    ref = np.asarray(model(params, ids))
    for seq_shards, tp in ((4, 2), (2, 4)):
        out = np.asarray(cp_tp_logits(
            model, params, ids, make_cp_tp_mesh(seq_shards, tp),
        ))
        np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-4)


def test_cp_tp_2d_quantized_zigzag():
    from onnx_quantize_tpu.parallel import cp_tp_logits, make_cp_tp_mesh

    model, params = _llama()
    qc = oqt.QConfig(
        weights=oqt.QWeightArgs(dtype="uint4", group_size=16), ignore=["lm_head"]
    )
    qparams, _ = oqt.quantize(model, params, qc)
    ids = _ids()
    ref = np.asarray(model(qparams, ids))
    out = np.asarray(cp_tp_logits(
        model, qparams, ids, make_cp_tp_mesh(4, 2), layout="zigzag",
    ))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-4)


def test_cp_tp_2d_moe_stacked_experts():
    """2D on MoE: ring attention over seq while stacked experts shard the
    model axis (EP psum) and the shared expert runs column->row TP — the
    full (CP x EP) composition in one program."""
    from onnx_quantize_tpu.models.gemma3 import fuse_gemma3_projections
    from onnx_quantize_tpu.models.moe import stack_moe_experts
    from onnx_quantize_tpu.parallel import cp_tp_logits, make_cp_tp_mesh

    cfg = tiny_moe_config(
        shared_expert_size=128, num_heads=4, num_kv_heads=2,
        hidden_size=64, head_dim=32, moe_intermediate_size=96,
    )
    model = Gemma3(cfg)
    params = model.init(jax.random.key(3))
    qc = oqt.QConfig(
        weights=oqt.QWeightArgs(dtype="uint4", group_size=16),
        ignore=[r"\.router$", r"\.shared_gate$"],
    )
    qparams, _ = oqt.quantize(model, params, qc)
    stacked = stack_moe_experts(fuse_gemma3_projections(qparams))
    ids = _ids(batch=2, seq=16)
    ref = np.asarray(model(stacked, ids))
    out = np.asarray(cp_tp_logits(model, stacked, ids, make_cp_tp_mesh(4, 2)))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-4)
