"""Pipeline parallelism: GPipe fill/drain schedule equivalence on a CPU mesh.

``pp_logits`` over a stage-split decoder must equal the single-device forward
exactly (same kernels, f32 chain unchanged) — fp and quantized, for both the
data-parallel-head and replicated-head epilogues, and for Gemma's mixed
local/global sliding pattern when stages align with it.
"""

import jax
import numpy as np
import pytest

import onnx_quantize_tpu as oqt
from onnx_quantize_tpu.models.gemma3 import Gemma3, Gemma3Config
from onnx_quantize_tpu.models.llama import tiny_llama_config
from onnx_quantize_tpu.parallel.pp import (
    make_pipeline_mesh,
    pipeline_stage_params,
    pp_logits,
)


def _llama(num_layers=4):
    cfg = tiny_llama_config(
        num_layers=num_layers, hidden_size=64, num_heads=4, num_kv_heads=2,
        head_dim=16,
    )
    model = Gemma3(cfg)
    params = model.init(jax.random.key(0))
    return model, params


def _ids(batch=8, seq=12):
    return np.random.default_rng(0).integers(1, 256, size=(batch, seq)).astype(np.int32)


@pytest.mark.parametrize("stages,microbatches", [(2, 4), (4, 8), (4, 4)])
def test_pp_matches_single_device_fp(stages, microbatches):
    model, params = _llama()
    ids = _ids()
    ref = np.asarray(model(params, ids))
    st, sh = pipeline_stage_params(model, params, stages=stages)
    mesh = make_pipeline_mesh(stages)
    out = np.asarray(pp_logits(model, st, sh, ids, mesh, microbatches=microbatches))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)


def test_pp_quantized_matches_single_device():
    model, params = _llama()
    qc = oqt.QConfig(
        weights=oqt.QWeightArgs(dtype="uint4", group_size=16), ignore=["lm_head"]
    )
    qparams, _ = oqt.quantize(model, params, qc)
    ids = _ids()
    ref = np.asarray(model(qparams, ids))
    st, sh = pipeline_stage_params(model, qparams, stages=4)
    out = np.asarray(
        pp_logits(model, st, sh, ids, make_pipeline_mesh(4), microbatches=8)
    )
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)


def test_pp_replicated_head_when_microbatches_not_divisible():
    """n_mb % stages != 0 falls back to the replicated-head epilogue."""
    model, params = _llama()
    ids = _ids(batch=6)
    ref = np.asarray(model(params, ids))
    st, sh = pipeline_stage_params(model, params, stages=4)
    out = np.asarray(
        pp_logits(model, st, sh, ids, make_pipeline_mesh(4), microbatches=3)
    )
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)


def test_pp_gemma_sliding_pattern_alignment():
    """Gemma-3's 5-local:1-global pattern: stages aligned to the pattern run
    (layers-per-stage a multiple of sliding_pattern); misaligned raises."""
    cfg = Gemma3Config.tiny(
        num_layers=4, sliding_pattern=2, hidden_size=64, num_heads=2,
        num_kv_heads=1, head_dim=32, sliding_window=8,
    )
    model = Gemma3(cfg)
    params = model.init(jax.random.key(1))
    ids = _ids(batch=4, seq=10)
    ref = np.asarray(model(params, ids))
    # 2 stages x 2 layers each: positions (local, global) in both stages.
    st, sh = pipeline_stage_params(model, params, stages=2)
    out = np.asarray(
        pp_logits(model, st, sh, ids, make_pipeline_mesh(2), microbatches=4)
    )
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)
    # 4 stages x 1 layer: position 0 is local in stage 0, global in stage 1.
    with pytest.raises(ValueError, match="mixes local/global"):
        pipeline_stage_params(model, params, stages=4)


def test_pp_validation_errors():
    model, params = _llama(num_layers=4)
    with pytest.raises(ValueError, match="stages >= 2"):
        pipeline_stage_params(model, params, stages=1)
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_stage_params(model, params, stages=3)
    st, sh = pipeline_stage_params(model, params, stages=2)
    with pytest.raises(ValueError, match="not divisible"):
        pp_logits(model, st, sh, _ids(batch=7), make_pipeline_mesh(2),
                  microbatches=2)
