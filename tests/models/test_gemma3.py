import numpy as np
import pytest

import jax
import jax.numpy as jnp

import onnx_quantize_tpu as oqt
from onnx_quantize_tpu.models.gemma3 import Gemma3, Gemma3Config


@pytest.fixture(scope="module")
def tiny_model():
    model = Gemma3(Gemma3Config.tiny())
    params = model.init(jax.random.key(0))
    return model, params


def test_forward_shapes(tiny_model):
    model, params = tiny_model
    ids = np.array([[1, 5, 9, 2, 7, 3, 4, 6]], np.int32)
    logits = model(params, ids)
    assert logits.shape == (1, 8, model.cfg.vocab_size)
    assert bool(jnp.isfinite(logits).all())


def test_site_names_match_reference_patterns(tiny_model):
    model, _ = tiny_model
    names = [s.name for s in model.linear_sites()]
    assert "lm_head" in names
    assert "layers.0.attn.q_proj" in names
    assert "layers.1.mlp.down_proj" in names
    # 7 sites per layer + lm_head
    assert len(names) == 7 * model.cfg.num_layers + 1


def test_causality(tiny_model):
    """Changing a future token must not affect earlier logits."""
    model, params = tiny_model
    ids_a = np.array([[1, 2, 3, 4, 5, 6, 7, 8]], np.int32)
    ids_b = ids_a.copy()
    ids_b[0, -1] = 99
    la = np.asarray(model(params, ids_a))
    lb = np.asarray(model(params, ids_b))
    np.testing.assert_allclose(la[0, :-1], lb[0, :-1], atol=1e-5)
    assert np.abs(la[0, -1] - lb[0, -1]).max() > 1e-4


def test_sliding_window_masks_far_tokens():
    """A local-attention-only model must ignore tokens beyond the window."""
    cfg = Gemma3Config.tiny(sliding_window=4, sliding_pattern=100)  # all local
    model = Gemma3(cfg)
    params = model.init(jax.random.key(1))
    ids_a = np.array([[1, 2, 3, 4, 5, 6, 7, 8]], np.int32)
    ids_b = ids_a.copy()
    ids_b[0, 0] = 77  # outside the window of the last position
    la = np.asarray(model(params, ids_a))
    lb = np.asarray(model(params, ids_b))
    np.testing.assert_allclose(la[0, -1], lb[0, -1], atol=1e-5)


def test_lm_head_tied_then_untied_by_quantize(tiny_model):
    model, params = tiny_model
    assert params["lm_head"]["w"] is not None
    np.testing.assert_array_equal(
        np.asarray(params["lm_head"]["w"]), np.asarray(params["embed"]["w"]).T
    )
    qc = oqt.QConfig(weights=oqt.QWeightArgs(dtype="int8", group_size=-1))
    qparams, plan = oqt.quantize(model, params, qc)
    assert "lm_head" in plan
    # embed weight untouched, lm_head quantized independently.
    np.testing.assert_array_equal(
        np.asarray(qparams["embed"]["w"]), np.asarray(params["embed"]["w"])
    )


def test_quantized_forward_close(tiny_model):
    model, params = tiny_model
    ids = np.array([[1, 5, 9, 2, 7, 3, 4, 6]], np.int32)
    y0 = np.asarray(model(params, ids))
    qc = oqt.QConfig(
        weights=oqt.QWeightArgs(dtype="int8", group_size=32), ignore=["lm_head"]
    )
    qparams, _ = oqt.quantize(model, params, qc)
    y1 = np.asarray(model(qparams, ids))
    np.testing.assert_allclose(y1, y0, atol=0.1)
