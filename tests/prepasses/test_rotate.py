"""Rotation pre-pass (QuaRot-style residual-stream basis change).

The fold must be EXACT in fp (same logits), reject architectures whose
post-norms cannot absorb it, and measurably reduce low-bit quantization
error on models with outlier channels (the entire point of rotating).
"""

import jax
import numpy as np
import pytest

import onnx_quantize_tpu as oqt
from onnx_quantize_tpu.models.gemma3 import Gemma3, Gemma3Config
from onnx_quantize_tpu.models.llama import tiny_llama_config
from onnx_quantize_tpu.models.moe import tiny_moe_config
from onnx_quantize_tpu.prepasses.rotate import (
    random_orthogonal,
    randomized_hadamard,
    rotate_residual_stream,
)
from onnx_quantize_tpu.utils import copy_tree


def _ids(batch=2, seq=16, vocab=256):
    return np.random.default_rng(0).integers(1, vocab, size=(batch, seq)).astype(np.int32)


@pytest.mark.parametrize("n", [64, 96, 80, 33])
@pytest.mark.parametrize("builder", [randomized_hadamard, random_orthogonal])
def test_rotations_are_orthogonal(n, builder):
    r = builder(n, np.random.default_rng(3))
    np.testing.assert_allclose(r @ r.T, np.eye(n), atol=1e-10)


@pytest.mark.parametrize("mode", ["hadamard", "random"])
def test_rotation_preserves_fp_logits(mode, rng):
    """The fold is a pure reparameterization: same logits, llama conventions
    (plain-w norms, GQA) including attention biases (head-space, unfolded)."""
    cfg = tiny_llama_config(num_layers=2, attn_bias=True)
    model = Gemma3(cfg)
    params = model.init(jax.random.key(0))
    ids = _ids()
    ref = np.asarray(model(params, ids))

    rot = (randomized_hadamard if mode == "hadamard" else random_orthogonal)(
        cfg.hidden_size, np.random.default_rng(7)
    )
    rotated = copy_tree(params)
    gains = rotate_residual_stream(model, rotated, rot)
    out = np.asarray(model(rotated, ids))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-4)
    assert ("lm_head",) in gains
    assert ("layers.0", "attn", "q_proj") in gains


def test_rotation_preserves_fp_logits_moe(rng):
    """MoE: router logits change basis with the stream — routing decisions
    and therefore logits must be identical."""
    cfg = tiny_moe_config(num_layers=2, shared_expert_size=48)
    model = Gemma3(cfg)
    params = model.init(jax.random.key(1))
    ids = _ids()
    ref = np.asarray(model(params, ids))
    rotated = copy_tree(params)
    rotate_residual_stream(
        model, rotated, randomized_hadamard(cfg.hidden_size, np.random.default_rng(2))
    )
    out = np.asarray(model(rotated, ids))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-4)


def test_rotation_rejects_sandwich_norms():
    model = Gemma3(Gemma3Config.tiny())  # Gemma default: sandwich norms
    params = model.init(jax.random.key(0))
    with pytest.raises(ValueError, match="sandwich"):
        rotate_residual_stream(
            model, params, randomized_hadamard(model.cfg.hidden_size,
                                               np.random.default_rng(0))
        )


def test_rotation_rejects_non_decoder():
    from tests.helpers import TwoMatMul

    with pytest.raises(ValueError, match="Gemma3-family"):
        rotate_residual_stream(TwoMatMul(), {}, np.eye(16))


def test_rotation_rejects_prescale(rng):
    """Rotate must run BEFORE SmoothQuant (prescale doesn't commute)."""
    cfg = tiny_llama_config(num_layers=1)
    model = Gemma3(cfg)
    params = model.init(jax.random.key(0))
    params["layers.0"]["attn"]["q_proj"]["prescale"] = np.ones(
        cfg.hidden_size, np.float32
    )
    with pytest.raises(ValueError, match="before SmoothQuant"):
        rotate_residual_stream(
            model, params,
            randomized_hadamard(cfg.hidden_size, np.random.default_rng(0)),
        )


def test_rotation_reduces_quantized_error_on_outliers(rng):
    """Outlier input channels blow up per-channel int4 weight scales; the
    rotation spreads them across the hidden dim. Quantized-output error
    (vs the fp oracle) must drop substantially."""
    cfg = tiny_llama_config(num_layers=2)
    model = Gemma3(cfg)
    params = model.init(jax.random.key(3))
    # Inject outlier stream channels: a few columns of every stream-writing
    # projection (and embedding) carry 30x the energy.
    hot = [3, 17, 40]
    for leaf in [params["embed"]] + [
        params[f"layers.{i}"][m][p]
        for i in range(cfg.num_layers)
        for m, p in (("attn", "o_proj"), ("mlp", "down_proj"))
    ]:
        w = np.asarray(leaf["w"]).copy()
        w[:, hot] *= 30.0
        leaf["w"] = w
    ids = _ids()
    ref = np.asarray(model(params, ids))

    qc = oqt.QConfig(weights=oqt.QWeightArgs(dtype="int4"), ignore=["lm_head", "embed"])
    qp_plain, _ = oqt.quantize(model, params, qc)
    err_plain = float(np.mean((np.asarray(model(qp_plain, ids)) - ref) ** 2))

    qc_rot = oqt.QConfig(
        weights=oqt.QWeightArgs(dtype="int4"),
        preprocessors=[oqt.RotateConfig(seed=5)],
        ignore=["lm_head", "embed"],
    )
    qp_rot, _ = oqt.quantize(model, params, qc_rot)
    err_rot = float(np.mean((np.asarray(model(qp_rot, ids)) - ref) ** 2))
    assert err_rot < 0.5 * err_plain, (err_rot, err_plain)


def test_rotate_pass_updates_captured_inputs(rng):
    """With static input activations the pass must move captured inputs to
    the rotated basis and the whole pipeline must stay close to fp."""
    cfg = tiny_llama_config(num_layers=1)
    model = Gemma3(cfg)
    params = model.init(jax.random.key(4))
    ids = _ids(batch=4, seq=8)
    ref = np.asarray(model(params, ids))
    qc = oqt.QConfig(
        weights=oqt.QWeightArgs(dtype="int8"),
        input_activations=oqt.QActivationArgs(dtype="int8"),
        preprocessors=[oqt.RotateConfig()],
        calibration_data=ids,
        ignore=["lm_head", "embed"],
    )
    qparams, plan = oqt.quantize(model, params, qc)
    out = np.asarray(model(qparams, ids))
    assert np.isfinite(out).all()
    # int8 weights + acts on a tiny model: top-1 should broadly agree.
    agree = (out.argmax(-1) == ref.argmax(-1)).mean()
    assert agree > 0.8


def test_rotate_composes_with_awq(rng):
    """rotate -> AWQ: AWQ consumes rotated captured inputs and must still
    produce a model at least as accurate as rotate-only RTN."""
    cfg = tiny_llama_config(num_layers=2)
    model = Gemma3(cfg)
    params = model.init(jax.random.key(5))
    ids = _ids(batch=4, seq=8)
    ref = np.asarray(model(params, ids))
    common = dict(
        weights=oqt.QWeightArgs(dtype="uint4", group_size=16),
        calibration_data=ids,
        ignore=["lm_head", "embed"],
    )
    qp_rot, _ = oqt.quantize(
        model, params, oqt.QConfig(preprocessors=[oqt.RotateConfig()], **common)
    )
    qp_both, _ = oqt.quantize(
        model, params,
        oqt.QConfig(preprocessors=[oqt.RotateConfig(), oqt.AwqConfig()], **common),
    )
    err_rot = float(np.mean((np.asarray(model(qp_rot, ids)) - ref) ** 2))
    err_both = float(np.mean((np.asarray(model(qp_both, ids)) - ref) ** 2))
    # On random-init weights rotation already removes the structure AWQ
    # exploits, so the composition is a wash — the claim here is consistency
    # (AWQ ran on rotated captured inputs without corrupting the model),
    # not improvement.
    assert err_both <= err_rot * 1.5


def test_rotate_composes_with_gptq(rng):
    """rotate -> GPTQ: post-calibration re-captures inputs from the ROTATED
    model, so GPTQ's Hessian is built in the rotated basis. GPTQ must still
    beat rotate-only RTN at the same config (its usual guarantee)."""
    cfg = tiny_llama_config(num_layers=2)
    model = Gemma3(cfg)
    params = model.init(jax.random.key(6))
    ids = _ids(batch=4, seq=8)
    ref = np.asarray(model(params, ids))
    common = dict(calibration_data=ids, ignore=["lm_head", "embed"])
    qp_rtn, _ = oqt.quantize(model, params, oqt.QConfig(
        weights=oqt.QWeightArgs(dtype="uint4", group_size=16),
        preprocessors=[oqt.RotateConfig()], **common))
    qp_gptq, _ = oqt.quantize(model, params, oqt.QConfig(
        weights=oqt.QWeightArgs(dtype="uint4", group_size=16,
                                algorithm=oqt.GPTQConfig()),
        preprocessors=[oqt.RotateConfig()], **common))
    err_rtn = float(np.mean((np.asarray(model(qp_rtn, ids)) - ref) ** 2))
    err_gptq = float(np.mean((np.asarray(model(qp_gptq, ids)) - ref) ** 2))
    assert err_gptq <= err_rtn * 1.05, (err_gptq, err_rtn)


def test_rotation_recovers_activation_quant_error(rng):
    """The OTHER QuaRot claim: rotation tames ACTIVATION outliers. Outlier
    stream channels make per-tensor static int8 activation scales terrible;
    rotating the stream spreads them before the activation quantizer sees
    them."""
    cfg = tiny_llama_config(num_layers=2)
    model = Gemma3(cfg)
    params = model.init(jax.random.key(7))
    hot = [3, 17, 40]
    for leaf in [params["embed"]] + [
        params[f"layers.{i}"][m][p]
        for i in range(cfg.num_layers)
        for m, p in (("attn", "o_proj"), ("mlp", "down_proj"))
    ]:
        w = np.asarray(leaf["w"]).copy()
        w[:, hot] *= 30.0
        leaf["w"] = w
    ids = _ids(batch=4, seq=8)
    ref = np.asarray(model(params, ids))
    common = dict(
        weights=oqt.QWeightArgs(dtype="int8"),
        input_activations=oqt.QActivationArgs(dtype="int8"),
        calibration_data=ids,
        ignore=["lm_head", "embed"],
    )
    qp_plain, _ = oqt.quantize(model, params, oqt.QConfig(**common))
    qp_rot, _ = oqt.quantize(model, params, oqt.QConfig(
        preprocessors=[oqt.RotateConfig(seed=9)], **common))
    err_plain = float(np.mean((np.asarray(model(qp_plain, ids)) - ref) ** 2))
    err_rot = float(np.mean((np.asarray(model(qp_rot, ids)) - ref) ** 2))
    assert err_rot < 0.5 * err_plain, (err_rot, err_plain)
