"""Gold-parity tests for the MoE family against transformers' reference
implementations (random-init, f32): a tiny ``Qwen2MoeForCausalLM`` and
``MixtralForCausalLM`` are saved with ``save_pretrained`` and re-imported —
logit equality pins the router softmax/top-k convention, ``norm_topk_prob``,
the sigmoid-gated shared expert, transposes, and all decoder conventions in
one shot (the same gold structure as ``tests/models/test_llama.py``)."""

import jax.numpy as jnp
import numpy as np
import pytest

from onnx_quantize_tpu.models.moe import (
    MoE,
    load_mixtral_hf,
    load_qwen_moe_hf,
    moe_config,
)

pytest.importorskip("safetensors.numpy")


def test_qwen_moe_import_reproduces_hf_logits(tmp_path):
    torch = pytest.importorskip("torch")
    tfm = pytest.importorskip("transformers")

    cfg = moe_config(
        num_experts=4, num_experts_per_tok=2, moe_intermediate_size=48,
        shared_expert_size=64, norm_topk_prob=False,
        vocab_size=128, hidden_size=32, intermediate_size=48, num_layers=2,
        num_heads=2, num_kv_heads=1, head_dim=16, rope_theta=10_000.0,
        rms_norm_eps=1e-6, attn_bias=True, tie_lm_head=False,
    )
    hf_cfg = tfm.Qwen2MoeConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads,
        num_experts=cfg.num_experts,
        num_experts_per_tok=cfg.num_experts_per_tok,
        moe_intermediate_size=cfg.moe_intermediate_size,
        shared_expert_intermediate_size=cfg.shared_expert_size,
        norm_topk_prob=cfg.norm_topk_prob,
        decoder_sparse_step=1,
        rope_theta=cfg.rope_theta,
        rms_norm_eps=cfg.rms_norm_eps,
        tie_word_embeddings=False,
        attention_dropout=0.0,
        output_router_logits=False,
    )
    torch.manual_seed(0)
    hf_model = tfm.Qwen2MoeForCausalLM(hf_cfg).eval().to(torch.float32)
    hf_model.save_pretrained(tmp_path / "hf", safe_serialization=True)

    ids = np.array([[3, 17, 91, 4, 4, 55, 18, 2, 77, 30]], np.int32)
    with torch.no_grad():
        ref = hf_model(torch.from_numpy(ids).long()).logits.float().numpy()

    model = MoE(cfg)
    params = load_qwen_moe_hf(model, str(tmp_path / "hf"))
    ours = np.asarray(model(params, jnp.asarray(ids)), np.float32)

    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=3e-4)
    np.testing.assert_array_equal(ours.argmax(-1), ref.argmax(-1))


def test_mixtral_import_reproduces_hf_logits(tmp_path):
    torch = pytest.importorskip("torch")
    tfm = pytest.importorskip("transformers")

    cfg = moe_config(
        num_experts=4, num_experts_per_tok=2, moe_intermediate_size=64,
        shared_expert_size=0, norm_topk_prob=True,
        vocab_size=128, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=2, num_kv_heads=1, head_dim=16, rope_theta=10_000.0,
        rms_norm_eps=1e-5, attn_bias=False, tie_lm_head=False,
    )
    hf_cfg = tfm.MixtralConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.moe_intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads,
        num_local_experts=cfg.num_experts,
        num_experts_per_tok=cfg.num_experts_per_tok,
        rope_theta=cfg.rope_theta,
        rms_norm_eps=cfg.rms_norm_eps,
        tie_word_embeddings=False,
        attention_dropout=0.0,
        output_router_logits=False,
        sliding_window=None,
    )
    torch.manual_seed(1)
    hf_model = tfm.MixtralForCausalLM(hf_cfg).eval().to(torch.float32)
    hf_model.save_pretrained(tmp_path / "hf", safe_serialization=True)

    ids = np.array([[5, 9, 3, 3, 100, 42, 7, 68]], np.int32)
    with torch.no_grad():
        ref = hf_model(torch.from_numpy(ids).long()).logits.float().numpy()

    model = MoE(cfg)
    params = load_mixtral_hf(model, str(tmp_path / "hf"))
    ours = np.asarray(model(params, jnp.asarray(ids)), np.float32)

    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=3e-4)
    np.testing.assert_array_equal(ours.argmax(-1), ref.argmax(-1))
