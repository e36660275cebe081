"""Llama-family coverage on the shared decoder.

The family reuses the Gemma-3 decoder with convention switches
(``models/llama.py``); these tests pin (a) gold logits parity against a
random-init HF ``LlamaForCausalLM`` — transposes, plain-w RMSNorm, pre-norm
residual structure, SiLU, GQA, rope scaling all at once — and (b) that the
existing quantize → engine → serve stack runs the family unchanged.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import onnx_quantize_tpu as oqt
from onnx_quantize_tpu.engine import ContinuousBatchingScheduler, InferenceEngine
from onnx_quantize_tpu.models.llama import (
    Llama,
    llama_config,
    load_llama_hf,
    tiny_llama_config,
)

safetensors_numpy = pytest.importorskip("safetensors.numpy")

CFG = tiny_llama_config(
    vocab_size=128, hidden_size=32, intermediate_size=64, num_layers=2,
    num_heads=2, num_kv_heads=1, head_dim=16,
)


def test_llama_config_conventions():
    cfg = llama_config(
        vocab_size=100, hidden_size=64, intermediate_size=128, num_layers=2,
        num_heads=4, num_kv_heads=2,
    )
    assert not cfg.use_qk_norm and not cfg.sandwich_norms
    assert cfg.mlp_activation == "silu" and not cfg.scale_embeddings
    assert not cfg.rms_one_plus
    assert cfg.head_dim == 16  # derived hidden/num_heads
    assert cfg.query_pre_attn_scalar == 16.0  # 1/sqrt(head_dim)
    # Every layer is global attention.
    assert all(cfg.is_global_layer(i) for i in range(cfg.num_layers))


def test_param_tree_has_no_gemma_only_modules():
    model = Llama(CFG)
    params = model.init(jax.random.key(0))
    attn = params["layers.0"]["attn"]
    assert "q_norm" not in attn and "k_norm" not in attn
    assert "post_attn_norm" not in params["layers.0"]
    assert "post_ffn_norm" not in params["layers.0"]
    # Llama RMSNorm gain is plain-w, ones-init.
    assert np.allclose(np.asarray(params["layers.0"]["input_norm"]["w"]), 1.0)


@pytest.mark.parametrize("rope_scaling", [None, (8.0, 1.0, 4.0, 64)])
def test_import_reproduces_hf_logits(tmp_path, rope_scaling):
    """Gold parity vs transformers' LlamaForCausalLM at f32."""
    torch = pytest.importorskip("torch")
    tfm = pytest.importorskip("transformers")

    cfg = tiny_llama_config(
        vocab_size=128, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=2, num_kv_heads=1, head_dim=16, rope_scaling=rope_scaling,
    )
    rs = None
    if rope_scaling is not None:
        factor, low, high, orig = rope_scaling
        rs = {
            "rope_type": "llama3", "factor": factor, "low_freq_factor": low,
            "high_freq_factor": high, "original_max_position_embeddings": orig,
        }
    hf_cfg = tfm.LlamaConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim,
        rope_theta=cfg.rope_theta,
        rope_scaling=rs,
        rms_norm_eps=cfg.rms_norm_eps,
        tie_word_embeddings=True,
        attention_dropout=0.0,
        attention_bias=False,
        mlp_bias=False,
    )
    torch.manual_seed(0)
    hf_model = tfm.LlamaForCausalLM(hf_cfg).eval().to(torch.float32)
    hf_model.save_pretrained(tmp_path / "hf", safe_serialization=True)

    ids = np.array([[3, 17, 91, 4, 4, 55, 18, 2, 77, 30]], np.int32)
    with torch.no_grad():
        ref = hf_model(torch.from_numpy(ids).long()).logits.float().numpy()

    model = Llama(cfg)
    params = load_llama_hf(model, str(tmp_path / "hf"))
    ours = np.asarray(model(params, jnp.asarray(ids)), np.float32)

    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-4)
    np.testing.assert_array_equal(ours.argmax(-1), ref.argmax(-1))


def test_untied_lm_head_import(tmp_path):
    torch = pytest.importorskip("torch")
    tfm = pytest.importorskip("transformers")
    cfg = tiny_llama_config(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=1,
        num_heads=2, num_kv_heads=2, head_dim=16, tie_lm_head=False,
    )
    hf_cfg = tfm.LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=2,
        head_dim=16, rope_theta=cfg.rope_theta, rms_norm_eps=cfg.rms_norm_eps,
        tie_word_embeddings=False, attention_bias=False, mlp_bias=False,
    )
    torch.manual_seed(1)
    hf_model = tfm.LlamaForCausalLM(hf_cfg).eval().to(torch.float32)
    hf_model.save_pretrained(tmp_path / "hf", safe_serialization=True)
    model = Llama(cfg)
    params = load_llama_hf(model, str(tmp_path / "hf"))
    head = np.asarray(params["lm_head"]["w"])
    emb = np.asarray(params["embed"]["w"])
    assert not np.allclose(head, emb.T)
    ids = np.array([[5, 9, 3, 3]], np.int32)
    with torch.no_grad():
        ref = hf_model(torch.from_numpy(ids).long()).logits.float().numpy()
    ours = np.asarray(model(params, jnp.asarray(ids)), np.float32)
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-4)


def test_quantized_llama_serves_through_the_engine():
    """W4 quantization + int8-KV engine + pipelined serve rounds run the
    family with zero new execution code; greedy chunked output matches the
    per-step loop."""
    model = Llama(CFG)
    params = model.init(jax.random.key(0))
    qparams, _ = oqt.quantize(model, params, oqt.QConfig(
        weights=oqt.QWeightArgs(dtype="uint4", group_size=16)))
    from onnx_quantize_tpu.nn.qtensor import QTensor

    assert isinstance(qparams["layers.0"]["attn"]["q_proj"]["w"], QTensor)

    def run(chunk, pipeline=1):
        engine = InferenceEngine(model, qparams, max_batch=2, max_seq=48,
                                 kv_quant=True)
        sched = ContinuousBatchingScheduler(engine, chunk=chunk, pipeline=pipeline)
        handles = [
            sched.submit([5, 9, 17], max_new_tokens=8),
            sched.submit([3, 2, 77, 8], max_new_tokens=6),
        ]
        sched.run()
        return [r.output for r in handles]

    base = run(1)
    assert run(4) == base
    assert run(4, pipeline=2) == base
    assert all(len(o) > 0 for o in base)


def test_quantized_output_close_to_fp():
    model = Llama(CFG)
    params = model.init(jax.random.key(1))
    qparams, _ = oqt.quantize(model, params, oqt.QConfig(
        weights=oqt.QWeightArgs(dtype="int8", group_size=-1)))
    ids = np.arange(1, 9, dtype=np.int32).reshape(1, 8)
    fp = np.asarray(model(params, ids))
    q = np.asarray(model(qparams, ids))
    rel = np.abs(q - fp).max() / (np.abs(fp).max() + 1e-9)
    assert rel < 0.05, rel


# ── Qwen-2.5 (attention biases) on the same decoder ──────────────────────


def test_qwen_import_reproduces_hf_logits(tmp_path):
    """Gold parity vs transformers' Qwen2ForCausalLM: q/k/v biases, GQA,
    theta-1e6 rope, tied head — all on the shared decoder."""
    torch = pytest.importorskip("torch")
    tfm = pytest.importorskip("transformers")

    cfg = llama_config(
        vocab_size=128, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=2, num_kv_heads=1, rope_theta=1_000_000.0,
        rms_norm_eps=1e-6, attn_bias=True,
    )
    hf_cfg = tfm.Qwen2Config(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads,
        rope_theta=cfg.rope_theta,
        rms_norm_eps=cfg.rms_norm_eps,
        tie_word_embeddings=True,
        attention_dropout=0.0,
    )
    torch.manual_seed(2)
    hf_model = tfm.Qwen2ForCausalLM(hf_cfg).eval().to(torch.float32)
    # Random biases (init is zeros) so the bias path is actually exercised.
    with torch.no_grad():
        for layer in hf_model.model.layers:
            for p in (layer.self_attn.q_proj, layer.self_attn.k_proj,
                      layer.self_attn.v_proj):
                p.bias.normal_(0.0, 0.5)
    hf_model.save_pretrained(tmp_path / "hf", safe_serialization=True)

    ids = np.array([[3, 17, 91, 4, 4, 55, 18, 2]], np.int32)
    with torch.no_grad():
        ref = hf_model(torch.from_numpy(ids).long()).logits.float().numpy()

    model = Llama(cfg)
    params = load_llama_hf(model, str(tmp_path / "hf"))
    # Biases imported (non-zero) into the Gemm sites.
    assert np.abs(np.asarray(params["layers.0"]["attn"]["q_proj"]["b"])).max() > 0
    ours = np.asarray(model(params, jnp.asarray(ids)), np.float32)
    np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=3e-4)
    np.testing.assert_array_equal(ours.argmax(-1), ref.argmax(-1))


def test_qwen_quantizes_as_gemm_sites():
    """Biased q/k/v are "Gemm" sites: weight + bias quantization applies."""
    cfg = llama_config(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=1,
        num_heads=2, num_kv_heads=1, attn_bias=True,
    )
    model = Llama(cfg)
    sites = {s.name: s.op_type for s in model.linear_sites()}
    assert sites["layers.0.attn.q_proj"] == "Gemm"
    assert sites["layers.0.attn.o_proj"] == "MatMul"

    params = model.init(jax.random.key(0))
    qparams, _ = oqt.quantize(model, params, oqt.QConfig(
        weights=oqt.QWeightArgs(dtype="int8", group_size=-1)))
    ids = np.arange(1, 7, dtype=np.int32).reshape(1, 6)
    fp = np.asarray(model(params, ids))
    q = np.asarray(model(qparams, ids))
    rel = np.abs(q - fp).max() / (np.abs(fp).max() + 1e-9)
    assert rel < 0.05, rel
