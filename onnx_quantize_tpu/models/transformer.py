"""Generic pre-norm transformer LM (GPT-style) — second model family.

BASELINE.json config 2 ("small transformer block, INT8 per-channel weights +
dynamic asymmetric input activations") targets a plain transformer rather than
Gemma; this family shows the quantizer is model-agnostic: standard MHA (with
biases, so attention projections are *Gemm* sites), LayerNorm, GELU MLP,
learned positional embeddings, untied lm_head.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from onnx_quantize_tpu import nn
from onnx_quantize_tpu.nn.layers import Embedding
from onnx_quantize_tpu.nn.module import Context, InputSpec

__all__ = ["TransformerConfig", "TransformerLM"]


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    vocab_size: int = 512
    hidden_size: int = 128
    intermediate_size: int = 512
    num_layers: int = 2
    num_heads: int = 4
    max_seq: int = 256
    layer_norm_eps: float = 1e-5


class LayerNorm(nn.Module):
    def __init__(self, features: int, eps: float):
        super().__init__()
        self.features = features
        self.eps = eps

    def init(self, rng):
        return {
            "w": jnp.ones((self.features,), jnp.float32),
            "b": jnp.zeros((self.features,), jnp.float32),
        }

    def __call__(self, params, x, ctx: Context | None = None):
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        normed = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        return (normed * params["w"] + params["b"]).astype(x.dtype)


class MHA(nn.Module):
    def __init__(self, cfg: TransformerConfig):
        super().__init__()
        self.cfg = cfg
        d = cfg.hidden_size
        self.q_proj = nn.Linear(d, d, use_bias=True)
        self.k_proj = nn.Linear(d, d, use_bias=True)
        self.v_proj = nn.Linear(d, d, use_bias=True)
        self.o_proj = nn.Linear(d, d, use_bias=True)

    def __call__(self, params, x, ctx: Context | None = None):
        cfg = self.cfg
        B, T, d = x.shape
        H = cfg.num_heads
        hd = d // H
        q = self.q_proj(params["q_proj"], x, ctx=ctx).reshape(B, T, H, hd)
        k = self.k_proj(params["k_proj"], x, ctx=ctx).reshape(B, T, H, hd)
        v = self.v_proj(params["v_proj"], x, ctx=ctx).reshape(B, T, H, hd)
        logits = jnp.einsum("bthd,bshd->bhts", q, k) / np.sqrt(hd)
        causal = jnp.tril(jnp.ones((T, T), bool))
        logits = jnp.where(causal[None, None], logits.astype(jnp.float32), -1e30)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhts,bshd->bthd", probs, v).reshape(B, T, d)
        return self.o_proj(params["o_proj"], out, ctx=ctx)


class Block(nn.Module):
    def __init__(self, cfg: TransformerConfig):
        super().__init__()
        self.ln1 = LayerNorm(cfg.hidden_size, cfg.layer_norm_eps)
        self.attn = MHA(cfg)
        self.ln2 = LayerNorm(cfg.hidden_size, cfg.layer_norm_eps)
        self.fc_in = nn.Linear(cfg.hidden_size, cfg.intermediate_size, use_bias=True)
        self.fc_out = nn.Linear(cfg.intermediate_size, cfg.hidden_size, use_bias=True)

    def __call__(self, params, x, ctx: Context | None = None):
        x = x + self.attn(params["attn"], self.ln1(params["ln1"], x), ctx=ctx)
        h = self.fc_in(params["fc_in"], self.ln2(params["ln2"], x), ctx=ctx)
        h = jax.nn.gelu(h)
        return x + self.fc_out(params["fc_out"], h, ctx=ctx)


class TransformerLM(nn.Module):
    def __init__(self, cfg: TransformerConfig = TransformerConfig()):
        super().__init__()
        self.cfg = cfg
        self.embed = Embedding(cfg.vocab_size, cfg.hidden_size)
        self.pos_embed = Embedding(cfg.max_seq, cfg.hidden_size)
        self.blocks = []
        for i in range(cfg.num_layers):
            block = Block(cfg)
            setattr(self, f"h.{i}", block)
            self.blocks.append(block)
        self.ln_f = LayerNorm(cfg.hidden_size, cfg.layer_norm_eps)
        self.lm_head = nn.Linear(cfg.hidden_size, cfg.vocab_size, use_bias=False)
        self.input_specs = [InputSpec("input_ids", (16,), np.int32)]
        self.finalize()

    def __call__(self, params, input_ids, ctx: Context | None = None):
        B, T = input_ids.shape
        pos = jnp.arange(T, dtype=jnp.int32)[None, :]
        x = self.embed(params["embed"], input_ids) + self.pos_embed(
            params["pos_embed"], jnp.broadcast_to(pos, (B, T))
        )
        for i, block in enumerate(self.blocks):
            x = block(params[f"h.{i}"], x, ctx=ctx)
        x = self.ln_f(params["ln_f"], x)
        return self.lm_head(params["lm_head"], x, ctx=ctx)
