"""Non-linear-site layers used by the model zoo (embedding, norms, rotary)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from onnx_quantize_tpu.nn.module import Context, Module

__all__ = ["Embedding", "RMSNorm", "apply_rope"]


class Embedding(Module):
    """Token embedding (a Gather — not a quantizable matmul site, matching the
    reference's MatMul/Gemm-only targeting)."""

    def __init__(self, vocab_size: int, features: int, dtype=jnp.float32):
        super().__init__()
        self.vocab_size = vocab_size
        self.features = features
        self.dtype = dtype
        # Tensor-parallel marker: when set (inside shard_map), the table is
        # vocab-row-sharded over this axis; the lookup masks out-of-shard ids
        # and psums the partial embeddings.
        self.tp_vocab_axis: str | None = None

    def init(self, rng: jax.Array) -> dict:
        w = jax.random.normal(rng, (self.vocab_size, self.features)) * 0.02
        return {"w": w.astype(self.dtype)}

    def __call__(self, params, ids, ctx: Context | None = None):
        w = params["w"]
        if self.tp_vocab_axis is not None:
            axis = self.tp_vocab_axis
            rows_local = w.shape[0]
            start = jax.lax.axis_index(axis) * rows_local
            local = ids - start
            valid = (local >= 0) & (local < rows_local)
            emb = jnp.take(w, jnp.clip(local, 0, rows_local - 1), axis=0)
            emb = jnp.where(valid[..., None], emb, 0)
            return jax.lax.psum(emb, axis)
        return jnp.take(w, ids, axis=0)


class RMSNorm(Module):
    """RMSNorm with f32 accumulation.

    ``one_plus=True`` (Gemma convention): gain is ``1 + w``, zero-init.
    ``one_plus=False`` (Llama convention): gain is ``w``, ones-init.
    """

    def __init__(self, features: int, eps: float = 1e-6, dtype=jnp.float32,
                 one_plus: bool = True):
        super().__init__()
        self.features = features
        self.eps = eps
        self.dtype = dtype
        self.one_plus = one_plus

    def init(self, rng: jax.Array) -> dict:
        if self.one_plus:
            return {"w": jnp.zeros((self.features,), dtype=self.dtype)}
        return {"w": jnp.ones((self.features,), dtype=self.dtype)}

    def __call__(self, params, x, ctx: Context | None = None):
        x32 = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
        normed = x32 * jax.lax.rsqrt(var + self.eps)
        gain = params["w"].astype(jnp.float32)
        out = normed * ((1.0 + gain) if self.one_plus else gain)
        return out.astype(x.dtype)


def apply_rope(x: jnp.ndarray, positions: jnp.ndarray, base: float,
               scaling: tuple | None = None) -> jnp.ndarray:
    """Rotary position embedding, neox rotate-half convention.

    x: (B, T, num_heads, head_dim); positions: (B, T).
    ``scaling``: llama3-style frequency scaling as ``(factor,
    low_freq_factor, high_freq_factor, original_max_position)``: wavelengths
    beyond ``orig/low`` divide by ``factor``, below ``orig/high`` are kept,
    and the band between interpolates smoothly (the Llama-3.x long-context
    remap).
    """
    head_dim = x.shape[-1]
    half = head_dim // 2
    freq_exponents = jnp.arange(half, dtype=jnp.float32) * (2.0 / head_dim)
    inv_freq = 1.0 / (base ** freq_exponents)  # (half,)
    if scaling is not None:
        factor, low_f, high_f, orig_ctx = scaling
        wavelen = 2.0 * jnp.pi / inv_freq
        smooth = (orig_ctx / wavelen - low_f) / (high_f - low_f)
        smooth = jnp.clip(smooth, 0.0, 1.0)
        inv_freq = (1.0 - smooth) * inv_freq / factor + smooth * inv_freq
    angles = positions[..., None].astype(jnp.float32) * inv_freq[None, None, :]
    cos = jnp.cos(angles)[:, :, None, :]  # (B, T, 1, half)
    sin = jnp.sin(angles)[:, :, None, :]
    x1, x2 = x[..., :half], x[..., half:]
    out = jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
    )
    return out.astype(x.dtype)
