"""Direct tests of the non-linear layers (``nn/layers.py``): embedding,
RMSNorm numerics, and the rotary embedding convention."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from onnx_quantize_tpu.nn.layers import Embedding, RMSNorm, apply_rope


def test_embedding_lookup(rng):
    emb = Embedding(vocab_size=50, features=8)
    params = emb.init(jax.random.key(0))
    ids = jnp.asarray(rng.integers(0, 50, (2, 5)), jnp.int32)
    out = emb(params, ids)
    assert out.shape == (2, 5, 8)
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(params["w"])[np.asarray(ids)]
    )


def test_embedding_not_a_linear_site():
    emb = Embedding(vocab_size=10, features=4)
    emb.finalize()
    assert emb.linear_sites() == []


def test_rmsnorm_matches_formula(rng):
    norm = RMSNorm(features=16, eps=1e-6)
    params = {"w": jnp.asarray(rng.standard_normal(16).astype(np.float32) * 0.1)}
    x = jnp.asarray(rng.standard_normal((3, 16)), jnp.float32)
    out = np.asarray(norm(params, x))
    xn = np.asarray(x)
    want = xn / np.sqrt(np.mean(xn**2, axis=-1, keepdims=True) + 1e-6)
    want = want * (1.0 + np.asarray(params["w"]))
    np.testing.assert_allclose(out, want, rtol=1e-5)


def test_rmsnorm_f32_accumulation_in_bf16(rng):
    """The norm must compute in f32 even for bf16 activations (Gemma rule)."""
    norm = RMSNorm(features=128)
    params = {"w": jnp.zeros(128)}
    x32 = jnp.asarray(rng.standard_normal((2, 128)), jnp.float32) * 30.0
    out16 = norm(params, x32.astype(jnp.bfloat16))
    assert out16.dtype == jnp.bfloat16
    out32 = norm(params, x32)
    # bf16 output of the f32 computation: within one bf16 ulp of the f32 norm
    np.testing.assert_allclose(
        np.asarray(out16, np.float32), np.asarray(out32), rtol=1.6e-2
    )


def test_rope_position_zero_is_identity(rng):
    x = jnp.asarray(rng.standard_normal((1, 1, 2, 16)), jnp.float32)
    pos = jnp.zeros((1, 1), jnp.int32)
    np.testing.assert_allclose(
        np.asarray(apply_rope(x, pos, base=10000.0)), np.asarray(x), atol=1e-6
    )


def test_rope_preserves_norm(rng):
    x = jnp.asarray(rng.standard_normal((2, 3, 2, 32)), jnp.float32)
    pos = jnp.asarray(rng.integers(0, 100, (2, 3)), jnp.int32)
    out = np.asarray(apply_rope(x, pos, base=10000.0))
    # rotation preserves the per-(pair) norm, hence the whole-vector norm
    np.testing.assert_allclose(
        np.linalg.norm(out, axis=-1), np.linalg.norm(np.asarray(x), axis=-1),
        rtol=1e-5,
    )


def test_rope_relative_position_invariance(rng):
    """q(pos+d) . k(pos+d) == q(pos) . k(pos) — the RoPE property attention
    relies on (scores depend only on relative offsets)."""
    D = 16
    q = jnp.asarray(rng.standard_normal((1, 1, 1, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 1, 1, D)), jnp.float32)

    def score(p):
        pos = jnp.full((1, 1), p, jnp.int32)
        qr = np.asarray(apply_rope(q, pos, base=10000.0)).reshape(D)
        kr = np.asarray(apply_rope(k, pos + 5, base=10000.0)).reshape(D)
        return float(qr @ kr)

    assert score(0) == pytest.approx(score(40), rel=1e-4)


def test_rope_neox_halves_convention(rng):
    """Rotate-half: feature i pairs with i + D/2 (not interleaved pairs)."""
    D = 8
    x = np.zeros((1, 1, 1, D), np.float32)
    x[0, 0, 0, 0] = 1.0  # only the first element of the first half
    pos = jnp.full((1, 1), 7, jnp.int32)
    out = np.asarray(apply_rope(jnp.asarray(x), pos, base=10000.0)).reshape(D)
    # energy moves only into the paired slot D/2, the rest stays zero
    nz = np.nonzero(np.abs(out) > 1e-9)[0].tolist()
    assert nz == [0, D // 2]
    assert out[0] == pytest.approx(np.cos(7.0), rel=1e-5)
    assert out[D // 2] == pytest.approx(np.sin(7.0), rel=1e-5)
