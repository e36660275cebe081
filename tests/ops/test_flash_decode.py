"""Fused int8-KV flash-decode kernel vs the jnp dequantize-then-attend oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from onnx_quantize_tpu.ops.kernels.flash_decode import (
    flash_decode_int8,
    flash_decode_int8_reference,
)


def _random_case(rng, B=2, S=256, Hq=4, Hkv=1, D=128):
    q = rng.standard_normal((B, Hq, D)).astype(np.float32) * 0.3
    k_q = rng.integers(-127, 128, size=(B, S, Hkv, D)).astype(np.int8)
    v_q = rng.integers(-127, 128, size=(B, S, Hkv, D)).astype(np.int8)
    k_s = (0.01 + 0.02 * rng.random((B, S, Hkv))).astype(np.float32)
    v_s = (0.01 + 0.02 * rng.random((B, S, Hkv))).astype(np.float32)
    return (jnp.asarray(q), jnp.asarray(k_q), jnp.asarray(k_s),
            jnp.asarray(v_q), jnp.asarray(v_s))


@pytest.mark.parametrize("batched", [True, False])
@pytest.mark.parametrize("window", [None, 64])
def test_flash_decode_matches_reference(rng, window, batched):
    q, k_q, k_s, v_q, v_s = _random_case(rng)
    pos = jnp.asarray([200, 37], jnp.int32)  # ragged lengths across blocks
    out = flash_decode_int8(q, k_q, k_s, v_q, v_s, pos, window=window, bs=128,
                            batched=batched)
    ref = flash_decode_int8_reference(q, k_q, k_s, v_q, v_s, pos, window=window)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5)


def test_flash_decode_gqa_groups(rng):
    """Hkv > 1 with grouped query heads."""
    q, k_q, k_s, v_q, v_s = _random_case(rng, Hq=8, Hkv=2)
    pos = jnp.asarray([255, 128], jnp.int32)
    out = flash_decode_int8(q, k_q, k_s, v_q, v_s, pos, batched=True)
    ref = flash_decode_int8_reference(q, k_q, k_s, v_q, v_s, pos)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5)


def test_flash_decode_pos_zero(rng):
    """A sequence whose only live key is slot 0 (first decode step)."""
    q, k_q, k_s, v_q, v_s = _random_case(rng, S=128)
    pos = jnp.asarray([0, 5], jnp.int32)
    out = flash_decode_int8(q, k_q, k_s, v_q, v_s, pos)
    ref = flash_decode_int8_reference(q, k_q, k_s, v_q, v_s, pos)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5)


def test_flash_decode_window_smaller_than_block(rng):
    q, k_q, k_s, v_q, v_s = _random_case(rng, S=512)
    pos = jnp.asarray([511, 300], jnp.int32)
    out = flash_decode_int8(q, k_q, k_s, v_q, v_s, pos, window=32)
    ref = flash_decode_int8_reference(q, k_q, k_s, v_q, v_s, pos, window=32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5)
