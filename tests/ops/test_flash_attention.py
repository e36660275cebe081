import numpy as np
import pytest

import jax
import jax.numpy as jnp

from onnx_quantize_tpu.ops.kernels.flash_attention import flash_attention


def _reference_attention(q, k, v, causal=True, window=None):
    B, T, Hq, D = q.shape
    S, Hkv = k.shape[1], k.shape[2]
    group = Hq // Hkv
    qg = q.reshape(B, T, Hkv, group, D)
    logits = jnp.einsum("btkgh,bskh->bkgts", qg, k).astype(jnp.float32)
    rows = jnp.arange(T)[:, None]
    cols = jnp.arange(S)[None, :]
    mask = cols <= rows
    if window is not None:
        mask = mask & (cols > rows - window)
    logits = jnp.where(mask[None, None, None], logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bkgts,bskh->btkgh", probs, v)
    return np.asarray(out.reshape(B, T, Hq, D))


@pytest.mark.parametrize("window", [None, 16])
@pytest.mark.parametrize("Hq, Hkv", [(4, 1), (2, 2)])
def test_flash_matches_reference(rng, window, Hq, Hkv):
    B, T, D = 2, 64, 32
    q = jnp.asarray(rng.standard_normal((B, T, Hq, D)).astype(np.float32)) * 0.3
    k = jnp.asarray(rng.standard_normal((B, T, Hkv, D)).astype(np.float32)) * 0.3
    v = jnp.asarray(rng.standard_normal((B, T, Hkv, D)).astype(np.float32))
    out = np.asarray(
        flash_attention(q, k, v, sliding_window=window, bt=16, bs=16, interpret=True)
    )
    ref = _reference_attention(q, k, v, window=window)
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_flash_block_sizes_do_not_change_result(rng):
    B, T, Hq, Hkv, D = 1, 64, 2, 1, 32
    q = jnp.asarray(rng.standard_normal((B, T, Hq, D)).astype(np.float32)) * 0.3
    k = jnp.asarray(rng.standard_normal((B, T, Hkv, D)).astype(np.float32)) * 0.3
    v = jnp.asarray(rng.standard_normal((B, T, Hkv, D)).astype(np.float32))
    a = np.asarray(flash_attention(q, k, v, bt=16, bs=32, interpret=True))
    b = np.asarray(flash_attention(q, k, v, bt=64, bs=16, interpret=True))
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_gemma_model_flash_path_matches_dense(rng):
    from onnx_quantize_tpu.models.gemma3 import Gemma3, Gemma3Config

    cfg = Gemma3Config.tiny(sliding_window=16, sliding_pattern=2)
    model = Gemma3(cfg)
    params = model.init(jax.random.key(0))
    ids = rng.integers(1, 250, size=(2, 32)).astype(np.int32)
    dense = np.asarray(model(params, ids))
    model.use_flash = True
    try:
        flash = np.asarray(model(params, ids))
    finally:
        model.use_flash = "auto"
    np.testing.assert_allclose(flash, dense, atol=5e-4)
