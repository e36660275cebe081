"""Direct unit tier for engine/kv_cache.py (write/read/quantize semantics).

The engine e2e tests cover the cache indirectly; these pin the module's own
contract — single-scatter writes (round-2 rewrite), drop-mode capacity
behavior, per-(token,head) symmetric int8 quantization, and f32 scale math
under a bf16 stream.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from onnx_quantize_tpu.engine.kv_cache import (
    KVCacheConfig,
    _quantize_sym,
    init_cache,
    read_kv,
    read_kv_quantized,
    write_kv,
)


def _cfg(quantized, L=2, B=3, S=8, H=2, D=4, bits=8):
    return KVCacheConfig(num_layers=L, batch=B, max_seq=S, num_kv_heads=H,
                         head_dim=D, quantized=quantized, bits=bits)


@pytest.mark.parametrize("quantized", [False, True])
def test_init_shapes(quantized):
    cache = init_cache(_cfg(quantized))
    assert cache["k"].shape == (2, 3, 8, 2, 4)
    assert cache["lengths"].shape == (3,)
    assert ("k_scale" in cache) == quantized
    if quantized:
        assert cache["k"].dtype == jnp.int8
        assert cache["k_scale"].shape == (2, 3, 8, 2)


def test_write_lands_at_positions_and_only_that_layer(rng):
    cache = init_cache(_cfg(False))
    k = jnp.asarray(rng.standard_normal((3, 2, 2, 4)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((3, 2, 2, 4)), jnp.float32)
    positions = jnp.asarray([[0, 1], [2, 3], [5, 6]], jnp.int32)
    new = write_kv(cache, 1, k, v, positions)
    # layer 0 untouched
    assert not np.asarray(new["k"][0]).any()
    out = np.asarray(new["k"][1])
    for b in range(3):
        for t in range(2):
            np.testing.assert_array_equal(out[b, int(positions[b, t])], k[b, t])
    # everything else in layer 1 stays zero
    mask = np.ones((3, 8), bool)
    for b in range(3):
        mask[b, np.asarray(positions)[b]] = False
    assert not out[mask].any()


def test_write_at_capacity_drops(rng):
    """positions == max_seq (sequences at capacity / inactive slots) must
    drop the write, not clamp onto the last slot (engine._decode_impl)."""
    cache = init_cache(_cfg(True))
    k = jnp.asarray(rng.standard_normal((3, 1, 2, 4)), jnp.float32)
    positions = jnp.asarray([[8], [3], [8]], jnp.int32)  # 8 == max_seq
    new = write_kv(cache, 0, k, k, positions)
    out = np.asarray(new["k"][0])
    assert not out[0].any() and not out[2].any()  # dropped
    assert out[1, 3].any()                         # in-range write landed


def test_quantize_roundtrip_error_bound(rng):
    x = jnp.asarray(rng.standard_normal((3, 1, 2, 4)) * 5.0, jnp.float32)
    q, scale = _quantize_sym(x)
    assert q.dtype == jnp.int8 and scale.dtype == jnp.float32
    dq = np.asarray(q, np.float32) * np.asarray(scale)[..., None]
    # Symmetric int8: |err| <= scale/2 per element.
    assert np.all(np.abs(dq - np.asarray(x)) <= np.asarray(scale)[..., None] / 2 + 1e-7)


def test_quantize_sym_f32_scales_under_bf16_stream(rng):
    x32 = jnp.asarray(rng.standard_normal((2, 1, 2, 4)), jnp.float32)
    q32, s32 = _quantize_sym(x32)
    qbf, sbf = _quantize_sym(x32.astype(jnp.bfloat16))
    assert sbf.dtype == jnp.float32
    # bf16 input only costs input rounding, not scale-math precision.
    np.testing.assert_allclose(np.asarray(sbf), np.asarray(s32), rtol=1e-2)


def test_read_kv_dequantizes(rng):
    cache = init_cache(_cfg(True))
    k = jnp.asarray(rng.standard_normal((3, 2, 2, 4)), jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(2, dtype=jnp.int32)[None], (3, 2))
    cache = write_kv(cache, 0, k, k, positions)
    kf, vf = read_kv(cache, 0)
    np.testing.assert_allclose(np.asarray(kf[:, :2]), np.asarray(k), atol=0.05)
    qv = read_kv_quantized(cache, 0)
    manual = np.asarray(qv.k, np.float32) * np.asarray(qv.k_scale)[..., None]
    np.testing.assert_allclose(np.asarray(kf), manual, rtol=1e-6)


# ── int4 (packed) cache ──────────────────────────────────────────────────────


def test_int4_init_shapes():
    cache = init_cache(_cfg(True, bits=4))
    assert cache["k"].shape == (2, 3, 8, 2, 2)  # D/2 packed bytes
    assert cache["k"].dtype == jnp.uint8
    assert cache["k_scale"].shape == (2, 3, 8, 2)


def test_int4_rejects_odd_head_dim_and_bad_bits():
    with pytest.raises(ValueError, match="even head_dim"):
        init_cache(_cfg(True, bits=4, D=5))
    with pytest.raises(ValueError, match="bits"):
        init_cache(_cfg(True, bits=3))


def test_nibble_pack_roundtrip(rng):
    from onnx_quantize_tpu.engine.kv_cache import pack_nibbles, unpack_nibbles

    q = jnp.asarray(rng.integers(-8, 8, size=(3, 5, 2, 6)), jnp.int8)
    packed = pack_nibbles(q)
    assert packed.dtype == jnp.uint8 and packed.shape == (3, 5, 2, 3)
    np.testing.assert_array_equal(np.asarray(unpack_nibbles(packed)), np.asarray(q))


def test_int4_quantize_roundtrip_error_bound(rng):
    from onnx_quantize_tpu.engine.kv_cache import _quantize_sym4, unpack_nibbles

    x = jnp.asarray(rng.standard_normal((3, 1, 2, 4)) * 5.0, jnp.float32)
    packed, scale = _quantize_sym4(x)
    dq = np.asarray(unpack_nibbles(packed), np.float32) * np.asarray(scale)[..., None]
    # Symmetric ±7 levels: |err| <= scale/2 per element.
    assert np.all(np.abs(dq - np.asarray(x)) <= np.asarray(scale)[..., None] / 2 + 1e-6)


def test_int4_write_read_dequantizes(rng):
    cache = init_cache(_cfg(True, bits=4))
    k = jnp.asarray(rng.standard_normal((3, 2, 2, 4)), jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(2, dtype=jnp.int32)[None], (3, 2))
    cache = write_kv(cache, 0, k, k, positions)
    kf, _ = read_kv(cache, 0)
    # ±7 levels: per-element error <= absmax/14 over the (token, head) row.
    absmax = np.abs(np.asarray(k)).max(-1, keepdims=True)
    assert np.all(np.abs(np.asarray(kf[:, :2]) - np.asarray(k)) <= absmax / 14 + 1e-6)
    qv = read_kv_quantized(cache, 0)
    manual = np.asarray(qv.k_ints(), np.float32) * np.asarray(qv.k_scale)[..., None]
    np.testing.assert_allclose(np.asarray(kf), manual, rtol=1e-6)


def test_int4_write_at_capacity_drops(rng):
    cache = init_cache(_cfg(True, bits=4))
    k = jnp.asarray(rng.standard_normal((3, 1, 2, 4)), jnp.float32)
    positions = jnp.asarray([[8], [3], [8]], jnp.int32)
    new = write_kv(cache, 0, k, k, positions)
    out = np.asarray(new["k"][0])
    assert not out[0].any() and not out[2].any()
    assert out[1, 3].any()
