"""Fused W4 MLP megakernel vs the jnp oracle (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from onnx_quantize_tpu.algorithms.rtn import rtn_quantize
from onnx_quantize_tpu.core.dtypes import QuantType
from onnx_quantize_tpu.core.enums import QuantizationStrategy
from onnx_quantize_tpu.nn.qtensor import make_qtensor
from onnx_quantize_tpu.ops.kernels.mlp_w4 import (
    mlp_w4_eligible,
    mlp_w4_fused,
    mlp_w4_reference,
)


def _qt(w, dtype, gs):
    q, s, z = rtn_quantize(
        np.asarray(w), dtype, QuantizationStrategy.GROUP, gs,
        dtype.is_signed, False,
    )
    return make_qtensor(
        q, s, z, quant_type=dtype, strategy=QuantizationStrategy.GROUP,
        group_size=gs, symmetric=dtype.is_signed, reduce_range=False,
    )


def _mlp_pair(rng, K=128, inter=256, gs=64, dtype=QuantType.QUInt4):
    wg = (0.1 * rng.standard_normal((K, 2 * inter))).astype(np.float32)
    wd = (0.1 * rng.standard_normal((inter, K))).astype(np.float32)
    return _qt(wg, dtype, gs), _qt(wd, dtype, gs)


@pytest.mark.parametrize("dtype", [QuantType.QUInt4, QuantType.QInt4])
@pytest.mark.parametrize("M", [1, 8, 32])
def test_fused_matches_oracle(rng, dtype, M):
    qt_gu, qt_dn = _mlp_pair(rng, dtype=dtype)
    x = jnp.asarray(rng.standard_normal((M, 128)), jnp.float32)
    assert mlp_w4_eligible(qt_gu, qt_dn, M)
    got = np.asarray(mlp_w4_fused(x, qt_gu, qt_dn, interpret=True))
    want = np.asarray(mlp_w4_reference(x, qt_gu, qt_dn))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_fused_ragged_group_padding(rng):
    """K not a multiple of 2*gs: the padded x columns / padded act columns
    must null the nonzero dequant of padded weight rows."""
    # gate_up K=192 with gs=64 -> 3 groups -> padded to 4 (ragged pair)
    qt_gu, qt_dn = _mlp_pair(rng, K=192, inter=256, gs=64)
    x = jnp.asarray(rng.standard_normal((4, 192)), jnp.float32)
    got = np.asarray(mlp_w4_fused(x, qt_gu, qt_dn, interpret=True))
    want = np.asarray(mlp_w4_reference(x, qt_gu, qt_dn))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_fused_ragged_down_k(rng):
    """down K (= inter) not a multiple of 2*gs exercises the act zero-pad."""
    qt_gu, qt_dn = _mlp_pair(rng, K=128, inter=192, gs=64)
    x = jnp.asarray(rng.standard_normal((4, 128)), jnp.float32)
    got = np.asarray(mlp_w4_fused(x, qt_gu, qt_dn, interpret=True))
    want = np.asarray(mlp_w4_reference(x, qt_gu, qt_dn))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_eligibility_gates(rng):
    qt_gu, qt_dn = _mlp_pair(rng)
    assert mlp_w4_eligible(qt_gu, qt_dn, 32)
    assert not mlp_w4_eligible(qt_gu, qt_dn, 512)  # prefill-sized M
    # int8 (unpacked) weights are not eligible
    wd8 = (0.1 * rng.standard_normal((256, 128))).astype(np.float32)
    q, s, z = rtn_quantize(wd8, QuantType.QInt8, QuantizationStrategy.CHANNEL,
                           -1, True, False)
    qt8 = make_qtensor(q, s, z, quant_type=QuantType.QInt8,
                       strategy=QuantizationStrategy.CHANNEL, group_size=-1,
                       symmetric=True, reduce_range=False)
    assert not mlp_w4_eligible(qt_gu, qt8, 32)
    # mismatched inter dims
    _, qt_dn_bad = _mlp_pair(rng, K=128, inter=128, gs=64)
    assert not mlp_w4_eligible(qt_gu, qt_dn_bad, 32)


def test_engine_decode_uses_megakernel(rng):
    """End-to-end: engine decode with the megakernel armed matches the
    unfused engine decode exactly (same tokens), and the fused kernel really
    executes (counted via a wrapper)."""
    import jax

    import onnx_quantize_tpu as oqt
    from onnx_quantize_tpu.engine import InferenceEngine
    from onnx_quantize_tpu.models import gemma3 as g3
    from onnx_quantize_tpu.models.gemma3 import Gemma3, Gemma3Config, fuse_gemma3_projections
    from onnx_quantize_tpu.ops.kernels import mlp_w4

    cfg = Gemma3Config.tiny(
        hidden_size=128, intermediate_size=256, num_layers=2, num_heads=2,
        num_kv_heads=1, head_dim=64, vocab_size=512,
    )
    model = Gemma3(cfg)
    params = model.init(jax.random.key(0))
    qparams, _ = oqt.quantize(
        model, params,
        oqt.QConfig(weights=oqt.QWeightArgs(dtype="uint4", group_size=64),
                    ignore=["lm_head", "embed"]),
    )
    qparams = fuse_gemma3_projections(qparams)
    ids = np.asarray(rng.integers(1, 512, (2, 8)), np.int32)
    lengths = np.full((2,), 8, np.int32)

    def run(mega):
        eng = InferenceEngine(model, qparams, max_batch=2, max_seq=32,
                              mlp_megakernel=mega)
        cache, logits = eng.prefill(eng.new_cache(), ids, lengths)
        first = np.asarray(np.argmax(logits, -1), np.int32)
        cache, gen = eng.decode_multi(cache, first, steps=4)
        return np.asarray(logits), np.asarray(gen)

    calls = {"n": 0}
    orig = mlp_w4.mlp_w4_fused

    def counting(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    mlp_w4.mlp_w4_fused = counting
    try:
        logits_mega, gen_mega = run(True)
    finally:
        mlp_w4.mlp_w4_fused = orig
    logits_ref, gen_ref = run(False)

    assert calls["n"] >= 2  # traced in the decode program, both layers
    np.testing.assert_array_equal(gen_mega, gen_ref)
    np.testing.assert_allclose(logits_mega, logits_ref, rtol=1e-4, atol=1e-4)
