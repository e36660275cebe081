"""Engine decode with the fused int8-KV flash-decode kernel must match the
dequantize-then-attend path (same int8 cache, different read path)."""

import numpy as np
import pytest

import jax

from onnx_quantize_tpu.engine import InferenceEngine
from onnx_quantize_tpu.models.gemma3 import Gemma3, Gemma3Config


@pytest.fixture(scope="module")
def tiny128():
    # head_dim and max_seq must be 128-tileable for the fused kernel.
    model = Gemma3(Gemma3Config.tiny(
        hidden_size=64, num_heads=2, num_kv_heads=1, head_dim=128,
        sliding_window=16, sliding_pattern=2,
    ))
    params = model.init(jax.random.key(0))
    return model, params


def _decode_run(model, params, fused: bool, steps=4):
    engine = InferenceEngine(
        model, params, max_batch=2, max_seq=128, kv_quant=True,
        fused_attention=fused,
    )
    ids = np.array([[1, 2, 3, 4], [5, 6, 0, 0]], np.int32)
    lengths = np.array([4, 2], np.int32)
    cache, logits = engine.prefill(engine.new_cache(), ids, lengths)
    first = np.asarray(np.argmax(logits, -1), np.int32)
    cache, gen = engine.decode_multi(cache, first, steps=steps)
    _, logits_last = engine.decode(cache, np.asarray(gen)[:, -1])
    return np.asarray(gen), np.asarray(logits_last)


def test_fused_decode_matches_unfused(tiny128):
    model, params = tiny128
    gen_ref, logits_ref = _decode_run(model, params, fused=False)
    gen_fused, logits_fused = _decode_run(model, params, fused=True)
    np.testing.assert_array_equal(gen_fused, gen_ref)
    np.testing.assert_allclose(logits_fused, logits_ref, atol=2e-4, rtol=1e-4)


def test_fused_attention_validation(tiny128):
    model, params = tiny128
    # fp cache cannot fuse
    with pytest.raises(ValueError, match="fused_attention"):
        InferenceEngine(model, params, max_batch=2, max_seq=128,
                        kv_quant=False, fused_attention=True)
    # max_seq not 128-tileable
    with pytest.raises(ValueError, match="fused_attention"):
        InferenceEngine(model, params, max_batch=2, max_seq=96,
                        kv_quant=True, fused_attention=True)
