import numpy as np
import pytest

import jax

from onnx_quantize_tpu.engine import InferenceEngine
from onnx_quantize_tpu.models.gemma3 import Gemma3, Gemma3Config


@pytest.fixture(scope="module")
def tiny():
    model = Gemma3(Gemma3Config.tiny())
    params = model.init(jax.random.key(0))
    return model, params


def test_decode_multi_matches_stepwise(tiny):
    model, params = tiny
    prompt = [1, 2, 3]

    engine_a = InferenceEngine(model, params, max_batch=1, max_seq=32)
    cache, logits = engine_a.prefill(
        engine_a.new_cache(), np.array([prompt], np.int32), np.array([3], np.int32)
    )
    first = np.asarray(np.argmax(logits, -1), np.int32)
    stepwise = [int(first[0])]
    tokens = first
    for _ in range(4):
        cache, logits = engine_a.decode(cache, tokens)
        tokens = np.asarray(np.argmax(logits, -1), np.int32)
        stepwise.append(int(tokens[0]))

    engine_b = InferenceEngine(model, params, max_batch=1, max_seq=32)
    cache, logits = engine_b.prefill(
        engine_b.new_cache(), np.array([prompt], np.int32), np.array([3], np.int32)
    )
    first = np.asarray(np.argmax(logits, -1), np.int32)
    cache, generated = engine_b.decode_multi(cache, first, steps=4)
    multi = [int(first[0])] + [int(t) for t in np.asarray(generated)[0]]
    assert multi == stepwise


def test_decode_multi_advances_lengths(tiny):
    model, params = tiny
    engine = InferenceEngine(model, params, max_batch=2, max_seq=32)
    ids = np.array([[1, 2, 3, 0], [5, 6, 0, 0]], np.int32)
    lengths = np.array([3, 2], np.int32)
    cache, logits = engine.prefill(engine.new_cache(), ids, lengths)
    tokens = np.asarray(np.argmax(logits, -1), np.int32)
    cache, generated = engine.decode_multi(cache, tokens, steps=3)
    assert generated.shape == (2, 3)
    np.testing.assert_array_equal(np.asarray(cache["lengths"]), lengths + 3)
