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


def test_decode_multi_eos_freezes_sequence(tiny):
    """After a sequence emits EOS it must stop: output padded with EOS, length
    frozen, no further KV writes (slots beyond the frozen length stay zero)."""
    model, params = tiny
    prompt = [1, 2, 3]
    steps = 6

    # Observe what the model emits greedily, then re-run declaring the token
    # produced at step t_eos as the EOS id.
    engine = InferenceEngine(model, params, max_batch=1, max_seq=32)
    cache, logits = engine.prefill(
        engine.new_cache(), np.array([prompt], np.int32), np.array([3], np.int32)
    )
    first = np.asarray(np.argmax(logits, -1), np.int32)
    _, generated = engine.decode_multi(cache, first, steps=steps)
    toks = np.asarray(generated)[0]
    t_eos = 0  # the tiny random model repeats one token, so freeze at step 0
    eos = int(toks[t_eos])
    # Ensure the chosen id doesn't appear earlier (else freezing starts sooner).
    assert eos not in toks[:t_eos].tolist()

    engine2 = InferenceEngine(model, params, max_batch=1, max_seq=32)
    cache2, logits2 = engine2.prefill(
        engine2.new_cache(), np.array([prompt], np.int32), np.array([3], np.int32)
    )
    first2 = np.asarray(np.argmax(logits2, -1), np.int32)
    cache2, gen2 = engine2.decode_multi(cache2, first2, steps=steps, eos_token_id=eos)
    out = np.asarray(gen2)[0]
    # Prefix up to and including EOS matches the unconstrained run; tail is EOS.
    np.testing.assert_array_equal(out[: t_eos + 1], toks[: t_eos + 1])
    assert all(int(t) == eos for t in out[t_eos + 1 :])
    # Length froze: prompt(3) + first token + steps up to/including EOS input.
    # Inputs consumed before freezing: first2, toks[0], ..., toks[t_eos] — the
    # EOS itself is emitted at step t_eos and never fed back, so lengths
    # advanced t_eos + 1 times past the prefill.
    assert int(np.asarray(cache2["lengths"])[0]) == 3 + t_eos + 1
    # No KV writes landed beyond the frozen length.
    frozen = 3 + t_eos + 1
    k_tail = np.asarray(cache2["k"])[:, 0, frozen:, :, :]
    np.testing.assert_array_equal(k_tail, np.zeros_like(k_tail))


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
