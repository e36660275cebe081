import numpy as np
import pytest

import jax

import onnx_quantize_tpu as oqt
from onnx_quantize_tpu.engine import InferenceEngine, SamplingParams
from onnx_quantize_tpu.models.gemma3 import Gemma3, Gemma3Config, fuse_gemma3_projections


@pytest.fixture(scope="module")
def quantized():
    model = Gemma3(Gemma3Config.tiny())
    params = model.init(jax.random.key(0))
    qc = oqt.QConfig(
        weights=oqt.QWeightArgs(dtype="uint4", group_size=32), ignore=["lm_head"]
    )
    qparams, _ = oqt.quantize(model, params, qc)
    return model, params, qparams


def test_quantized_engine_generates_like_quantized_forward(quantized):
    """The serving stack over quantized params must equal stepwise argmax
    over the quantized full forward (BASELINE configs 4/5 wiring)."""
    model, _, qparams = quantized
    engine = InferenceEngine(model, qparams, max_batch=1, max_seq=32, kv_quant=True)
    prompt = [3, 1, 4, 1]
    generated = engine.generate([prompt], max_new_tokens=4)[0]

    seq = list(prompt)
    expected = []
    for _ in range(4):
        logits = np.asarray(model(qparams, np.array([seq], np.int32)))
        tok = int(np.argmax(logits[0, -1]))
        expected.append(tok)
        seq.append(tok)
    assert generated == expected


def test_quantized_engine_with_fusion(quantized):
    model, _, qparams = quantized
    fused = fuse_gemma3_projections(qparams)
    e1 = InferenceEngine(model, qparams, max_batch=1, max_seq=32)
    e2 = InferenceEngine(model, fused, max_batch=1, max_seq=32)
    out1 = e1.generate([[1, 2, 3]], max_new_tokens=4)
    out2 = e2.generate([[1, 2, 3]], max_new_tokens=4)
    assert out1 == out2


def test_decode_multi_sampled_reproducible(quantized):
    model, params, _ = quantized
    engine = InferenceEngine(model, params, max_batch=2, max_seq=32)
    ids = np.array([[1, 2, 3], [4, 5, 6]], np.int32)
    lengths = np.array([3, 3], np.int32)
    sp = SamplingParams(temperature=0.8, top_k=20)

    def run(seed):
        cache, logits = engine.prefill(engine.new_cache(), ids, lengths)
        first = np.asarray(np.argmax(logits, -1), np.int32)
        _, generated = engine.decode_multi(
            cache, first, steps=5, sampling=sp, rng=jax.random.key(seed)
        )
        return np.asarray(generated)

    a, b, c = run(0), run(0), run(1)
    np.testing.assert_array_equal(a, b)  # same seed reproduces
    assert not np.array_equal(a, c)  # different seed diverges
    assert a.shape == (2, 5)


def test_int4_kv_cache_engine(quantized):
    """kv_quant="int4": half the cache bytes again. Logits track the fp-cache
    engine closely (±7-level per-(token,head) K/V) and greedy tokens on the
    tiny model agree; the cache really holds packed uint8."""
    model, _, qparams = quantized
    ids = np.array([[3, 1, 4, 1], [2, 7, 1, 8]], np.int32)
    lengths = np.array([4, 4], np.int32)

    eng_fp = InferenceEngine(model, qparams, max_batch=2, max_seq=32)
    eng_i4 = InferenceEngine(model, qparams, max_batch=2, max_seq=32,
                             kv_quant="int4")
    assert eng_i4.new_cache()["k"].dtype == np.uint8

    cache_fp, logits_fp = eng_fp.prefill(eng_fp.new_cache(), ids, lengths)
    cache_i4, logits_i4 = eng_i4.prefill(eng_i4.new_cache(), ids, lengths)
    ref = np.abs(np.asarray(logits_fp)).max()
    assert np.abs(np.asarray(logits_i4) - np.asarray(logits_fp)).max() < 0.15 * ref

    first = np.asarray(np.argmax(logits_fp, -1), np.int32)
    _, gen_fp = eng_fp.decode_multi(cache_fp, first, steps=4)
    _, gen_i4 = eng_i4.decode_multi(cache_i4, first, steps=4)
    gen_fp, gen_i4 = np.asarray(gen_fp), np.asarray(gen_i4)
    # Greedy margins on a tiny random-init model are small and divergence
    # compounds — require early steps exact and high overall agreement.
    np.testing.assert_array_equal(gen_i4[:, :2], gen_fp[:, :2])
    assert (gen_i4 == gen_fp).mean() >= 0.75


def test_int4_kv_rejects_bad_mode(quantized):
    model, _, qparams = quantized
    with pytest.raises(ValueError, match="kv_quant"):
        InferenceEngine(model, qparams, max_batch=1, max_seq=32, kv_quant="int2")
