"""Prefix caching: implant a shared prompt prefix's KV, prefill only suffixes.

The correctness contract: a request submitted as (registered prefix +
suffix) must produce token-for-token the output of submitting the full
prompt — across the per-step loop, serve rounds, and pipelined rounds, on
int8 and fp caches.
"""

import numpy as np
import pytest

import jax

import onnx_quantize_tpu as oqt
from onnx_quantize_tpu.engine import ContinuousBatchingScheduler, InferenceEngine
from onnx_quantize_tpu.engine.sampling import SamplingParams
from onnx_quantize_tpu.models.gemma3 import Gemma3, Gemma3Config

CFG = Gemma3Config.tiny(
    hidden_size=64, intermediate_size=128, num_layers=2, num_heads=2,
    num_kv_heads=1, head_dim=32, vocab_size=128,
)

PREFIX = [7, 3, 99, 12, 5, 44, 21]
SUFFIXES = [[9, 17, 3], [11], [2, 8, 30, 4]]


@pytest.fixture(scope="module")
def quantized():
    model = Gemma3(CFG)
    params = model.init(jax.random.key(0))
    qparams, _ = oqt.quantize(model, params, oqt.QConfig(
        weights=oqt.QWeightArgs(dtype="uint4", group_size=16)))
    return model, qparams


def _run(model, params, *, chunk, pipeline=1, use_prefix, kv_quant=True,
         max_new=8):
    engine = InferenceEngine(model, params, max_batch=2, max_seq=64,
                             kv_quant=kv_quant)
    sched = ContinuousBatchingScheduler(engine, chunk=chunk, pipeline=pipeline)
    if use_prefix:
        assert sched.register_prefix(PREFIX) == len(PREFIX)
        handles = [sched.submit(s, max_new_tokens=max_new, use_prefix=True)
                   for s in SUFFIXES]
    else:
        handles = [sched.submit(PREFIX + s, max_new_tokens=max_new)
                   for s in SUFFIXES]
    sched.run()
    assert all(r.done for r in handles)
    return [r.output for r in handles]


@pytest.mark.parametrize("kv_quant", [True, False])
def test_engine_prefix_prefill_matches_full(quantized, kv_quant):
    """Engine level: logits + greedy tokens identical between the prefix
    path and the full-prompt prefill."""
    model, qparams = quantized
    engine = InferenceEngine(model, qparams, max_batch=2, max_seq=64,
                             kv_quant=kv_quant)

    full = PREFIX + SUFFIXES[0]
    ids_full = np.zeros((2, len(full)), np.int32)
    ids_full[0, :] = full
    lengths = np.array([len(full), 1], np.int32)
    mask = np.array([True, False])
    cache_a, logits_a, tok_a = engine.prefill(
        engine.new_cache(), ids_full, lengths, slot_mask=mask, with_tokens=True
    )

    # Prefix snapshot from a scratch prefill, then suffix-only prefill.
    ids_p = np.zeros((2, len(PREFIX)), np.int32)
    ids_p[0, :] = PREFIX
    scratch, _ = engine.prefill(
        engine.new_cache(), ids_p,
        np.array([len(PREFIX), 1], np.int32), slot_mask=mask,
    )
    prefix = engine.snapshot_prefix(scratch, 0, len(PREFIX))

    ids_s = np.zeros((2, len(SUFFIXES[0])), np.int32)
    ids_s[0, :] = SUFFIXES[0]
    cache_b, logits_b, tok_b = engine.prefill(
        engine.new_cache(), ids_s, lengths, slot_mask=mask, with_tokens=True,
        prefix=prefix,
    )
    np.testing.assert_allclose(
        np.asarray(logits_b[0]), np.asarray(logits_a[0]), atol=1e-5, rtol=1e-5
    )
    assert int(tok_b[0]) == int(tok_a[0])
    assert int(cache_b["lengths"][0]) == len(full)

    # And decode continues identically from either cache.
    toks = np.asarray(tok_a)
    _, gen_a = engine.decode_multi(cache_a, toks, steps=6)
    _, gen_b = engine.decode_multi(cache_b, toks, steps=6)
    np.testing.assert_array_equal(np.asarray(gen_a)[0], np.asarray(gen_b)[0])


@pytest.mark.parametrize("chunk,pipeline", [(1, 1), (4, 1), (4, 2)])
def test_scheduler_prefix_matches_full_prompt(quantized, chunk, pipeline):
    model, qparams = quantized
    base = _run(model, qparams, chunk=chunk, pipeline=pipeline, use_prefix=False)
    got = _run(model, qparams, chunk=chunk, pipeline=pipeline, use_prefix=True)
    assert got == base


def test_mixed_prefix_and_plain_requests(quantized):
    """Prefix and plain admissions in the same scheduler round."""
    model, qparams = quantized
    engine = InferenceEngine(model, qparams, max_batch=2, max_seq=64,
                             kv_quant=True)
    sched = ContinuousBatchingScheduler(engine, chunk=4)
    sched.register_prefix(PREFIX)
    a = sched.submit(SUFFIXES[0], max_new_tokens=6, use_prefix=True)
    b = sched.submit([5, 9, 17, 3], max_new_tokens=6)
    sched.run()

    ref_a = _run(model, qparams, chunk=1, use_prefix=False, max_new=6)[0]
    engine2 = InferenceEngine(model, qparams, max_batch=2, max_seq=64,
                              kv_quant=True)
    sched2 = ContinuousBatchingScheduler(engine2, chunk=1)
    ref_b = sched2.submit([5, 9, 17, 3], max_new_tokens=6)
    sched2.run()
    assert a.output == ref_a
    assert b.output == ref_b.output


def test_prefix_validation(quantized):
    model, qparams = quantized
    engine = InferenceEngine(model, qparams, max_batch=2, max_seq=32,
                             kv_quant=True)
    sched = ContinuousBatchingScheduler(engine)
    with pytest.raises(ValueError, match="no prefix registered"):
        sched.submit([1, 2], use_prefix=True)
    with pytest.raises(ValueError, match="non-empty"):
        sched.register_prefix([])
    sched.register_prefix(list(range(1, 29)))  # 28 of 32 slots
    with pytest.raises(ValueError, match="exceeds"):
        sched.submit([1, 2, 3, 4, 5], use_prefix=True)
    with pytest.raises(ValueError, match="suffix"):
        sched.submit([], use_prefix=True)
