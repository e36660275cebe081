import numpy as np
import pytest

import jax
import jax.numpy as jnp

from onnx_quantize_tpu.engine import (
    ContinuousBatchingScheduler,
    InferenceEngine,
    KVCacheConfig,
    SamplingParams,
    init_cache,
    read_kv,
    write_kv,
)
from onnx_quantize_tpu.models.gemma3 import Gemma3, Gemma3Config


@pytest.fixture(scope="module")
def tiny():
    model = Gemma3(Gemma3Config.tiny())
    params = model.init(jax.random.key(0))
    return model, params


class TestKVCache:
    def _cfg(self, quantized):
        return KVCacheConfig(
            num_layers=2, batch=2, max_seq=16, num_kv_heads=1, head_dim=8,
            quantized=quantized,
        )

    @pytest.mark.parametrize("quantized", [False, True])
    def test_write_read_roundtrip(self, rng, quantized):
        cache = init_cache(self._cfg(quantized))
        k = rng.standard_normal((2, 3, 1, 8)).astype(np.float32)
        v = rng.standard_normal((2, 3, 1, 8)).astype(np.float32)
        positions = np.broadcast_to(np.arange(3), (2, 3))
        cache = write_kv(cache, 0, jnp.asarray(k), jnp.asarray(v), jnp.asarray(positions))
        k_r, v_r = read_kv(cache, 0)
        atol = 0.03 if quantized else 1e-7  # int8 cache quantization error
        np.testing.assert_allclose(np.asarray(k_r)[:, :3], k, atol=atol)
        np.testing.assert_allclose(np.asarray(v_r)[:, :3], v, atol=atol)
        # untouched layer stays zero
        k1, _ = read_kv(cache, 1)
        assert np.abs(np.asarray(k1)).max() == 0

    def test_int8_cache_per_token_head_scales(self, rng):
        cache = init_cache(self._cfg(True))
        k = np.zeros((2, 2, 1, 8), np.float32)
        k[0, 0] = 100.0  # large-magnitude token must not hurt others' precision
        k[0, 1] = 0.01
        positions = np.broadcast_to(np.arange(2), (2, 2))
        cache = write_kv(cache, 0, jnp.asarray(k), jnp.asarray(k), jnp.asarray(positions))
        k_r, _ = read_kv(cache, 0)
        np.testing.assert_allclose(np.asarray(k_r)[0, 1], k[0, 1], rtol=0.02)


class TestEngine:
    def test_prefill_matches_full_forward(self, tiny):
        model, params = tiny
        engine = InferenceEngine(model, params, max_batch=2, max_seq=16)
        ids = np.array([[1, 2, 3, 4, 5], [7, 8, 9, 0, 0]], np.int32)
        lengths = np.array([5, 3], np.int32)
        cache, last_logits = engine.prefill(engine.new_cache(), ids, lengths)
        # Reference: plain full forward, take logits at the last real token.
        full = np.asarray(model(params, ids))
        np.testing.assert_allclose(
            np.asarray(last_logits)[0], full[0, 4], atol=2e-4
        )
        full_b = np.asarray(model(params, ids[1:2, :3]))
        np.testing.assert_allclose(np.asarray(last_logits)[1], full_b[0, 2], atol=2e-4)

    def test_decode_matches_full_forward(self, tiny):
        model, params = tiny
        engine = InferenceEngine(model, params, max_batch=1, max_seq=16)
        prompt = [1, 2, 3, 4]
        cache, logits = engine.prefill(
            engine.new_cache(), np.array([prompt], np.int32), np.array([4], np.int32)
        )
        next_tok = 5
        cache, logits = engine.decode(cache, np.array([next_tok], np.int32))
        full = np.asarray(model(params, np.array([prompt + [next_tok]], np.int32)))
        np.testing.assert_allclose(np.asarray(logits)[0], full[0, -1], atol=2e-3)

    def test_generate_greedy_deterministic(self, tiny):
        model, params = tiny
        engine = InferenceEngine(model, params, max_batch=2, max_seq=32)
        out1 = engine.generate([[1, 2, 3]], max_new_tokens=5)
        out2 = engine.generate([[1, 2, 3]], max_new_tokens=5)
        assert out1 == out2
        assert len(out1[0]) == 5

    def test_generate_matches_stepwise_forward(self, tiny):
        """Greedy generation must equal argmax over repeated full forwards."""
        model, params = tiny
        engine = InferenceEngine(model, params, max_batch=1, max_seq=32)
        prompt = [3, 1, 4]
        generated = engine.generate([prompt], max_new_tokens=4)[0]

        seq = list(prompt)
        expected = []
        for _ in range(4):
            logits = np.asarray(model(params, np.array([seq], np.int32)))
            tok = int(np.argmax(logits[0, -1]))
            expected.append(tok)
            seq.append(tok)
        assert generated == expected

    def test_int8_kv_cache_generation(self, tiny):
        model, params = tiny
        engine = InferenceEngine(model, params, max_batch=1, max_seq=32, kv_quant=True)
        out = engine.generate([[1, 2, 3]], max_new_tokens=4)
        assert len(out[0]) == 4


class TestScheduler:
    def test_continuous_batching_completes_all(self, tiny):
        model, params = tiny
        engine = InferenceEngine(model, params, max_batch=2, max_seq=32)
        sched = ContinuousBatchingScheduler(engine)
        reqs = [
            sched.submit([1, 2, 3], max_new_tokens=3),
            sched.submit([4, 5], max_new_tokens=5),
            sched.submit([6], max_new_tokens=2),  # more requests than slots
        ]
        finished = sched.run()
        assert len(finished) == 3
        assert all(r.done for r in reqs)
        assert len(reqs[0].output) == 3
        assert len(reqs[1].output) == 5
        assert len(reqs[2].output) == 2

    def test_scheduler_matches_unbatched_generation(self, tiny):
        model, params = tiny
        engine = InferenceEngine(model, params, max_batch=2, max_seq=32)
        solo = engine.generate([[1, 2, 3]], max_new_tokens=4)[0]

        sched = ContinuousBatchingScheduler(engine)
        r1 = sched.submit([1, 2, 3], max_new_tokens=4)
        r2 = sched.submit([9, 8], max_new_tokens=4)
        sched.run()
        assert r1.output == solo


def test_prefill_with_tokens_matches_argmax(rng):
    """prefill(with_tokens=True) returns the greedy first tokens computed
    in-program; they must equal argmax of the returned logits."""
    import onnx_quantize_tpu as oqt
    from onnx_quantize_tpu.models.gemma3 import Gemma3, Gemma3Config

    cfg = Gemma3Config.tiny()
    model = Gemma3(cfg)
    params = model.init(jax.random.key(0))
    qparams, _ = oqt.quantize(model, params, oqt.QConfig(
        weights=oqt.QWeightArgs(dtype="uint4", group_size=16)))
    engine = InferenceEngine(model, qparams, max_batch=2, max_seq=32, kv_quant=True)
    ids = rng.integers(1, cfg.vocab_size, size=(2, 8)).astype(np.int32)
    lengths = np.full((2,), 8, np.int32)
    cache, logits, tokens = engine.prefill(
        engine.new_cache(), ids, lengths, with_tokens=True)
    np.testing.assert_array_equal(
        np.asarray(tokens), np.argmax(np.asarray(logits), axis=-1))
