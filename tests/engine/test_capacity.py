import numpy as np
import pytest

import jax

from onnx_quantize_tpu.engine import ContinuousBatchingScheduler, InferenceEngine
from onnx_quantize_tpu.models.gemma3 import Gemma3, Gemma3Config


@pytest.fixture(scope="module")
def tiny():
    model = Gemma3(Gemma3Config.tiny())
    params = model.init(jax.random.key(0))
    return model, params


def test_decode_at_capacity_preserves_cache(tiny):
    """Decoding a full sequence must neither grow it nor corrupt the last KV slot."""
    model, params = tiny
    engine = InferenceEngine(model, params, max_batch=1, max_seq=8)
    ids = np.array([[1, 2, 3, 4, 5, 6, 7, 9]], np.int32)
    cache, logits = engine.prefill(engine.new_cache(), ids, np.array([8], np.int32))
    k_before = np.asarray(cache["k"][:, :, -1]).copy()

    cache, _ = engine.decode(cache, np.array([5], np.int32))
    assert int(np.asarray(cache["lengths"])[0]) == 8  # did not advance
    np.testing.assert_array_equal(np.asarray(cache["k"][:, :, -1]), k_before)


def test_scheduler_evicts_at_capacity(tiny):
    model, params = tiny
    engine = InferenceEngine(model, params, max_batch=1, max_seq=8)
    sched = ContinuousBatchingScheduler(engine)
    req = sched.submit([1, 2, 3, 4, 5], max_new_tokens=100)
    finished = sched.run()
    assert len(finished) == 1
    assert req.done
    # 5 prompt tokens + at most 3 generated before the cache fills.
    assert len(req.output) <= 4
