import numpy as np
import pytest

import jax

import onnx_quantize_tpu as oqt
from onnx_quantize_tpu.models.gemma3 import Gemma3, Gemma3Config
from onnx_quantize_tpu.tools.perplexity import perplexity_from_tokens


@pytest.fixture(scope="module")
def tiny():
    model = Gemma3(Gemma3Config.tiny())
    params = model.init(jax.random.key(0))
    return model, params


def _oracle_ppl(model, params, tokens, max_length, stride):
    """Direct replication of the HF sliding-window method without padding."""
    seq_len = len(tokens)
    total_nll, total_tokens, prev_end = 0.0, 0, 0
    for begin in range(0, seq_len, stride):
        end = min(begin + max_length, seq_len)
        trg_len = end - prev_end
        chunk = np.asarray(tokens[begin:end])[None, :].astype(np.int32)
        logits = np.asarray(model(params, chunk), dtype=np.float64)[0]
        x = logits[:-1]
        x = x - x.max(axis=-1, keepdims=True)
        log_probs = x - np.log(np.exp(x).sum(axis=-1, keepdims=True))
        targets = chunk[0, 1:]
        lp = log_probs[-trg_len:]
        tg = targets[-trg_len:]
        total_nll += float(-lp[np.arange(len(tg)), tg].sum())
        total_tokens += len(tg)
        prev_end = end
        if end == seq_len:
            break
    return float(np.exp(total_nll / total_tokens))


def test_sliding_window_matches_oracle(tiny, rng):
    model, params = tiny
    tokens = rng.integers(1, 250, size=50).astype(np.int32)
    ppl = perplexity_from_tokens(model, params, tokens, max_length=16, stride=8)
    oracle = _oracle_ppl(model, params, tokens, 16, 8)
    assert ppl == pytest.approx(oracle, rel=1e-3)


def test_single_window(tiny, rng):
    model, params = tiny
    tokens = rng.integers(1, 250, size=12).astype(np.int32)
    ppl = perplexity_from_tokens(model, params, tokens, max_length=32, stride=16)
    oracle = _oracle_ppl(model, params, tokens, 32, 16)
    assert ppl == pytest.approx(oracle, rel=1e-3)


def test_quantized_ppl_delta_small(tiny, rng):
    """int8 g32 quantization must move tiny-model ppl by a small relative amount
    (the parity machinery behind the <=0.1 ppl gate on real weights)."""
    model, params = tiny
    tokens = rng.integers(1, 250, size=64).astype(np.int32)
    ppl_fp = perplexity_from_tokens(model, params, tokens, max_length=16, stride=8)
    qc = oqt.QConfig(
        weights=oqt.QWeightArgs(dtype="int8", group_size=32), ignore=["lm_head"]
    )
    qparams, _ = oqt.quantize(model, params, qc)
    ppl_q = perplexity_from_tokens(model, qparams, tokens, max_length=16, stride=8)
    assert abs(ppl_q - ppl_fp) / ppl_fp < 0.02


def test_cp_mesh_ppl_matches_single_device(rng):
    """Context-parallel scoring: the same sliding-window ppl with windows
    sharded over a 'seq' mesh (ring attention) — long-context windows that
    exceed one chip score identically."""
    from onnx_quantize_tpu.models.llama import tiny_llama_config
    from onnx_quantize_tpu.parallel import make_cp_mesh

    model = Gemma3(tiny_llama_config(num_layers=2))
    params = model.init(jax.random.key(1))
    tokens = rng.integers(1, 250, size=50).astype(np.int32)
    ppl = perplexity_from_tokens(model, params, tokens, max_length=16, stride=8)
    ppl_cp = perplexity_from_tokens(
        model, params, tokens, max_length=16, stride=8, mesh=make_cp_mesh(4)
    )
    assert ppl_cp == pytest.approx(ppl, rel=1e-3)
