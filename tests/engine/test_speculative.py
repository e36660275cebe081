"""Speculative decoding: exact greedy equivalence to the target-only stream.

The correctness contract is draft-independent: a perfect draft, a quantized
draft, and an adversarial (differently-initialized) draft must all produce
token-for-token the target engine's own greedy output — the draft can only
change SPEED. EOS and budget freezing mirror the serve-round semantics.
"""

import numpy as np
import pytest

import jax

import onnx_quantize_tpu as oqt
from onnx_quantize_tpu.engine import InferenceEngine, SpeculativeDecoder
from onnx_quantize_tpu.models.gemma3 import Gemma3, Gemma3Config

CFG = Gemma3Config.tiny(
    hidden_size=64, intermediate_size=128, num_layers=2, num_heads=2,
    num_kv_heads=1, head_dim=32, vocab_size=128,
)


@pytest.fixture(scope="module")
def target_setup():
    model = Gemma3(CFG)
    params = model.init(jax.random.key(0))
    return model, params


def _engine(model, params, max_batch=2, max_seq=64):
    return InferenceEngine(model, params, max_batch=max_batch, max_seq=max_seq,
                           kv_quant=True)


def _target_greedy(model, params, prompts, max_new, eos=None):
    engine = _engine(model, params)
    return engine.generate(prompts, max_new_tokens=max_new, eos_token_id=eos)


PROMPTS = [[5, 9, 17, 3], [11, 2]]


def _drafts(target_setup):
    """Three draft flavors: self (always accepts), quantized, adversarial."""
    model, params = target_setup
    qparams, _ = oqt.quantize(model, params, oqt.QConfig(
        weights=oqt.QWeightArgs(dtype="uint4", group_size=16)))
    adversarial = model.init(jax.random.key(99))
    return {
        "self": (model, params),
        "quantized": (model, qparams),
        "adversarial": (model, adversarial),
    }


@pytest.mark.parametrize("draft_kind", ["self", "quantized", "adversarial"])
@pytest.mark.parametrize("k", [2, 4])
def test_exact_greedy_equivalence(target_setup, draft_kind, k):
    model, params = target_setup
    dmodel, dparams = _drafts(target_setup)[draft_kind]
    base = _target_greedy(model, params, PROMPTS, max_new=12)

    spec = SpeculativeDecoder(
        _engine(model, params), _engine(dmodel, dparams), k=k
    )
    got = spec.generate(PROMPTS, max_new_tokens=12)
    assert got == base, (draft_kind, k)


def test_eos_and_budget(target_setup):
    model, params = target_setup
    base = _target_greedy(model, params, PROMPTS, max_new=10)
    eos = base[0][3]  # stop request 0 at its 4th token

    ref = _target_greedy(model, params, PROMPTS, max_new=10, eos=eos)
    spec = SpeculativeDecoder(_engine(model, params), _engine(model, params), k=3)
    got = spec.generate(PROMPTS, max_new_tokens=10, eos_token_id=eos)
    assert got == ref
    assert got[0][-1] == eos and len(got[0]) <= 4


def test_acceptance_speeds_up_round_count(target_setup):
    """A self-draft accepts k-1 per round: the device blob must show multi-
    token rounds (the speed mechanism, independent of wall-clock)."""
    model, params = target_setup
    tgt = _engine(model, params)
    dft = _engine(model, params)
    spec = SpeculativeDecoder(tgt, dft, k=4)

    ids = np.zeros((2, 4), np.int32)
    ids[0, :4] = PROMPTS[0]
    ids[1, :2] = PROMPTS[1]
    lengths = np.array([4, 2], np.int32)
    tgt_cache, _, first = tgt.prefill(tgt.new_cache(), ids, lengths, with_tokens=True)
    dft_cache, _ = dft.prefill(dft.new_cache(), ids, lengths)

    budgets = np.array([12, 12], np.int32)
    _, _, blob = spec.decode(
        tgt_cache, dft_cache, np.asarray(first), rounds=3, budgets=budgets
    )
    emitted = np.asarray(blob)[:, :, 4]
    # Perfect draft => every full round emits k (=4 with the k-1 cap + bonus).
    assert (emitted[:, 0] == 4).all()


def test_capacity_freeze(target_setup):
    """Rows without room for a k+1 window freeze instead of writing past
    max_seq."""
    model, params = target_setup
    tgt = _engine(model, params, max_seq=16)
    dft = _engine(model, params, max_seq=16)
    spec = SpeculativeDecoder(tgt, dft, k=4)
    got = spec.generate([[5, 9, 17, 3]], max_new_tokens=32)
    # 16 - 4 prompt = 12 slots; window needs k+1=5 free: emits in rounds of 4
    # until fewer than 5 slots remain, then freezes.
    assert 1 <= len(got[0]) <= 12


def test_mismatched_engines_rejected(target_setup):
    model, params = target_setup
    with pytest.raises(ValueError, match="max_batch/max_seq"):
        SpeculativeDecoder(
            _engine(model, params, max_seq=64),
            _engine(model, params, max_seq=32),
        )


# ── sampled speculative (rejection scheme) ────────────────────────────────


def test_sampled_accept_marginal_matches_target():
    """Monte-Carlo pin of the rejection scheme: the FIRST emitted token's
    empirical distribution must equal softmax(p_0) exactly (the speculative
    sampling theorem) for an arbitrary (and deliberately bad) draft q."""
    import jax.numpy as jnp

    from onnx_quantize_tpu.engine.speculative import sampled_accept

    V, kp, trials = 6, 3, 20000
    rng = np.random.default_rng(0)
    p_logits = jnp.asarray(rng.standard_normal((1, kp + 1, V)), jnp.float32)
    q_logits = jnp.asarray(2.0 * rng.standard_normal((1, kp, V)), jnp.float32)
    temps = jnp.ones((1,), jnp.float32)

    def one(key):
        kd, ka = jax.random.split(key)
        # Draft proposes from q (position-wise), as the real draft scan does.
        drafts = jax.random.categorical(kd, q_logits[0], axis=-1)[None, :]
        toks, n = sampled_accept(p_logits, q_logits, drafts, temps, ka)
        return toks[0, 0]  # first emitted token

    keys = jax.random.split(jax.random.key(42), trials)
    firsts = np.asarray(jax.vmap(one)(keys))
    emp = np.bincount(firsts, minlength=V) / trials
    want = np.asarray(jax.nn.softmax(p_logits[0, 0]))
    np.testing.assert_allclose(emp, want, atol=0.015), (emp, want)


def test_sampled_accept_perfect_draft_accepts():
    """q == p: acceptance probability is 1 for every draft."""
    import jax.numpy as jnp

    from onnx_quantize_tpu.engine.speculative import sampled_accept

    V, kp = 8, 3
    rng = np.random.default_rng(1)
    p = jnp.asarray(rng.standard_normal((2, kp + 1, V)), jnp.float32)
    q = p[:, :kp]
    drafts = jnp.asarray(rng.integers(0, V, size=(2, kp)), jnp.int32)
    toks, n = sampled_accept(p, q, drafts, jnp.ones((2,)), jax.random.key(0))
    assert (np.asarray(n) == kp).all()
    np.testing.assert_array_equal(np.asarray(toks)[:, :kp], np.asarray(drafts))


def test_sampled_generate_deterministic_and_budgeted(target_setup):
    model, params = target_setup
    qparams = _drafts(target_setup)["quantized"][1]
    spec = SpeculativeDecoder(
        _engine(model, params), _engine(model, qparams), k=3
    )
    a = spec.generate(PROMPTS, max_new_tokens=11, temperature=0.8,
                      rng=jax.random.key(7))
    b = spec.generate(PROMPTS, max_new_tokens=11, temperature=0.8,
                      rng=jax.random.key(7))
    assert a == b
    assert all(len(o) == 11 for o in a)
    assert all(0 <= t < 128 for o in a for t in o)
    c = spec.generate(PROMPTS, max_new_tokens=11, temperature=0.8,
                      rng=jax.random.key(8))
    assert c != a  # different seed, different stream


def test_sampled_eos_stops(target_setup):
    model, params = target_setup
    spec = SpeculativeDecoder(
        _engine(model, params), _engine(model, params), k=3
    )
    probe = spec.generate(PROMPTS, max_new_tokens=10, temperature=0.9,
                          rng=jax.random.key(3))
    eos = probe[0][2]
    got = spec.generate(PROMPTS, max_new_tokens=10, temperature=0.9,
                        eos_token_id=eos, rng=jax.random.key(3))
    assert got[0][-1] == eos or len(got[0]) == 10
    # The stream up to EOS matches the unstopped stream (same seeds).
    assert got[0] == probe[0][: len(got[0])]


def test_int4_kv_speculative_exactness(target_setup):
    """Speculative decode over int4 KV engines: the window verify path
    (write_kv_window) must quantize/pack identically to the step path, so
    speculative greedy == the int4 engine's own greedy."""
    model, params = target_setup

    def _i4(max_batch=2, max_seq=64):
        return InferenceEngine(model, params, max_batch=max_batch,
                               max_seq=max_seq, kv_quant="int4")

    base = _i4().generate(PROMPTS, max_new_tokens=12)
    spec = SpeculativeDecoder(_i4(), _i4(), k=3)
    got = spec.generate(PROMPTS, max_new_tokens=12)
    assert got == base
