"""Deterministic structured-weight models for absolute accuracy pins.

The reference anchors its accuracy claims to real checkpoints (SST-2 pins in
``test/integration/bert/test_bert_weights_only.py:10-65``, wikitext-2 ppl in
``examples/gemma3/README.md:31-33``). This environment has no network or HF
cache, so this module provides the next-best anchor: a mid-size Gemma-3 whose
weights are *structured* — low-rank mixing plus heavy-tailed per-channel
outliers, the statistics PTQ algorithms are sensitive to — generated
deterministically (seeded PCG64 keyed by a CRC of each parameter path, so the
values are independent of dict iteration order and stable across platforms).
``tests/integration/test_structured_ppl.py`` pins absolute fp32-vs-quantized
perplexities per config against this model the way the reference pins
0.94/0.93/0.89.
"""

from __future__ import annotations

import zlib

import numpy as np

import jax.numpy as jnp

__all__ = ["structured_params", "zipf_tokens", "STRUCTURED_GEMMA3"]


def _rng(seed: int, name: str) -> np.random.Generator:
    return np.random.default_rng((seed << 32) ^ zlib.crc32(name.encode()))


def _structured_weight(rng: np.random.Generator, K: int, N: int) -> np.ndarray:
    """Low-rank + noise + input-channel outliers (trained-weight-like stats).

    The outlier channels (a few inputs scaled 6-10x) are what SmoothQuant/AWQ
    exist to handle — without them a random weight makes those pre-passes
    no-ops and the pins would not regress their numerics.
    """
    r = max(4, min(K, N) // 8)
    A = rng.standard_normal((K, r)).astype(np.float32)
    B = rng.standard_normal((r, N)).astype(np.float32)
    w = (A @ B) / np.sqrt(r * K / 2.0)
    w += 0.3 * rng.standard_normal((K, N)).astype(np.float32) / np.sqrt(K)
    n_out = max(1, K // 32)
    idx = rng.choice(K, size=n_out, replace=False)
    w[idx, :] *= rng.uniform(6.0, 10.0, size=(n_out, 1)).astype(np.float32)
    return (0.6 * w).astype(np.float32)


def structured_params(model, seed: int = 7) -> dict:
    """Replace a model's init params with deterministic structured weights.

    Linear weights get low-rank+outlier structure; embeddings get Zipf-decayed
    row norms (frequent tokens carry larger embeddings, like trained tables);
    norm gains small offsets; biases small values. The tied lm_head follows
    the embedding transpose, matching ``Gemma3.init``.
    """
    import jax

    params = model.init(jax.random.key(0))
    sites = {s.name for s in model.linear_sites()}

    def visit(tree, path):
        if isinstance(tree, dict):
            return {k: visit(v, path + (k,)) for k, v in tree.items()}
        name = ".".join(path[:-1])
        leaf = path[-1]
        rng = _rng(seed, ".".join(path))
        arr = np.asarray(tree)
        if leaf == "w" and name in sites and arr.ndim == 2:
            return jnp.asarray(_structured_weight(rng, *arr.shape))
        if leaf == "w" and name == "embed" and arr.ndim == 2:
            V, D = arr.shape
            w = rng.standard_normal((V, D)).astype(np.float32)
            norms = (1.0 / np.power(np.arange(1, V + 1), 0.25)).astype(np.float32)
            return jnp.asarray(0.05 * w * norms[:, None])
        if leaf == "w" and arr.ndim == 1:  # RMSNorm gains
            return jnp.asarray(0.1 * rng.standard_normal(arr.shape).astype(np.float32))
        if leaf == "b":
            return jnp.asarray(0.02 * rng.standard_normal(arr.shape).astype(np.float32))
        return tree

    params = visit(params, ())
    if "lm_head" in params and "embed" in params:
        params["lm_head"] = {"w": params["embed"]["w"].T}
    return params


def zipf_tokens(n: int, vocab_size: int, seed: int = 11) -> np.ndarray:
    """Deterministic Zipf-distributed token stream (natural-text-like ranks)."""
    rng = np.random.default_rng(seed)
    toks = rng.zipf(1.3, size=4 * n)
    toks = toks[toks < vocab_size][:n]
    while len(toks) < n:
        extra = rng.zipf(1.3, size=2 * n)
        toks = np.concatenate([toks, extra[extra < vocab_size]])[:n]
    return toks.astype(np.int32)


def STRUCTURED_GEMMA3():
    """The pinned benchmark model: mid-size structured Gemma-3 (~7M params)."""
    from onnx_quantize_tpu.models.gemma3 import Gemma3, Gemma3Config

    cfg = Gemma3Config(
        vocab_size=2048, hidden_size=256, intermediate_size=1024, num_layers=4,
        num_heads=4, num_kv_heads=1, head_dim=64, sliding_window=128,
        sliding_pattern=3,
    )
    model = Gemma3(cfg)
    return model, structured_params(model)
