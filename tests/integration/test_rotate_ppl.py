"""Rotation pre-pass perplexity recovery on a structured-weight model.

Companion to ``test_structured_ppl.py`` (sandwich-norm Gemma pins) on the
llama-convention decoder rotation supports: structured weights carry the
input-channel outliers that blow up per-channel int4 scales, and the
randomized-Hadamard fold must recover most of the fp gap. Measured at
pin time (full 2048-token stream): fp 1965.2, int4-channel 2017.5,
rotate+int4-channel 1968.0 — the rotation closes the 52-ppl gap to ~3.
"""

import numpy as np
import pytest

import onnx_quantize_tpu as oqt
from onnx_quantize_tpu.models.gemma3 import Gemma3
from onnx_quantize_tpu.models.llama import tiny_llama_config
from onnx_quantize_tpu.models.structured import structured_params, zipf_tokens
from onnx_quantize_tpu.tools.perplexity import perplexity_from_tokens


@pytest.fixture(scope="module")
def structured_llama():
    cfg = tiny_llama_config(
        vocab_size=2048, hidden_size=256, intermediate_size=1024,
        num_layers=4, num_heads=4, num_kv_heads=1, head_dim=64,
    )
    model = Gemma3(cfg)
    params = structured_params(model)
    tokens = zipf_tokens(1024, 2048)
    return model, params, tokens


def _ppl(model, params, tokens):
    return perplexity_from_tokens(model, params, tokens, max_length=256, stride=128)


def test_rotation_recovers_int4_channel_ppl(structured_llama):
    """Per-channel int4 is the regime outlier rows hurt most (one hot input
    row inflates EVERY output column's scale). The rotation must recover the
    bulk of the quantization-induced ppl gap."""
    model, params, tokens = structured_llama
    ppl_fp = _ppl(model, params, tokens)

    qc = dict(weights=oqt.QWeightArgs(dtype="int4", group_size=-1),
              ignore=["lm_head"])
    qp_plain, _ = oqt.quantize(model, params, oqt.QConfig(**qc))
    qp_rot, _ = oqt.quantize(
        model, params,
        oqt.QConfig(preprocessors=[oqt.RotateConfig(seed=3)], **qc),
    )
    gap_plain = _ppl(model, qp_plain, tokens) - ppl_fp
    gap_rot = _ppl(model, qp_rot, tokens) - ppl_fp
    assert gap_plain > 10.0  # the outliers really do hurt plain int4
    # Rotation recovers >=70% of the gap (measured ~95%; slack for seeds).
    assert abs(gap_rot) < 0.3 * gap_plain, (gap_rot, gap_plain)
