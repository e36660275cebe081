"""Absolute perplexity pins for the MoE family (structured weights).

Same pattern as ``test_structured_ppl.py`` (the reference pins absolute
accuracies per config on a real checkpoint; this sandbox is air-gapped, so
the anchor is a deterministic structured-weight model): frozen fp32 and
quantized perplexities on a structured-weight MoE decoder. Routing makes MoE
quantization distinct from the dense pins — every expert quantizes against
only its routed tokens — so drift in the routing math, the masked taps, or
the expert kernels moves these numbers.
"""

import numpy as np
import pytest

import onnx_quantize_tpu as oqt
from onnx_quantize_tpu.models.gemma3 import Gemma3, fuse_gemma3_projections
from onnx_quantize_tpu.models.moe import (
    fuse_moe_experts,
    moe_config,
    stack_moe_experts,
)
from onnx_quantize_tpu.models.structured import structured_params, zipf_tokens
from onnx_quantize_tpu.tools.perplexity import perplexity_from_tokens

ATOL = 0.75

CFG = moe_config(
    num_experts=4, num_experts_per_tok=2, moe_intermediate_size=256,
    shared_expert_size=0, norm_topk_prob=True,
    vocab_size=2048, hidden_size=256, intermediate_size=256, num_layers=4,
    num_heads=4, num_kv_heads=2, head_dim=64, rope_theta=10_000.0,
)

FP32_PPL = 2026.619
PINS = [
    ("rtn_uint4_g64", dict(
        weights=oqt.QWeightArgs(dtype="uint4", group_size=64)), 2101.383),
    ("rtn_int8_channel", dict(
        weights=oqt.QWeightArgs(dtype="int8", group_size=-1)), 2025.312),
]


@pytest.fixture(scope="module")
def setup():
    model = Gemma3(CFG)
    params = structured_params(model, seed=7)
    tokens = zipf_tokens(768, CFG.vocab_size, seed=11)
    return model, params, tokens


def _ppl(model, params, tokens):
    return perplexity_from_tokens(
        model, params, tokens, max_length=256, stride=128
    )


def test_fp32_pin(setup):
    model, params, tokens = setup
    assert abs(_ppl(model, params, tokens) - FP32_PPL) < ATOL


@pytest.mark.parametrize("name,kw,pin", PINS, ids=[p[0] for p in PINS])
def test_quantized_pins(setup, name, kw, pin):
    model, params, tokens = setup
    qc = oqt.QConfig(ignore=["lm_head", r"\.router$"], **kw)
    qparams, _ = oqt.quantize(model, params, qc)
    got = _ppl(model, qparams, tokens)
    assert abs(got - pin) < ATOL, f"{name}: ppl {got} vs pin {pin}"


def test_engine_layouts_preserve_ppl(setup):
    """Both engine layouts (stacked loop, expert concat) reproduce the plain
    quantized tree's perplexity — layout is execution strategy, not numerics."""
    model, params, tokens = setup
    qc = oqt.QConfig(
        weights=oqt.QWeightArgs(dtype="uint4", group_size=64),
        ignore=["lm_head", r"\.router$"],
    )
    qparams, _ = oqt.quantize(model, params, qc)
    base = _ppl(model, qparams, tokens)
    gfused = fuse_gemma3_projections(qparams)
    for layout in (stack_moe_experts, fuse_moe_experts):
        got = _ppl(model, layout(gfused), tokens)
        assert abs(got - base) < 0.25, f"{layout.__name__}: {got} vs {base}"
