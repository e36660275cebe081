"""Shape sweep for the W4 kernel's block picker VMEM model (VERDICT r2 #7).

``matmul_w4._pick_blocks`` chooses (bn, pairs_per_block) under a scoped-vmem
budget model. These tests pin the model against the full model-zoo shape
family (Gemma-3 270M/1B/4B sites x group sizes x decode/prefill M-tiles) so
the next shape family cannot silently mis-budget:

* every chosen config's predicted bytes stay under the 16 MiB/core limit;
* the decode choices for the headline shapes are pinned (a picker edit that
  shrinks bn or ppb on these shapes is a measured perf regression — see
  BENCH.md round-2 grid-instance analysis — and must be re-benched on-chip).
"""

import pytest

from onnx_quantize_tpu.models.gemma3 import GEMMA3_1B, GEMMA3_4B, GEMMA3_270M
from onnx_quantize_tpu.ops.kernels.matmul_w4 import _pick_blocks

VMEM_LIMIT = 16 * 1024 * 1024


def zoo_shapes():
    """(label, K, N) for every Linear site in the Gemma-3 family."""
    out = []
    for name, cfg in [("270m", GEMMA3_270M), ("1b", GEMMA3_1B), ("4b", GEMMA3_4B)]:
        h, inter = cfg.hidden_size, cfg.intermediate_size
        hq, hkv, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
        sites = {
            "q": (h, hq * d),
            "kv": (h, hkv * d),
            "qkv_fused": (h, (hq + 2 * hkv) * d),
            "o": (hq * d, h),
            "gate_up": (h, 2 * inter),
            "down": (inter, h),
            "lm_head": (h, cfg.vocab_size),
        }
        out.extend((f"{name}/{site}", K, N) for site, (K, N) in sites.items())
    return out


def model_bytes(bm, bn, ppb, gs):
    """The picker's own cost model, re-stated independently so a picker edit
    that loosens the budget without touching this test fails loudly."""
    from onnx_quantize_tpu.ops.kernels.matmul_w4 import (
        _SHARED_TEMP_BM_MAX,
        _TEMP_BYTES_PER_PAIR_ELEM,
        _TEMP_BYTES_SHARED_ELEM,
    )

    streamed = (
        ppb * gs * bn
        + bm * 2 * ppb * gs * 4
        + 2 * ppb * 2 * bn * 4
        + bm * bn * 4
    )
    per_elem = (
        _TEMP_BYTES_SHARED_ELEM
        if bm <= _SHARED_TEMP_BM_MAX
        else ppb * _TEMP_BYTES_PER_PAIR_ELEM
    )
    return 2 * streamed + per_elem * gs * bn + bm * bn * 4


@pytest.mark.parametrize("label,K,N", zoo_shapes())
@pytest.mark.parametrize("gs", [64, 128])
@pytest.mark.parametrize("bm", [8, 32, 64, 256])
def test_zoo_choices_fit_vmem(label, K, N, gs, bm):
    if N % 128:
        pytest.skip("lane-untileable N handled by the jnp fallback")
    K_pad = -(-K // (2 * gs)) * (2 * gs)
    n_pairs = K_pad // (2 * gs)
    bn, ppb = _pick_blocks(bm, N, gs, n_pairs)
    assert N % bn == 0 and n_pairs % ppb == 0
    assert model_bytes(bm, bn, ppb, gs) <= VMEM_LIMIT


# Decode picks for the perf-critical headline shapes (bm=32). These exact
# configs ran the round-2/3 on-chip headlines; a picker change that alters
# them must be re-measured before shipping.
PINNED_DECODE = {
    # (K, N, gs) -> (bn, ppb)
    (640, 262144, 64): (4096, 5),    # 270M int8-era W4 lm_head alt
    (640, 262144, 128): (4096, 3),   # 270M lm_head g128
    (640, 4096, 128): (4096, 3),     # 270M gate_up
    (1152, 13824, 128): (3456, 5),   # 1B gate_up
    (1152, 262144, 128): (2048, 5),  # 1B lm_head
    (2560, 262144, 64): (4096, 10),  # 4B lm_head g64 (bench recipe)
    (2560, 20480, 128): (2560, 10),  # 4B gate_up
}


@pytest.mark.parametrize("key,expect", sorted(PINNED_DECODE.items()))
def test_pinned_decode_choices(key, expect):
    K, N, gs = key
    K_pad = -(-K // (2 * gs)) * (2 * gs)
    n_pairs = K_pad // (2 * gs)
    assert _pick_blocks(32, N, gs, n_pairs) == expect
