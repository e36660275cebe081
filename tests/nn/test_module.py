"""Direct tests of the module system (``nn/module.py``): naming, site
collection, activation taps, and the prescale hook — the framework's analogue
of the reference's graph traversal + output-augmentation calibration trick
(``calibrate.py:108-124``)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from onnx_quantize_tpu import nn
from onnx_quantize_tpu.nn.module import Context

from tests.helpers import GemmModel, MixedModel, TwoMatMul


def test_finalize_assigns_dotted_names():
    m = TwoMatMul()
    names = [s.name for s in m.linear_sites()]
    assert names == ["fc1", "fc2"]


def test_nested_site_names():
    class Outer(nn.Module):
        def __init__(self):
            super().__init__()
            self.block = TwoMatMul()
            self.head = nn.Linear(8, 4, use_bias=False)
            self.finalize()

        def __call__(self, params, x, ctx=None):
            return self.head(params["head"], self.block(params["block"], x, ctx=ctx), ctx=ctx)

    names = [s.name for s in Outer().linear_sites()]
    assert names == ["block.fc1", "block.fc2", "head"]


def test_op_types():
    sites = {s.name: s.op_type for s in MixedModel().linear_sites()}
    assert sites == {"mm": "MatMul", "gemm": "Gemm"}


def test_site_shapes():
    m = TwoMatMul(d_in=16, d_mid=32, d_out=8)
    s1, s2 = m.linear_sites()
    assert (s1.in_features, s1.out_features) == (16, 32)
    assert (s2.in_features, s2.out_features) == (32, 8)
    assert s1.param_path == ("fc1",)


def test_taps_collect_inputs_and_outputs(rng):
    m = GemmModel()
    params = m.random_params(rng)
    x = jnp.asarray(rng.standard_normal((3, 16)), jnp.float32)
    ctx = Context(taps={}, tap_inputs=True, tap_outputs=True)
    y = m(params, x, ctx=ctx)
    assert set(ctx.taps) == {"fc1", "fc2"}
    np.testing.assert_array_equal(np.asarray(ctx.taps["fc1"]["input"]), np.asarray(x))
    # output tap is post-bias
    want = np.asarray(x) @ np.asarray(params["fc1"]["w"]) + np.asarray(params["fc1"]["b"])
    np.testing.assert_allclose(np.asarray(ctx.taps["fc1"]["output"]), want, rtol=1e-6)
    # fc2 input is fc1 output
    np.testing.assert_array_equal(
        np.asarray(ctx.taps["fc2"]["input"]), np.asarray(ctx.taps["fc1"]["output"])
    )
    np.testing.assert_array_equal(np.asarray(ctx.taps["fc2"]["output"]), np.asarray(y))


def test_tap_names_filter(rng):
    m = GemmModel()
    params = m.random_params(rng)
    x = jnp.asarray(rng.standard_normal((2, 16)), jnp.float32)
    ctx = Context(taps={}, tap_inputs=True, tap_outputs=False, tap_names={"fc2"})
    m(params, x, ctx=ctx)
    assert set(ctx.taps) == {"fc2"}
    assert "output" not in ctx.taps["fc2"]


def test_input_tap_is_post_prescale(rng):
    """The calibration tap must see the SmoothQuant/AWQ-folded input — the
    reference re-calibrates after its pre-passes for the same reason."""
    m = TwoMatMul()
    params = m.random_params(rng)
    prescale = jnp.asarray(rng.random(16).astype(np.float32) + 0.5)
    params["fc1"]["prescale"] = prescale
    x = jnp.asarray(rng.standard_normal((2, 16)), jnp.float32)
    ctx = Context(taps={}, tap_inputs=True)
    m(params, x, ctx=ctx)
    np.testing.assert_allclose(
        np.asarray(ctx.taps["fc1"]["input"]), np.asarray(x * prescale), rtol=1e-6
    )


def test_no_ctx_no_taps(rng):
    m = TwoMatMul()
    params = m.random_params(rng)
    x = jnp.asarray(rng.standard_normal((2, 16)), jnp.float32)
    # ctx=None and taps=None must both be silent no-ops
    m(params, x)
    ctx = Context(taps=None, tap_inputs=True, tap_outputs=True)
    m(params, x, ctx=ctx)


def test_sequential_ordering(rng):
    seq = nn.Sequential(
        nn.Linear(8, 8, use_bias=False), nn.Linear(8, 4, use_bias=False)
    )
    seq.finalize()
    names = [s.name for s in seq.linear_sites()]
    assert names == ["0", "1"]
    params = seq.init(jax.random.key(0))
    x = jnp.asarray(rng.standard_normal((2, 8)), jnp.float32)
    want = np.asarray(x) @ np.asarray(params["0"]["w"]) @ np.asarray(params["1"]["w"])
    np.testing.assert_allclose(np.asarray(seq(params, x)), want, rtol=1e-4, atol=1e-6)


def test_init_deterministic():
    m = TwoMatMul()
    p1 = m.init(jax.random.key(7))
    p2 = m.init(jax.random.key(7))
    np.testing.assert_array_equal(np.asarray(p1["fc1"]["w"]), np.asarray(p2["fc1"]["w"]))
    # different key -> different weights
    p3 = m.init(jax.random.key(8))
    assert not np.array_equal(np.asarray(p1["fc1"]["w"]), np.asarray(p3["fc1"]["w"]))
