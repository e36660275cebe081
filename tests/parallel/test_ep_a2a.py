"""Token-sharded expert parallelism (all_to_all dispatch/combine).

``a2a_moe_mlp`` with worst-case capacity must EXACTLY reproduce the
single-device MoE MLP on the full token set (no token can drop); with a
tight capacity, over-budget choices contribute zero (the GShard drop
semantics). Runs on the CPU mesh over fp and quantized stacked experts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

import onnx_quantize_tpu as oqt
from onnx_quantize_tpu.models.gemma3 import Gemma3, fuse_gemma3_projections
from onnx_quantize_tpu.models.moe import stack_moe_experts, tiny_moe_config
from onnx_quantize_tpu.nn.qtensor import QTensor
from onnx_quantize_tpu.parallel.ep import a2a_moe_mlp

EP = 4


def _setup(quantized: bool):
    cfg = tiny_moe_config(num_experts=4, num_experts_per_tok=2,
                          hidden_size=64, moe_intermediate_size=96,
                          norm_topk_prob=True)
    model = Gemma3(cfg)
    params = model.init(jax.random.key(0))
    if quantized:
        params, _ = oqt.quantize(
            model, params,
            oqt.QConfig(weights=oqt.QWeightArgs(dtype="uint4", group_size=16),
                        ignore=[r"\.router$"]),
        )
    stacked = stack_moe_experts(fuse_gemma3_projections(params))
    mlp_module = model.blocks[0].mlp
    mlp_params = stacked["layers.0"]["mlp"]
    return cfg, mlp_module, mlp_params


def _specs(tree, axis):
    def spec(leaf):
        if isinstance(leaf, QTensor):
            children, meta = leaf.tree_flatten()
            return QTensor.tree_unflatten(
                meta, tuple(None if c is None else P(axis) for c in children)
            )
        return P(axis)

    return jax.tree.map(spec, tree, is_leaf=lambda x: isinstance(x, QTensor))


@pytest.mark.parametrize("quantized", [False, True], ids=["fp", "quantized"])
def test_a2a_matches_single_device(quantized):
    cfg, mlp_module, mlp_params = _setup(quantized)
    mesh = Mesh(np.asarray(jax.devices()[:EP]), ("ep",))
    rng = np.random.default_rng(0)
    M = 8 * EP
    x = jnp.asarray(rng.standard_normal((M, cfg.hidden_size)), jnp.float32)

    # Reference: the module's dense-masked path on the full token set.
    ref = np.asarray(mlp_module(mlp_params, x[:, None, :])[:, 0])

    # Routing is computed replicated (router weights are replicated in the
    # engine's EP layout too); shard the per-token results with the tokens.
    top_p, top_i = mlp_module._routing(mlp_params, x, None)
    experts = mlp_params["_stacked_experts"]

    def fn(x_local, tp, ti, experts_local):
        return a2a_moe_mlp(
            x_local, experts_local, tp, ti, axis="ep",
            num_experts=cfg.num_experts, activation=mlp_module.activation,
        )

    out = jax.jit(shard_map(
        fn, mesh=mesh,
        in_specs=(P("ep"), P("ep"), P("ep"), _specs(experts, "ep")),
        out_specs=P("ep"),
        check_vma=False,
    ))(x, top_p, top_i, experts)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=2e-5)


def test_a2a_capacity_drops_are_zero_contributions():
    cfg, mlp_module, mlp_params = _setup(False)
    mesh = Mesh(np.asarray(jax.devices()[:EP]), ("ep",))
    rng = np.random.default_rng(1)
    M = 8 * EP
    x = jnp.asarray(rng.standard_normal((M, cfg.hidden_size)), jnp.float32)
    top_p, top_i = mlp_module._routing(mlp_params, x, None)
    experts = mlp_params["_stacked_experts"]

    def run(capacity):
        def fn(x_local, tp, ti, experts_local):
            return a2a_moe_mlp(
                x_local, experts_local, tp, ti, axis="ep",
                num_experts=cfg.num_experts,
                activation=mlp_module.activation, capacity=capacity,
            )

        return np.asarray(jax.jit(shard_map(
            fn, mesh=mesh,
            in_specs=(P("ep"), P("ep"), P("ep"), _specs(experts, "ep")),
            out_specs=P("ep"),
            check_vma=False,
        ))(x, top_p, top_i, experts))

    exact = run(None)
    # capacity=1: at most one choice per (device, expert) survives; outputs
    # must differ (drops happened) but stay finite, and a token whose every
    # choice dropped contributes exactly zero.
    dropped = run(1)
    assert np.isfinite(dropped).all()
    assert not np.allclose(dropped, exact)
    # Worst-case capacity on each shard is M_local * k: explicit value equals
    # the default sizing.
    np.testing.assert_array_equal(run((M // EP) * cfg.num_experts_per_tok), exact)
