import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

import onnx_quantize_tpu as oqt
from onnx_quantize_tpu import ops
from onnx_quantize_tpu.models.gemma3 import Gemma3, Gemma3Config
from onnx_quantize_tpu.parallel import make_mesh, shard_params


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "tests expect the 8-device virtual CPU mesh"
    return make_mesh(model_parallel=4)


@pytest.fixture(scope="module")
def quantized_tiny():
    cfg = Gemma3Config.tiny(
        hidden_size=128, intermediate_size=256, num_layers=2, num_heads=2,
        num_kv_heads=2, head_dim=64, vocab_size=512,
    )
    model = Gemma3(cfg)
    params = model.init(jax.random.key(0))
    # gs=32 divides every site's per-shard K (128/4, 256/4) so row-parallel
    # sharding stays group-aligned.
    qc = oqt.QConfig(
        weights=oqt.QWeightArgs(dtype="uint4", group_size=32), ignore=["lm_head"]
    )
    qparams, _ = oqt.quantize(model, params, qc)
    return model, params, qparams


def test_mesh_shape(mesh):
    assert mesh.shape == {"data": 2, "model": 4}


def test_qtensor_sharding_layout(mesh, quantized_tiny):
    model, _, qparams = quantized_tiny
    sharded = shard_params(model, qparams, mesh)
    qkv = sharded["layers.0"]["attn"]["q_proj"]["w"]
    # Column parallel: N axis of packed data and scales on "model".
    assert qkv.data.sharding.spec == P(None, "model")
    assert qkv.scale.sharding.spec == P(None, "model")
    o = sharded["layers.0"]["attn"]["o_proj"]["w"]
    assert o.data.sharding.spec == P("model", None)
    assert o.scale.sharding.spec == P("model", None)
    emb = sharded["embed"]["w"]
    assert emb.sharding.spec == P("model", None)


def test_sharded_forward_matches_single_device(mesh, quantized_tiny):
    model, _, qparams = quantized_tiny
    ids = (np.arange(4 * 8, dtype=np.int32).reshape(4, 8)) % 512

    ops.set_impl("jnp")
    try:
        y_single = np.asarray(model(qparams, ids))
        sharded = shard_params(model, qparams, mesh)
        ids_sharded = jax.device_put(
            jnp.asarray(ids), NamedSharding(mesh, P("data", None))
        )
        y_sharded = np.asarray(jax.jit(lambda p, i: model(p, i))(sharded, ids_sharded))
        np.testing.assert_allclose(y_sharded, y_single, atol=2e-4)
    finally:
        ops.set_impl("auto")


def test_row_parallel_misaligned_groups_replicate(mesh):
    """gs that does not divide K/shards must fall back to replication."""
    from onnx_quantize_tpu.algorithms.rtn import rtn_quantize
    from onnx_quantize_tpu.core.dtypes import QuantType
    from onnx_quantize_tpu.core.enums import QuantizationStrategy
    from onnx_quantize_tpu.nn.qtensor import make_qtensor
    from onnx_quantize_tpu.parallel.sharding import qtensor_shardings

    rng = np.random.default_rng(0)
    w = rng.standard_normal((96, 128)).astype(np.float32)  # 96/4 = 24, gs=32 no
    q, s, zp = rtn_quantize(w, QuantType.QUInt4, QuantizationStrategy.GROUP, 32, False, False)
    qt = make_qtensor(q, s, zp, quant_type=QuantType.QUInt4,
                      strategy=QuantizationStrategy.GROUP, group_size=32,
                      symmetric=False, reduce_range=False)
    sharded = qtensor_shardings(qt, "row", mesh)
    assert sharded.data.sharding.spec == P()
