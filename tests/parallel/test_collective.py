"""Pipelined overlapped-collective matmuls vs the single-device oracle.

Runs on the 8-virtual-CPU-device mesh (conftest). The ppermute ring schedules
must be numerically identical to all_gather-then-dot / dot-then-psum — these
tests pin that, including the ring-accumulation ordering invariant in
``matmul_reduce_scatter`` and the end-to-end sequence-parallel pair.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from onnx_quantize_tpu.algorithms.rtn import rtn_quantize
from onnx_quantize_tpu.core.dtypes import QuantType
from onnx_quantize_tpu.core.enums import QuantizationStrategy
from onnx_quantize_tpu.nn.qtensor import make_qtensor
from onnx_quantize_tpu.ops.reference import quantized_matmul_jnp
from onnx_quantize_tpu.parallel import make_mesh
from onnx_quantize_tpu.parallel.collective import (
    allgather_matmul,
    matmul_reduce_scatter,
    sequence_parallel_pair,
)


@pytest.fixture(scope="module", params=[2, 4])
def mesh(request):
    return make_mesh(model_parallel=request.param)


def _qt(rng, K, N, qt_type=QuantType.QUInt4, gs=16):
    w = (0.1 * rng.standard_normal((K, N))).astype(np.float32)
    strategy = QuantizationStrategy.GROUP if gs > 0 else QuantizationStrategy.CHANNEL
    q, s, zp = rtn_quantize(w, qt_type, strategy, gs, False, False)
    return make_qtensor(
        q, s, zp, quant_type=qt_type, strategy=strategy, group_size=gs,
        symmetric=False, reduce_range=False,
    )


def test_allgather_matmul_matches_oracle(rng, mesh):
    qt = _qt(rng, K=64, N=256, gs=16)
    x = jnp.asarray(rng.standard_normal((16, 64)).astype(np.float32))
    got = np.asarray(allgather_matmul(x, qt, mesh))
    want = np.asarray(quantized_matmul_jnp(x, qt))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_allgather_matmul_int8(rng, mesh):
    qt = _qt(rng, K=64, N=256, qt_type=QuantType.QInt8, gs=-1)
    x = jnp.asarray(rng.standard_normal((8, 64)).astype(np.float32))
    got = np.asarray(allgather_matmul(x, qt, mesh))
    want = np.asarray(quantized_matmul_jnp(x, qt))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_matmul_reduce_scatter_matches_oracle(rng, mesh):
    tp = mesh.shape["model"]
    # K-sharded weight: local K must stay group-pair aligned (2 * gs | K/tp).
    qt = _qt(rng, K=tp * 64, N=128, gs=16)
    h = jnp.asarray(rng.standard_normal((16, tp * 64)).astype(np.float32))
    got = np.asarray(matmul_reduce_scatter(h, qt, mesh))
    want = np.asarray(quantized_matmul_jnp(h, qt))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_sequence_parallel_pair_matches_dense_chain(rng, mesh):
    tp = mesh.shape["model"]
    K, H = 64, tp * 64
    qt_up = _qt(rng, K=K, N=H, gs=16)
    qt_down = _qt(rng, K=H, N=K, gs=16)
    x = jnp.asarray(rng.standard_normal((16, K)).astype(np.float32))

    got = np.asarray(
        sequence_parallel_pair(x, qt_up, qt_down, mesh, activation=jax.nn.gelu)
    )
    h = quantized_matmul_jnp(x, qt_up)
    want = np.asarray(quantized_matmul_jnp(jax.nn.gelu(h), qt_down))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_ring_schedules_are_permutation_safe(rng):
    """tp=8 (full virtual mesh): the ring invariant holds at max hop count."""
    mesh = make_mesh(model_parallel=8)
    qt = _qt(rng, K=8 * 32, N=128, gs=16)
    h = jnp.asarray(rng.standard_normal((8, 8 * 32)).astype(np.float32))
    got = np.asarray(matmul_reduce_scatter(h, qt, mesh))
    want = np.asarray(quantized_matmul_jnp(h, qt))
    np.testing.assert_allclose(got, want, atol=1e-4)

    qt2 = _qt(rng, K=64, N=1024, gs=16)
    x = jnp.asarray(rng.standard_normal((8, 64)).astype(np.float32))
    got2 = np.asarray(allgather_matmul(x, qt2, mesh))
    want2 = np.asarray(quantized_matmul_jnp(x, qt2))
    np.testing.assert_allclose(got2, want2, atol=1e-5)
