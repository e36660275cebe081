import numpy as np
import pytest

from onnx_quantize_tpu import native
from onnx_quantize_tpu.nn.qtensor import _pack_group_pairs, pack_layout
from onnx_quantize_tpu.core.enums import QuantizationStrategy


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no C++ toolchain)")
    return lib


@pytest.mark.parametrize("K, N, gs", [(64, 32, 16), (96, 40, 32), (63, 8, 32)])
@pytest.mark.parametrize("signed", [False, True])
def test_native_pack_matches_numpy(rng, lib, K, N, gs, signed):
    lo, hi = (-8, 7) if signed else (0, 15)
    q = rng.integers(lo, hi + 1, size=(K, N)).astype(np.int8)
    n_groups = -(-K // gs)
    if n_groups % 2:
        n_groups += 1
    expected = _numpy_pack(q, gs, n_groups)
    got = native.pack_group_pairs(q, gs, n_groups)
    np.testing.assert_array_equal(got, expected)

    unpacked = native.unpack_group_pairs(got, K, N, gs, signed)
    np.testing.assert_array_equal(unpacked, q)


def _numpy_pack(q, gs, n_groups_pad):
    K, N = q.shape
    K_pad = n_groups_pad * gs
    u = q.astype(np.int32)
    u = np.where(u < 0, u + 16, u).astype(np.uint8)
    if K_pad != K:
        u = np.concatenate([u, np.zeros((K_pad - K, N), np.uint8)], axis=0)
    u = u.reshape(n_groups_pad // 2, 2, gs, N)
    return ((u[:, 0] & 0x0F) | ((u[:, 1] & 0x0F) << 4)).reshape(K_pad // 2, N)


def test_native_pack_agrees_with_qtensor_pack(rng, lib):
    q = rng.integers(0, 16, size=(128, 48)).astype(np.int8)
    gs, n_groups = pack_layout(128, QuantizationStrategy.GROUP, 32)
    np.testing.assert_array_equal(
        native.pack_group_pairs(q, gs, n_groups), _pack_group_pairs(q, gs, n_groups)
    )


def test_native_minmax_rows(rng, lib):
    x = rng.standard_normal((37, 129)).astype(np.float32)
    mins, maxs = native.minmax_rows(x)
    np.testing.assert_allclose(mins, x.min(axis=1), rtol=1e-7)
    np.testing.assert_allclose(maxs, x.max(axis=1), rtol=1e-7)
