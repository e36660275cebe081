import numpy as np
import pytest

from onnx_quantize_tpu.core.dtypes import QuantType
from onnx_quantize_tpu.core.pack import pack, pack_jnp, unpack, unpack_jnp


def test_pack_uint4_hand_computed():
    # even element -> low nibble, odd element -> high nibble
    arr = np.array([1, 2, 3, 4], dtype=np.uint8)
    packed = pack(arr, QuantType.QUInt4)
    np.testing.assert_array_equal(packed, np.array([0x21, 0x43], dtype=np.uint8))


def test_pack_int4_twos_complement():
    arr = np.array([-1, 7, -8, 0], dtype=np.int8)
    packed = pack(arr, QuantType.QInt4)
    # -1 -> 0xF, 7 -> 0x7, -8 -> 0x8, 0 -> 0x0
    np.testing.assert_array_equal(packed, np.array([0x7F, 0x08], dtype=np.uint8))


def test_pack_odd_length_pads_zero_nibble():
    arr = np.array([5, 6, 7], dtype=np.uint8)
    packed = pack(arr, QuantType.QUInt4)
    np.testing.assert_array_equal(packed, np.array([0x65, 0x07], dtype=np.uint8))


@pytest.mark.parametrize("qt", [QuantType.QInt4, QuantType.QUInt4])
@pytest.mark.parametrize("shape", [(6,), (3, 5), (4, 4), (7,)])
def test_pack_unpack_roundtrip_4bit(rng, qt, shape):
    lo, hi = qt.qrange(is_symmetric=False)
    arr = rng.integers(lo, hi + 1, size=shape).astype(qt.container_dtype)
    packed = pack(arr, qt)
    out = unpack(packed, shape, qt)
    np.testing.assert_array_equal(out, arr)
    assert out.dtype == qt.container_dtype


@pytest.mark.parametrize("qt", [QuantType.QInt8, QuantType.QUInt8, QuantType.QInt32])
def test_pack_8_32bit_passthrough(rng, qt):
    lo, hi = -100, 100
    if not qt.is_signed:
        lo = 0
    arr = rng.integers(lo, hi, size=(4, 3))
    packed = pack(arr, qt)
    assert packed.dtype == qt.container_dtype
    np.testing.assert_array_equal(unpack(packed, (4, 3), qt), arr.astype(qt.container_dtype))


@pytest.mark.parametrize("qt", [QuantType.QInt4, QuantType.QUInt4])
def test_jnp_pack_matches_numpy(rng, qt):
    lo, hi = qt.qrange(is_symmetric=False)
    arr = rng.integers(lo, hi + 1, size=(5, 4)).astype(qt.container_dtype)
    np.testing.assert_array_equal(np.asarray(pack_jnp(arr, qt)), pack(arr, qt))
    packed = pack(arr, qt)
    np.testing.assert_array_equal(
        np.asarray(unpack_jnp(packed, (5, 4), qt)), unpack(packed, (5, 4), qt)
    )
