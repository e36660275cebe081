import pytest

from onnx_quantize_tpu.core.dtypes import QuantType


@pytest.mark.parametrize(
    "qt, sym, rr, expected",
    [
        (QuantType.QInt8, False, False, (-128, 127)),
        (QuantType.QInt8, True, False, (-127, 127)),
        (QuantType.QInt8, False, True, (-64, 64)),
        (QuantType.QInt8, True, True, (-64, 64)),
        (QuantType.QUInt8, False, False, (0, 255)),
        (QuantType.QUInt8, True, False, (0, 255)),
        (QuantType.QUInt8, False, True, (0, 127)),
        (QuantType.QInt4, False, False, (-8, 7)),
        (QuantType.QInt4, True, False, (-7, 7)),
        (QuantType.QInt4, False, True, (-4, 3)),
        (QuantType.QUInt4, False, False, (0, 15)),
        (QuantType.QUInt4, True, False, (0, 15)),
        (QuantType.QUInt4, False, True, (0, 7)),
        (QuantType.QInt32, True, False, (-(2**31 - 1), 2**31 - 1)),
        (QuantType.QInt32, False, False, (-(2**31), 2**31 - 1)),
        (QuantType.QUInt32, False, False, (0, 2**32 - 1)),
        (QuantType.QUInt32, False, True, (0, 2**31 - 1)),
    ],
)
def test_qrange_table(qt, sym, rr, expected):
    assert qt.qrange(sym, rr) == expected


def test_from_string():
    assert QuantType.from_string("int8") is QuantType.QInt8
    assert QuantType.from_string(" UINT4 ") is QuantType.QUInt4
    with pytest.raises(ValueError, match="Invalid quantization type"):
        QuantType.from_string("int2")


def test_bitwidth_and_signedness():
    assert QuantType.QInt4.bitwidth == 4
    assert QuantType.QUInt8.bitwidth == 8
    assert QuantType.QInt32.bitwidth == 32
    assert QuantType.QInt8.is_signed
    assert not QuantType.QUInt4.is_signed


def test_container_dtypes():
    import numpy as np

    assert QuantType.QInt4.container_dtype == np.int8
    assert QuantType.QUInt4.container_dtype == np.uint8
    assert QuantType.QInt8.container_dtype == np.int8
