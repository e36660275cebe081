"""4-bit nibble packing.

Capability parity with the reference pack layer
(``/root/reference/src/onnx_quantize/core/_pack.py:8-115``): two 4-bit values per
byte, even element in the low nibble, odd element in the high nibble, odd-length
arrays padded with one zero nibble. Signed int4 uses two's-complement nibbles
((-8..7) -> (8..15, 0..7)).

Two implementations are provided:
  * numpy (host / checkpoint path),
  * jnp (device path; used by tests to validate the Pallas in-kernel unpack).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from onnx_quantize_tpu.core.dtypes import QuantType

__all__ = ["pack", "unpack", "pack_jnp", "unpack_jnp"]


def _pack_nibbles_np(flat_u8: np.ndarray) -> np.ndarray:
    """Pack a flat uint8 array of values in [0, 15] into nibbles."""
    size = flat_u8.size
    if size % 2 == 1:
        flat_u8 = np.concatenate([flat_u8, np.zeros(1, dtype=np.uint8)])
    low = flat_u8[0::2] & 0x0F
    high = (flat_u8[1::2] & 0x0F) << 4
    return (low | high).astype(np.uint8)


def _unpack_nibbles_np(packed: np.ndarray, count: int) -> np.ndarray:
    """Unpack nibble-packed bytes to ``count`` uint8 values in [0, 15]."""
    out = np.empty(packed.size * 2, dtype=np.uint8)
    out[0::2] = packed & 0x0F
    out[1::2] = (packed >> 4) & 0x0F
    return out[:count]


def pack(array: np.ndarray, quant_type: QuantType) -> np.ndarray:
    """Pack an integer array for storage.

    4-bit types are packed two-per-byte into uint8; 8/32-bit types pass through
    with a cast to their container dtype (ref semantics at ``_pack.py:95-98``).
    """
    array = np.asarray(array)
    if quant_type.bitwidth != 4:
        return array.astype(quant_type.container_dtype)

    vals = array.astype(np.int32)
    if quant_type is QuantType.QInt4:
        # two's complement: map [-8, -1] -> [8, 15]
        vals = np.where(vals < 0, vals + 16, vals)
    return _pack_nibbles_np(vals.ravel().astype(np.uint8))


def unpack(array: np.ndarray, dims: tuple[int, ...], quant_type: QuantType) -> np.ndarray:
    """Unpack a packed array back to its container dtype with shape ``dims``."""
    array = np.asarray(array)
    if quant_type.bitwidth != 4:
        return array.astype(quant_type.container_dtype).reshape(dims)

    count = int(np.prod(dims))
    u4 = _unpack_nibbles_np(array.ravel().astype(np.uint8), count)
    if quant_type is QuantType.QInt4:
        signed = u4.astype(np.int8)
        signed = np.where(signed > 7, signed - 16, signed)
        return signed.reshape(dims)
    return u4.reshape(dims)


def pack_jnp(array: jnp.ndarray, quant_type: QuantType) -> jnp.ndarray:
    """Device-side nibble pack (jnp). Same layout as :func:`pack`."""
    if quant_type.bitwidth != 4:
        return array.astype(jnp.dtype(quant_type.container_dtype))

    vals = array.astype(jnp.int32)
    if quant_type is QuantType.QInt4:
        vals = jnp.where(vals < 0, vals + 16, vals)
    flat = vals.reshape(-1).astype(jnp.uint8)
    if flat.size % 2 == 1:
        flat = jnp.concatenate([flat, jnp.zeros(1, dtype=jnp.uint8)])
    low = flat[0::2] & 0x0F
    high = (flat[1::2] & 0x0F) << 4
    return low | high


def unpack_jnp(array: jnp.ndarray, dims: tuple[int, ...], quant_type: QuantType) -> jnp.ndarray:
    """Device-side nibble unpack (jnp). Same layout as :func:`unpack`."""
    if quant_type.bitwidth != 4:
        return array.astype(jnp.dtype(quant_type.container_dtype)).reshape(dims)

    count = 1
    for d in dims:
        count *= d
    packed = array.reshape(-1)
    low = packed & 0x0F
    high = (packed >> 4) & 0x0F
    interleaved = jnp.stack([low, high], axis=1).reshape(-1)[:count]
    if quant_type is QuantType.QInt4:
        signed = interleaved.astype(jnp.int8)
        signed = jnp.where(signed > 7, signed - 16, signed)
        return signed.reshape(dims)
    return interleaved.astype(jnp.uint8).reshape(dims)
