"""Interop with the reference's MatMulNBits artifact layout.

The reference's only durable artifact is a quantized ONNX model whose
weights-only group-quantized sites carry ``com.microsoft::MatMulNBits`` blobs
(packing defined at ``/root/reference/src/onnx_quantize/qrules/_common.py:65-123``):

* ``data``: ``(N, n_blocks, block_size * bits // 8)`` uint8 — the (K, N)
  q-weight transposed to (N, K), split into K-groups, and (for 4-bit) nibble
  packed with the LOW nibble holding the even K index;
* ``scales``: ``(N, n_blocks)``;
* ``zero_points``: float (HQQ-style) or int. Int 4-bit zero points with
  ``n_blocks > 1`` are nibble-packed per row, padded to an even count with
  the 0x8 nibble; ``n_blocks == 1`` and float zero points stay unpacked.

These functions translate that layout to/from :class:`QTensor` so this
framework can execute reference-produced artifacts (and the reference can
execute ours) without ONNX deps — the blobs are plain numpy arrays however
they were extracted from the model file.  Bit-exactness is testable because
both sides pin the same container values (``tests/test_interop.py``).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from onnx_quantize_tpu.core.dtypes import QuantType
from onnx_quantize_tpu.core.enums import QFormat, QuantizationStrategy
from onnx_quantize_tpu.nn.qtensor import QTensor, make_qtensor, unpack_k_pairs

__all__ = ["MatMulNBits", "export_matmul_nbits", "import_matmul_nbits"]


@dataclasses.dataclass(frozen=True)
class MatMulNBits:
    """A reference-layout MatMulNBits site: the op's initializers + attrs."""

    data: np.ndarray          # (N, n_blocks, blob_size) uint8
    scales: np.ndarray        # (N, n_blocks)
    zero_points: np.ndarray   # packed u8 / unpacked int / float, per layout
    K: int
    N: int
    bits: int
    block_size: int


def _unpack_nibble_rows(packed: np.ndarray, count: int) -> np.ndarray:
    """(rows, ceil(count/2)) packed u8 -> (rows, count), low nibble first."""
    low = packed & 0x0F
    high = (packed >> 4) & 0x0F
    full = np.stack([low, high], axis=-1).reshape(packed.shape[0], -1)
    return full[:, :count]


def _pack_nibble_rows(vals: np.ndarray) -> np.ndarray:
    """(rows, count) -> (rows, ceil(count/2)) u8; odd counts pad with 0x8
    (the reference's default nibble, ``_common.py:96-118``)."""
    rows, count = vals.shape
    v = vals.astype(np.uint8)
    if count % 2 == 1:
        v = np.concatenate([v, np.full((rows, 1), 0x8, np.uint8)], axis=1)
    return (v[:, ::2] & 0x0F) | ((v[:, 1::2] & 0x0F) << 4)


def import_matmul_nbits(
    data: np.ndarray,
    scales: np.ndarray,
    zero_points: np.ndarray | None,
    *,
    K: int,
    N: int,
    bits: int,
    block_size: int,
) -> QTensor:
    """Build a QTensor from reference MatMulNBits initializers.

    Follows the op's semantics: uint container values, GROUP strategy over K
    with ``block_size``, weights-only QDQ execution. ``zero_points=None``
    means the symmetric default (mid-range).
    """
    if bits not in (4, 8):
        raise ValueError(f"MatMulNBits bits must be 4 or 8, got {bits}")
    if K % block_size != 0:
        raise ValueError(
            f"MatMulNBits requires block_size | K (got K={K}, block_size={block_size})"
        )
    n_blocks = K // block_size
    qt_type = QuantType.QUInt4 if bits == 4 else QuantType.QUInt8

    blob = np.asarray(data, np.uint8).reshape(N, n_blocks, -1)
    if bits == 4:
        rows = _unpack_nibble_rows(blob.reshape(N * n_blocks, -1), block_size)
    else:
        rows = blob.reshape(N * n_blocks, block_size)
    q = rows.reshape(N, K).T.copy()  # (K, N) container values

    scales = np.asarray(scales).reshape(N, n_blocks)
    if zero_points is None:
        zp = np.full((N, n_blocks), 1 << (bits - 1), np.float32)
        symmetric = True
    else:
        zp_arr = np.asarray(zero_points)
        symmetric = False
        if np.issubdtype(zp_arr.dtype, np.floating):
            zp = zp_arr.reshape(N, n_blocks)  # HQQ float zp, never packed
        elif bits == 4 and n_blocks > 1:
            zp = _unpack_nibble_rows(zp_arr.reshape(N, -1), n_blocks)
        else:
            zp = zp_arr.reshape(N, n_blocks)

    # make_qtensor's algorithm layout: (N * n_groups,) row-major over out
    # channels — exactly the reference's (N, n_blocks) flattened.
    return make_qtensor(
        q,
        scales.reshape(-1, 1),
        np.asarray(zp).reshape(-1, 1),
        quant_type=qt_type,
        strategy=QuantizationStrategy.GROUP,
        group_size=block_size,
        symmetric=symmetric,
        reduce_range=False,
        fmt=QFormat.QDQ,
    )


def export_matmul_nbits(qt: QTensor) -> MatMulNBits:
    """Repack a weights-only GROUP QTensor into the reference blob layout.

    The inverse of :func:`import_matmul_nbits`; the produced arrays drop into
    a ``com.microsoft::MatMulNBits`` node's initializers unchanged. Only
    sites the reference itself would emit as MatMulNBits are accepted
    (uint4/uint8, GROUP with block_size | K — ``_common.py:32-62``).
    """
    meta = qt.meta
    K, N = meta.shape
    bits = meta.qt.bitwidth
    if meta.strat != QuantizationStrategy.GROUP:
        raise ValueError("MatMulNBits export requires GROUP strategy")
    if meta.qt not in (QuantType.QUInt4, QuantType.QUInt8):
        raise ValueError(
            f"MatMulNBits export supports uint4/uint8 weights, got {meta.qt}"
        )
    block_size = meta.group_size if meta.group_size > 0 else K
    block_size = min(block_size, K)
    if K % block_size != 0:
        raise ValueError(
            f"MatMulNBits export requires block_size | K (K={K}, bs={block_size})"
        )
    n_blocks = K // block_size

    if meta.packed:
        q = np.asarray(unpack_k_pairs(qt.data, K, meta.qt.is_signed, meta.pack_group))
    else:
        q = np.asarray(qt.data)
    q = q.astype(np.uint8)

    rows = q.T.reshape(N * n_blocks, block_size)  # (N, K) split into K-groups
    if bits == 4:
        blob = _pack_nibble_rows(rows)  # block_size is even (>=16 pow2)
    else:
        blob = rows
    blob = blob.reshape(N, n_blocks, block_size * bits // 8)

    scale = np.asarray(qt.scale)  # engine layout (n_groups, N)
    zp = np.asarray(qt.zero_point)
    if scale.ndim == 3:  # kernel-baked (G_pad/2, 2, N) layout
        scale = scale.reshape(-1, N)[:n_blocks]
        zp = zp.reshape(-1, N)[:n_blocks]
    scales = scale.reshape(n_blocks, N).T.copy()

    zpT = zp.reshape(n_blocks, N).T
    if np.issubdtype(zpT.dtype, np.floating) and not np.all(zpT == np.round(zpT)):
        zero_points = zpT.copy()  # float zp (HQQ) stays unpacked
    elif bits == 4 and n_blocks > 1:
        zero_points = _pack_nibble_rows(zpT.astype(np.uint8))
    else:
        zero_points = zpT.astype(np.uint8).copy()

    return MatMulNBits(
        data=blob, scales=scales, zero_points=zero_points,
        K=K, N=N, bits=bits, block_size=block_size,
    )
