"""shard_map tensor-parallel quantized matmuls.

The manual-collective path (SURVEY.md §2B "overlapped collectives"): under
``shard_map`` each device runs the *local* Pallas kernel on its weight shard
and the collective is explicit —

  * column-parallel: x replicated, N sharded; local kernel; optionally
    all-gather the output (or keep it sharded for a following row-parallel op),
  * row-parallel: x sharded on features, K sharded; local kernel; ``psum``
    over the model axis.

The column→row pairing (q/k/v→o, gate/up→down) needs exactly one psum per
pair and no all-gathers — the standard Megatron schedule. GSPMD reaches the
same schedule automatically on the jnp path; this module exists so the Pallas
kernels (which GSPMD cannot partition) run tensor-parallel too.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from onnx_quantize_tpu.nn.qtensor import QTensor, QTensorMeta

__all__ = ["column_parallel_matmul", "row_parallel_matmul", "tp_pair_matmul"]


def _local_meta(meta: QTensorMeta, shards: int, axis: str) -> QTensorMeta:
    """Meta for the per-device weight shard."""
    K, N = meta.shape
    if axis == "column":
        return dataclasses.replace(meta, shape=(K, N // shards))
    local_gs = meta.group_size
    return dataclasses.replace(meta, shape=(K // shards, N), group_size=local_gs)


def _call_local(x, qt_local, bias):
    from onnx_quantize_tpu.ops import quantized_matmul

    return quantized_matmul(x, qt_local, bias)


def column_parallel_matmul(x, qt: QTensor, mesh: Mesh, *, axis: str = "model",
                           bias=None, gather_output: bool = True):
    """x replicated, weight N-sharded; per-device Pallas kernel; optional
    all-gather of the N-sharded output."""
    shards = mesh.shape[axis]
    local_meta = _local_meta(qt.meta, shards, "column")

    def per_device(x_loc, data, scale, zp, b):
        qt_loc = QTensor(data, scale, zp, local_meta,
                         qt.input_scale, qt.input_zero_point,
                         qt.output_scale, qt.output_zero_point)
        return _call_local(x_loc, qt_loc, b)

    scale_spec = P() if qt.scale.ndim == 0 else (
        P(axis) if qt.scale.ndim == 1 else P(None, axis)
    )
    if bias is None:
        bias = jnp.zeros((qt.meta.shape[1],), jnp.float32)
    out = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(None, axis), scale_spec, scale_spec, P(axis)),
        out_specs=P(None, axis),
        check_vma=False,
    )(x, qt.data, qt.scale, qt.zero_point, bias)
    return out


def row_parallel_matmul(x, qt: QTensor, mesh: Mesh, *, axis: str = "model",
                        bias=None):
    """x feature-sharded, weight K-sharded; per-device kernel then psum."""
    shards = mesh.shape[axis]
    local_meta = _local_meta(qt.meta, shards, "row")

    def per_device(x_loc, data, scale, zp):
        qt_loc = QTensor(data, scale, zp, local_meta,
                         qt.input_scale, qt.input_zero_point,
                         qt.output_scale, qt.output_zero_point)
        y = _call_local(x_loc, qt_loc, None)
        return jax.lax.psum(y, axis)

    scale_spec = P() if qt.scale.ndim <= 1 else P(axis, None)
    out = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(None, axis), P(axis, None), scale_spec, scale_spec),
        out_specs=P(),
        check_vma=False,
    )(x, qt.data, qt.scale, qt.zero_point)
    if bias is not None:
        out = out + bias
    return out


def tp_pair_matmul(x, qt_up: QTensor, qt_down: QTensor, mesh: Mesh,
                   activation=None, *, axis: str = "model"):
    """Fused column→row pair (e.g. up_proj → down_proj) with a single psum.

    The intermediate stays N-sharded on-device — no all-gather between the two
    matmuls, one psum at the end (Megatron MLP schedule).
    """
    shards = mesh.shape[axis]
    up_meta = _local_meta(qt_up.meta, shards, "column")
    down_meta = _local_meta(qt_down.meta, shards, "row")

    def per_device(x_loc, d_up, s_up, z_up, d_dn, s_dn, z_dn):
        up_loc = QTensor(d_up, s_up, z_up, up_meta,
                         qt_up.input_scale, qt_up.input_zero_point,
                         qt_up.output_scale, qt_up.output_zero_point)
        dn_loc = QTensor(d_dn, s_dn, z_dn, down_meta,
                         qt_down.input_scale, qt_down.input_zero_point,
                         qt_down.output_scale, qt_down.output_zero_point)
        h = _call_local(x_loc, up_loc, None)
        if activation is not None:
            h = activation(h)
        y = _call_local(h, dn_loc, None)
        return jax.lax.psum(y, axis)

    def sspec(scale, kind):
        if scale.ndim == 0:
            return P()
        if scale.ndim == 1:
            return P(axis) if kind == "column" else P()
        return P(None, axis) if kind == "column" else P(axis, None)

    return shard_map(
        per_device,
        mesh=mesh,
        in_specs=(
            P(),
            P(None, axis), sspec(qt_up.scale, "column"), sspec(qt_up.zero_point, "column"),
            P(axis, None), sspec(qt_down.scale, "row"), sspec(qt_down.zero_point, "row"),
        ),
        out_specs=P(),
        check_vma=False,
    )(x, qt_up.data, qt_up.scale, qt_up.zero_point,
      qt_down.data, qt_down.scale, qt_down.zero_point)
