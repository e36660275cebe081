"""Whole-model tensor parallelism: spec trees + meta localization.

The engine's multi-chip path (SURVEY.md §2B, parallelism row) runs the FULL
forward under one ``shard_map`` region over a ``(data, model)`` mesh. Each
device executes the production Pallas kernels on its local weight shard; the
collectives are explicit and minimal — the Megatron schedule:

  * column-parallel (q/k/v, gate/up, lm_head): weight N-sharded, input
    replicated (within the data shard), output stays sharded and feeds the
    paired row-parallel matmul directly — no all-gather,
  * row-parallel (o_proj, down_proj): weight K-sharded, input feature-local,
    one ``psum`` after the local matmul (``nn.Linear.tp_reduce``),
  * embedding: vocab-row-sharded masked lookup + psum,
  * lm_head: vocab-sharded logits, one tiled all-gather at the very end.

That is exactly one psum per column->row pair and no gathers in the body —
the schedule ``tp_ops.tp_pair_matmul`` implements per-pair, generalized to the
whole model so XLA sees a single program and can overlap the collectives.

This module holds the model-agnostic machinery:

  * :func:`localize_params` — rewrite QTensor *metas* to per-shard shapes (the
    arrays are sharded by ``shard_map`` itself; only the static shapes must
    agree with what each device sees),
  * :func:`build_param_specs` — a ``PartitionSpec`` pytree mirroring the
    params tree, used both as ``shard_map`` in_specs and for ``device_put``.

Models opt in by implementing ``tp_localize(tp, axis)`` returning a local
model instance (per-shard head counts, psum/gather hooks set) plus the
site-name -> kind rules; see ``models/gemma3.py``.
"""

from __future__ import annotations

import dataclasses
import re

import numpy as np
from jax.sharding import PartitionSpec as P

from onnx_quantize_tpu._logging import get_logger
from onnx_quantize_tpu.nn.qtensor import QBias, QTensor, QTensorMeta

logger = get_logger(__name__)

__all__ = [
    "site_kind",
    "localize_meta",
    "localize_params",
    "build_param_specs",
]


def site_kind(name: str, rules):
    """First matching rule wins; unmatched sites replicate.

    A kind is a string ("column" / "row" / "replicate" / "vocab") or, for
    horizontally fused sites, ``("fused_column", ((size, subkind), ...))``
    where each segment is "column" (shard over tp) or "replicate"."""
    for pattern, kind in rules:
        if re.search(pattern, name):
            return kind
    return "replicate"


def _fused_column_perm(tp: int, segments) -> tuple[np.ndarray, int]:
    """Column permutation turning a fused [seg0|seg1|...] weight into
    per-device contiguous chunks [seg0_i|seg1_i|...].

    ``device_put``/``shard_map`` shard the N axis into ``tp`` contiguous
    chunks, so the global array must be re-laid-out (replicated segments are
    duplicated into every chunk — e.g. full K/V next to each query shard
    under GQA replicate-slice). Returns (global column index, local width)."""
    offsets = np.cumsum([0] + [int(s) for s, _ in segments])
    cols = []
    for i in range(tp):
        for (size, sub), off in zip(segments, offsets):
            if sub == "column":
                if size % tp != 0:
                    raise ValueError(
                        f"fused segment width {size} not divisible by tp={tp}"
                    )
                w = size // tp
                cols.append(np.arange(off + i * w, off + (i + 1) * w))
            elif sub == "replicate":
                cols.append(np.arange(off, off + size))
            else:
                raise ValueError(f"fused segment kind {sub!r} not supported")
    perm = np.concatenate(cols)
    return perm, perm.size // tp


def _localize_fused_qtensor(qt: QTensor, tp: int, segments) -> QTensor:
    """Re-lay-out a fused column-parallel QTensor's columns (see above).

    Unlike the plain kinds this rewrites the ARRAYS, not just the meta: the
    packed data (K-packed, so columns move freely), grouped scales (G, N),
    and per-channel scales (N,) all follow the same column permutation."""
    perm, n_local = _fused_column_perm(tp, segments)

    def take(x):
        if x is None:
            return None
        arr = np.asarray(x)
        if arr.ndim == 0:
            return arr
        return np.take(arr, perm, axis=arr.ndim - 1)

    meta = dataclasses.replace(qt.meta, shape=(qt.meta.shape[0], n_local))
    return QTensor(
        data=np.take(np.asarray(qt.data), perm, axis=1),
        scale=take(qt.scale), zero_point=take(qt.zero_point), meta=meta,
        input_scale=qt.input_scale, input_zero_point=qt.input_zero_point,
        output_scale=qt.output_scale, output_zero_point=qt.output_zero_point,
    )


def localize_meta(meta: QTensorMeta, tp: int, kind: str) -> QTensorMeta:
    """Per-shard QTensorMeta for a column/row sharded quantized weight."""
    K, N = meta.shape
    if kind == "column":
        if N % tp != 0:
            raise ValueError(f"column-parallel N={N} not divisible by tp={tp}")
        return dataclasses.replace(meta, shape=(K, N // tp))
    if kind == "row":
        if K % tp != 0:
            raise ValueError(f"row-parallel K={K} not divisible by tp={tp}")
        K_local = K // tp
        if meta.packed:
            # Group-pair nibble packing: a K-shard must hold whole groups and
            # an even number of them, and non-GROUP packing interleaves the two
            # K-halves into one virtual pair — unshardable along K.
            gs = meta.pack_group
            if meta.strat.value != "group":
                raise ValueError(
                    "row-parallel 4-bit weight requires GROUP strategy "
                    f"(got {meta.strategy}: packing spans the K halves)"
                )
            if K_local % gs != 0 or (K_local // gs) % 2 != 0:
                raise ValueError(
                    f"row-parallel shard K/tp={K_local} must be an even "
                    f"multiple of group_size={gs}"
                )
        return dataclasses.replace(meta, shape=(K_local, N))
    return meta


def _qtensor_spec(qt: QTensor, kind: str, axis: str) -> QTensor:
    """A QTensor whose children are PartitionSpecs (shard_map in_specs node)."""
    if kind == "expert":
        # Stacked MoE expert weights: EVERY array child carries a leading
        # local-expert axis (data, scale, zp, and any stacked act qparams) —
        # shard them all over the model axis; per-expert slices stay whole.
        spec = P(axis)

        def ch(x):
            return None if x is None else spec

        return QTensor(
            data=spec, scale=ch(qt.scale), zero_point=ch(qt.zero_point),
            meta=qt.meta,
            input_scale=ch(qt.input_scale),
            input_zero_point=ch(qt.input_zero_point),
            output_scale=ch(qt.output_scale),
            output_zero_point=ch(qt.output_zero_point),
        )
    nd = getattr(qt.scale, "ndim", 0)
    if kind == "column":
        wspec = P(None, axis)
        # N is always the LAST scale axis — logical (N,)/(G, N) and the baked
        # kernel layout (G_pad/2, 2, N) alike.
        sspec = P() if nd == 0 else P(*([None] * (nd - 1)), axis)
    elif kind == "row":
        wspec = P(axis, None)
        # grouped scales follow their K-groups (leading axis in both the
        # logical and baked layouts); channel (N,) / tensor replicate.
        sspec = P(axis, *([None] * (nd - 1))) if nd >= 2 else P()
    else:
        wspec = P()
        sspec = P()

    def act(x):
        return None if x is None else P()

    return QTensor(
        data=wspec, scale=sspec, zero_point=sspec, meta=qt.meta,
        input_scale=act(qt.input_scale),
        input_zero_point=act(qt.input_zero_point),
        output_scale=act(qt.output_scale),
        output_zero_point=act(qt.output_zero_point),
    )


def localize_params(params: dict, rules, tp: int) -> dict:
    """Rewrite QTensor metas to per-shard shapes per the TP rules.

    Array leaves are returned as-is (sharding happens at the shard_map
    boundary); only static metadata changes — EXCEPT fused horizontal sites
    (``_fused_qkv`` / ``_fused_gate_up``), whose columns are host-side
    re-laid-out into per-device [q_i|k_i|v_i] chunks so the contiguous N
    sharding lands each device's fused segments together (replicated KV
    segments are duplicated into every chunk).
    """

    def visit(tree, path):
        if isinstance(tree, dict):
            return {k: visit(v, path + (k,)) for k, v in tree.items()}
        name = ".".join(path[:-1])
        kind = site_kind(name, rules)
        if isinstance(kind, tuple) and kind[0] == "fused_column":
            segments = kind[1]
            if isinstance(tree, QTensor):
                return _localize_fused_qtensor(tree, tp, segments)
            if getattr(tree, "ndim", 0) == 2 and path[-1] == "w":
                perm, _ = _fused_column_perm(tp, segments)
                return np.take(np.asarray(tree), perm, axis=1)
            return tree
        if isinstance(tree, QTensor):
            meta = localize_meta(tree.meta, tp, kind)
            if kind == "row" and tree.meta.output_quant.mode == "static":
                raise ValueError(
                    f"row-parallel site {name} cannot requantize its output "
                    "statically before the psum"
                )
            return QTensor(
                tree.data, tree.scale, tree.zero_point, meta,
                tree.input_scale, tree.input_zero_point,
                tree.output_scale, tree.output_zero_point,
            )
        return tree

    return visit(params, ())


def build_param_specs(params: dict, rules, axis: str = "model"):
    """PartitionSpec pytree mirroring ``params`` (QTensor nodes included).

    Usable directly as shard_map ``in_specs`` and (wrapped in NamedSharding)
    for ``device_put``. Kinds: column / row / replicate / vocab (embedding
    rows over ``axis``).
    """

    def visit(tree, path):
        if isinstance(tree, dict):
            return {k: visit(v, path + (k,)) for k, v in tree.items()}
        if tree is None:
            return None
        name = ".".join(path[:-1])
        leaf_key = path[-1]
        kind = site_kind(name, rules)
        if isinstance(kind, tuple) and kind[0] == "fused_column":
            # Fused columns were permuted into contiguous per-device chunks
            # by localize_params — spec-wise they are plain column-parallel.
            kind = "column"
        if isinstance(tree, QTensor):
            return _qtensor_spec(tree, kind, axis)
        if isinstance(tree, QBias):
            spec = P(axis) if kind == "column" else P()
            return QBias(data=spec, scale=P(), zero_point=P(), quant_type=tree.quant_type)
        if kind == "expert":
            # Stacked expert site leaves ("w"/"prescale" with a leading local-
            # expert axis) shard that axis.
            return P(axis)
        if leaf_key == "w" and getattr(tree, "ndim", 0) == 2:
            if kind == "column":
                return P(None, axis)
            if kind == "row":
                return P(axis, None)
            if kind == "vocab":
                return P(axis, None)
            return P()
        if leaf_key == "b":
            # Row-parallel biases are added *after* the psum (Linear.tp_reduce),
            # so they replicate; column-parallel biases shard with N.
            return P(axis) if kind == "column" else P()
        if leaf_key == "prescale":
            # Prescale multiplies x's features: row-parallel x is feature-local.
            return P(axis) if kind == "row" else P()
        return P()

    return visit(params, ())
