"""Tensor-parallel sharding plans for quantized models.

The sharding plan is the distributed component the reference never had
(SURVEY.md §2B, parallelism row): per-site Megatron-style layouts —

  * column-parallel (q/k/v, gate/up, lm_head): out-features sharded over
    ``model``; packed 4-bit data ``(K/2, N)`` and scale rows ``(G, N)`` shard
    their N axis *with* the weight so every shard dequantizes locally,
  * row-parallel (o_proj, down_proj): in-features sharded; XLA inserts the
    psum over ``model`` after the local matmul,
  * embeddings shard the vocab axis; norms replicate; the KV cache shards
    batch over ``data`` (Gemma-3-270M has a single KV head, so heads stay
    unsharded).

Group-quant scales stay aligned with their weight groups because grouping runs
along K while column-parallel shards N (and row-parallel shards whole K-groups
when ``gs | K/shards`` — enforced here).
"""

from __future__ import annotations

import re

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from onnx_quantize_tpu._logging import get_logger
from onnx_quantize_tpu.nn.qtensor import QBias, QTensor

logger = get_logger(__name__)

__all__ = ["GEMMA3_TP_RULES", "shard_params", "qtensor_shardings"]

# site-name regex -> "column" | "row" | "replicate"
GEMMA3_TP_RULES: list[tuple[str, str]] = [
    (r"\.attn\.(q_proj|k_proj|v_proj)$", "column"),
    (r"\.attn\.o_proj$", "row"),
    (r"\.mlp\.(gate_proj|up_proj)$", "column"),
    (r"\.mlp\.down_proj$", "row"),
    (r"^lm_head$", "column"),
]


def _weight_spec(kind: str) -> P:
    if kind == "column":
        return P(None, "model")
    if kind == "row":
        return P("model", None)
    return P()


def qtensor_shardings(qt: QTensor, kind: str, mesh: Mesh) -> QTensor:
    """Apply the TP layout to a QTensor's children (data + scales together)."""
    wspec = _weight_spec(kind)
    if kind == "row" and qt.meta.strategy == "group":
        shards = mesh.shape["model"]
        K = qt.meta.shape[0]
        gs = qt.meta.group_size
        if (K // shards) % gs != 0:
            logger.warning(
                "Row-parallel sharding of %s-grouped weight with gs=%d does not "
                "align with %d shards; replicating.", qt.meta.strategy, gs, shards,
            )
            wspec = P()
            kind = "replicate"

    scale = qt.scale
    if kind == "column":
        # scale: scalar | (N,) | (G, N) — shard the N axis when present.
        sspec = P() if scale.ndim == 0 else (
            P("model") if scale.ndim == 1 else P(None, "model")
        )
    elif kind == "row":
        # grouped scales follow their K-groups; channel/tensor replicate.
        sspec = P("model", None) if scale.ndim == 2 else P()
    else:
        sspec = P() if scale.ndim == 0 else P(*([None] * scale.ndim))

    def put(x, spec):
        if x is None:
            return None
        return jax.device_put(x, NamedSharding(mesh, spec))

    return QTensor(
        data=put(qt.data, wspec),
        scale=put(scale, sspec),
        zero_point=put(qt.zero_point, sspec),
        meta=qt.meta,
        input_scale=put(qt.input_scale, P()),
        input_zero_point=put(qt.input_zero_point, P()),
        output_scale=put(qt.output_scale, P()),
        output_zero_point=put(qt.output_zero_point, P()),
    )


def _site_kind(name: str, rules) -> str:
    for pattern, kind in rules:
        if re.search(pattern, name):
            return kind
    return "replicate"


def shard_params(model, params, mesh: Mesh, rules=None):
    """Place a (possibly quantized) param tree onto the mesh per the TP plan."""
    if rules is None:
        rules = GEMMA3_TP_RULES
    sites = {s.name: s for s in model.linear_sites()}

    def visit(tree, path):
        if isinstance(tree, dict):
            return {k: visit(v, path + (k,)) for k, v in tree.items()}
        name = ".".join(path[:-1])  # drop the leaf key ("w"/"b"/"prescale")
        leaf_key = path[-1]
        if isinstance(tree, QTensor):
            return qtensor_shardings(tree, _site_kind(name, rules), mesh)
        if isinstance(tree, QBias):
            kind = _site_kind(name, rules)
            spec = P("model") if kind == "column" else P()
            return QBias(
                data=jax.device_put(tree.data, NamedSharding(mesh, spec)),
                scale=jax.device_put(tree.scale, NamedSharding(mesh, P())),
                zero_point=tree.zero_point,
                quant_type=tree.quant_type,
            )
        # Raw arrays: fp weights at linear sites follow the same TP layout;
        # embedding shards its vocab axis; everything else replicates.
        if leaf_key == "w" and name in sites:
            kind = _site_kind(name, rules)
            if tree.ndim == 2:
                return jax.device_put(tree, NamedSharding(mesh, _weight_spec(kind)))
        if leaf_key == "w" and name == "embed" and tree.ndim == 2:
            return jax.device_put(tree, NamedSharding(mesh, P("model", None)))
        if leaf_key == "b" and name in sites:
            kind = _site_kind(name, rules)
            spec = P("model") if kind == "column" else P()
            return jax.device_put(tree, NamedSharding(mesh, spec))
        if leaf_key == "prescale":
            kind = _site_kind(name, rules)
            spec = P("model") if kind == "row" else P()
            return jax.device_put(tree, NamedSharding(mesh, spec))
        return jax.device_put(tree, NamedSharding(mesh, P()))

    return visit(params, ())
