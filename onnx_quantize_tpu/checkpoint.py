"""Quantized checkpoint save/load.

The persistence analogue of the reference's quantized ONNX artifact
(``ir.save(..., external_data=...)`` at ``calibrate.py:222``, SURVEY.md §5):
a directory with

  * ``params.npz`` — every array leaf (packed int4 nibbles, int8 data, scales,
    zero points, fp params) under its flattened tree key,
  * ``meta.json`` — per-leaf structural metadata (QTensor/QBias specs, the
    model identity, and the serialized quantization plan),

so the engine can reload and shard the quantized model without re-running the
quantizer. numpy's npz keeps this dependency-free; Orbax can layer on top for
multi-host sharded checkpoints.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any

import jax.numpy as jnp
import numpy as np

from onnx_quantize_tpu._logging import get_logger
from onnx_quantize_tpu.nn.qtensor import ActQuantSpec, QBias, QTensor, QTensorMeta

logger = get_logger(__name__)

__all__ = ["save_checkpoint", "load_checkpoint", "save_params", "load_params"]

_SEP = "::"


def _flatten(tree: Any, prefix: str, arrays: dict, meta: dict) -> None:
    if isinstance(tree, dict):
        for key, value in tree.items():
            _flatten(value, f"{prefix}{key}{_SEP}" if prefix else f"{key}{_SEP}", arrays, meta)
        return

    name = prefix.rstrip(_SEP)
    if isinstance(tree, QTensor):
        meta[name] = {
            "kind": "qtensor",
            "meta": {
                **dataclasses.asdict(tree.meta),
                "input_quant": dataclasses.asdict(tree.meta.input_quant),
                "output_quant": dataclasses.asdict(tree.meta.output_quant),
            },
            "has": {
                field: getattr(tree, field) is not None
                for field in (
                    "input_scale", "input_zero_point", "output_scale", "output_zero_point"
                )
            },
        }
        arrays[f"{name}{_SEP}data"] = np.asarray(tree.data)
        arrays[f"{name}{_SEP}scale"] = np.asarray(tree.scale)
        arrays[f"{name}{_SEP}zero_point"] = np.asarray(tree.zero_point)
        for field in ("input_scale", "input_zero_point", "output_scale", "output_zero_point"):
            value = getattr(tree, field)
            if value is not None:
                arrays[f"{name}{_SEP}{field}"] = np.asarray(value)
        return
    if isinstance(tree, QBias):
        meta[name] = {"kind": "qbias", "quant_type": tree.quant_type}
        arrays[f"{name}{_SEP}data"] = np.asarray(tree.data)
        arrays[f"{name}{_SEP}scale"] = np.asarray(tree.scale)
        arrays[f"{name}{_SEP}zero_point"] = np.asarray(tree.zero_point)
        return

    meta[name] = {"kind": "array"}
    arrays[name] = np.asarray(tree)


def _set_path(tree: dict, path: list[str], value) -> None:
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


def save_params(path: str, params: dict, extra_meta: dict | None = None) -> None:
    os.makedirs(path, exist_ok=True)
    arrays: dict[str, np.ndarray] = {}
    meta: dict[str, Any] = {}
    _flatten(params, "", arrays, meta)
    np.savez(os.path.join(path, "params.npz"), **arrays)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump({"leaves": meta, "extra": extra_meta or {}}, f)
    logger.info("Saved checkpoint with %d arrays to %s", len(arrays), path)


def load_params(path: str) -> tuple[dict, dict]:
    """Returns (params, extra_meta)."""
    with open(os.path.join(path, "meta.json")) as f:
        payload = json.load(f)
    leaves = payload["leaves"]
    npz = np.load(os.path.join(path, "params.npz"))

    params: dict = {}
    for name, info in leaves.items():
        path_keys = name.split(_SEP)
        if info["kind"] == "array":
            _set_path(params, path_keys, jnp.asarray(npz[name]))
            continue
        if info["kind"] == "qbias":
            qb = QBias(
                data=jnp.asarray(npz[f"{name}{_SEP}data"]),
                scale=jnp.asarray(npz[f"{name}{_SEP}scale"]),
                zero_point=jnp.asarray(npz[f"{name}{_SEP}zero_point"]),
                quant_type=info["quant_type"],
            )
            _set_path(params, path_keys, qb)
            continue
        meta_dict = dict(info["meta"])
        meta_dict["input_quant"] = ActQuantSpec(**meta_dict["input_quant"])
        meta_dict["output_quant"] = ActQuantSpec(**meta_dict["output_quant"])
        meta_dict["shape"] = tuple(meta_dict["shape"])
        qt = QTensor(
            data=jnp.asarray(npz[f"{name}{_SEP}data"]),
            scale=jnp.asarray(npz[f"{name}{_SEP}scale"]),
            zero_point=jnp.asarray(npz[f"{name}{_SEP}zero_point"]),
            meta=QTensorMeta(**meta_dict),
            **{
                field: (
                    jnp.asarray(npz[f"{name}{_SEP}{field}"])
                    if info["has"][field]
                    else None
                )
                for field in (
                    "input_scale", "input_zero_point", "output_scale", "output_zero_point"
                )
            },
        )
        _set_path(params, path_keys, qt)
    return params, payload.get("extra", {})


def save_checkpoint(path: str, model, params: dict, plan=None) -> None:
    """Save params + model identity (+ optional plan summary) for reload."""
    extra: dict[str, Any] = {"model": type(model).__name__}
    cfg = getattr(model, "cfg", None)
    if cfg is not None and dataclasses.is_dataclass(cfg):
        extra["config"] = dataclasses.asdict(cfg)
    if plan is not None:
        extra["plan"] = {
            entry.name: {
                "op_type": entry.site.op_type,
                "group_size": entry.group_size,
                "qconfig": _jsonable(entry.qconfig_dict),
            }
            for entry in plan
        }
    save_params(path, params, extra)


def _jsonable(obj):
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, np.dtype):
        return str(obj)
    if isinstance(obj, (np.generic,)):
        return obj.item()
    if hasattr(obj, "value") and not isinstance(obj, (int, float, str, bool)):
        return obj.value  # enums
    return obj


def load_checkpoint(path: str):
    """Reload (model, params). Model is reconstructed from the saved config."""
    params, extra = load_params(path)
    model_name = extra.get("model")
    if model_name == "Gemma3":
        from onnx_quantize_tpu.models.gemma3 import Gemma3, Gemma3Config

        model = Gemma3(Gemma3Config(**extra["config"]))
    else:
        raise ValueError(
            f"Cannot reconstruct model {model_name!r}; load params via load_params() "
            "and build the model yourself."
        )
    return model, params
