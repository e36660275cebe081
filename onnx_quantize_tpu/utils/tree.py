"""Param-tree helpers (nested-dict pytrees)."""

from __future__ import annotations

import numpy as np

from onnx_quantize_tpu._logging import get_logger

logger = get_logger(__name__)

__all__ = ["tree_get", "copy_tree", "untie_params"]


def tree_get(params: dict, path: tuple[str, ...]) -> dict:
    """Return the nested sub-dict at ``path``."""
    node = params
    for key in path:
        node = node[key]
    return node


def copy_tree(params):
    """Copy the dict structure (leaves shared) so callers can mutate safely."""
    if isinstance(params, dict):
        return {k: copy_tree(v) for k, v in params.items()}
    return params


def untie_params(params: dict, site_paths: list[tuple[str, ...]]) -> dict:
    """Give each quantizable site its own weight copy when leaves are shared.

    The analogue of the reference's DuplicateInitializersPass
    (``pre_passes/duplicate_initializer.py:9-67``), which un-ties shared
    weights (e.g. embedding / lm_head weight tying) so each consumer is
    quantized independently. Here sharing means two param paths referencing
    the same array object.
    """
    from onnx_quantize_tpu.nn.qtensor import QTensor

    params = copy_tree(params)
    seen: dict[int, tuple[str, ...]] = {}
    for path in site_paths:
        site = tree_get(params, path)
        w = site.get("w")
        if w is None or isinstance(w, QTensor):
            # Already-quantized leaves are skipped by the transform, so
            # sharing between them is harmless.
            continue
        key = id(w)
        if key in seen:
            logger.debug(
                "Untying weight shared between %s and %s", seen[key], path
            )
            site["w"] = np.array(np.asarray(w), copy=True)
        else:
            seen[key] = path
    return params
