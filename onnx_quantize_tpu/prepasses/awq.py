"""AWQ: activation-aware weight scale search (+ optional clip search).

Parity with ``/root/reference/src/onnx_quantize/pre_passes/awq.py:25-259``:
per-channel act scale = mean |x|; weight scale = per-in-channel mean of
row-normalized |W|; 20-point grid over the migration ratio with candidate
``s = clip(act^r / w^(1-r), 1e-4)`` normalized by ``sqrt(max(s)·min(s))``;
each candidate evaluated by the true MSE of ``X @ (dequant(rtn(W·s)) / s)``
against ``X @ W``. The winning scale is fused into the weight with its
reciprocal as the input prescale, and the captured inputs are rescaled in
place. Clip search sweeps clip_ratio over {1 - i/100, i < 10} and writes the
winner back into the site's stamped qconfig.

The candidate evaluations are jnp matmuls, so the grid search runs on the
accelerator for large sites.
"""

from __future__ import annotations

from typing import Literal

import jax.numpy as jnp
import numpy as np

from onnx_quantize_tpu._logging import get_logger
from onnx_quantize_tpu.algorithms.rtn import rtn_quantize
from onnx_quantize_tpu.core.enums import QuantizationStrategy
from onnx_quantize_tpu.core.numerics import dequantize
from onnx_quantize_tpu.core.qconfig import (
    PreProcessingConfig,
    QConfig,
    register_preprocessing_config,
)
from onnx_quantize_tpu.plan import PlanEntry, QuantPlan
from onnx_quantize_tpu.utils import tree_get

logger = get_logger(__name__)

__all__ = ["AwqConfig", "AwqPass"]

_SUPPORTED_OPS = {"MatMul", "Gemm"}


@register_preprocessing_config
class AwqConfig(PreProcessingConfig):
    """AWQ parameters (``clip_search`` enables the clip-ratio sweep)."""

    preprocessing_type: Literal["awq"] = "awq"
    clip_search: bool = False

    def build_pass(self, qconfig: QConfig) -> "AwqPass":
        return AwqPass(clip_search=self.clip_search, target_op_types=qconfig.target_op_types)


def _fake_quant_weight(weights: np.ndarray, qweight_args, clip_ratio: float):
    """RTN fake-quant round trip in the site's weight config."""
    q, s, zp = rtn_quantize(
        weights,
        quant_type=qweight_args.dtype,
        strategy=qweight_args.strategy,
        group_size=qweight_args.group_size if qweight_args.group_size else -1,
        is_symmetric=qweight_args.symmetric,
        reduce_range=qweight_args.reduce_range,
        clip_ratio=clip_ratio,
        mse=False,
        scale_dtype=qweight_args.scale_dtype,
        zp_dtype=qweight_args.zp_dtype,
    )
    return np.asarray(
        dequantize(
            q, s, zp,
            preprocess=True,
            strategy=qweight_args.strategy,
            group_size=qweight_args.group_size if qweight_args.group_size else -1,
        )
    )


class AwqPass:
    def __init__(self, clip_search: bool, target_op_types):
        self.clip_search = clip_search
        self.target_op_types = target_op_types

    def is_valid_entry(self, entry: PlanEntry) -> bool:
        return (
            entry.site.op_type in self.target_op_types
            and entry.site.op_type in _SUPPORTED_OPS
            and entry.qconfig_dict is not None
        )

    def _compute_activation_scale(self, inputs: np.ndarray) -> np.ndarray:
        hidden_dim = inputs.shape[-1]
        return np.mean(np.reshape(np.abs(inputs), (-1, hidden_dim)), axis=0)

    def _compute_weight_scale(self, weights_t: np.ndarray,
                              strategy: QuantizationStrategy, group_size) -> np.ndarray:
        """Per-in-channel weight salience from the (N, K) transposed weight."""
        org_shape = weights_t.shape
        keep_dims, axis = True, 1
        if strategy == QuantizationStrategy.TENSOR:
            axis, keep_dims = None, False
        w = weights_t
        if strategy == QuantizationStrategy.GROUP:
            w = np.reshape(w, (-1, group_size))
        scale = np.abs(w) / np.max(np.abs(w), axis=axis, keepdims=keep_dims)
        scale = np.reshape(scale, org_shape)
        return np.mean(scale, axis=0)

    def _apply_awq(self, entry: PlanEntry, params: dict) -> bool:
        if not self.is_valid_entry(entry):
            return False
        qconfig = entry.qconfig()
        assert entry.captured_input is not None, (
            f"AWQ requires captured inputs for site {entry.name}"
        )

        site_params = tree_get(params, entry.site.param_path)
        original_weights = np.asarray(site_params["w"], dtype=np.float32)
        inputs = jnp.asarray(entry.captured_input)

        act_scale = self._compute_activation_scale(entry.captured_input)
        weights_scale = self._compute_weight_scale(
            original_weights.T, qconfig.weights.strategy, qconfig.weights.group_size
        )

        original_outputs = inputs @ jnp.asarray(original_weights)

        best_error = np.inf
        best_scale = None
        n_grid = 20

        for i in range(n_grid):
            ratio = i / n_grid
            scale = np.clip(
                np.power(act_scale, ratio) / np.power(weights_scale, 1 - ratio),
                1e-4, None,
            )
            scale = scale / np.sqrt(np.max(scale) * np.min(scale))
            scale_col = scale.reshape(-1, 1)

            qweights = _fake_quant_weight(
                original_weights * scale_col, qconfig.weights, clip_ratio=1.0
            )
            qweights = qweights / scale_col
            diff = original_outputs - inputs @ jnp.asarray(qweights)
            loss = float(jnp.mean(diff.ravel() ** 2))

            if loss < best_error:
                best_error = loss
                best_scale = scale

        site_params["w"] = original_weights * best_scale.reshape(-1, 1)
        prev = site_params.get("prescale")
        prescale = (1.0 / best_scale).astype(np.float32)
        site_params["prescale"] = prescale if prev is None else np.asarray(prev) * prescale
        entry.captured_input = entry.captured_input / best_scale.reshape((1, -1))
        return True

    def _apply_awq_clip(self, entry: PlanEntry, params: dict) -> bool:
        if not self.is_valid_entry(entry):
            return False
        qconfig = entry.qconfig()
        assert entry.captured_input is not None

        site_params = tree_get(params, entry.site.param_path)
        weights = np.asarray(site_params["w"], dtype=np.float32)
        inputs = jnp.asarray(entry.captured_input)
        original_outputs = inputs @ jnp.asarray(weights)

        best_error = np.inf
        best_ratio = 1.0

        for i_s in range(10):
            ratio = 1 - i_s / 100
            qweights = _fake_quant_weight(weights, qconfig.weights, clip_ratio=ratio)
            diff = original_outputs - inputs @ jnp.asarray(qweights)
            loss = float(jnp.mean(diff.ravel() ** 2))
            if loss < best_error:
                best_error = loss
                best_ratio = ratio

        # Write the winning clip_ratio back into the stamped qconfig.
        qconfig.weights.clip_ratio = best_ratio
        entry.qconfig_dict = qconfig.model_dump(exclude={"calibration_data"})
        return True

    def __call__(self, model, params: dict, plan: QuantPlan, qconfig: QConfig) -> bool:
        try:
            from tqdm import tqdm
        except ImportError:  # pragma: no cover
            def tqdm(x, **kw):
                return x

        modified = False
        for entry in tqdm(list(plan), desc="AWQ Pass", unit="site"):
            modified |= self._apply_awq(entry, params)
            if self.clip_search:
                modified |= self._apply_awq_clip(entry, params)
        if modified:
            logger.info("AWQ pass modified the model")
        return modified
