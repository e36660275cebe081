"""SmoothQuant: migrate activation-quantization difficulty into the weights.

Parity with ``/root/reference/src/onnx_quantize/pre_passes/smooth_quant.py:19-134``:
per-in-channel smooth scale ``s = act_max^alpha / (w_max + 1e-9)^(1-alpha)``
with the activation scale = per-hidden-dim max |x| clamped to >= 1e-5; ``s`` is
fused into the weight and its reciprocal becomes the site's input ``prescale``
(the reference's inserted Mul node); the captured input activations are updated
in place so later stages see the smoothed activations.
"""

from __future__ import annotations

from typing import Literal

import numpy as np

from onnx_quantize_tpu._logging import get_logger
from onnx_quantize_tpu.core.qconfig import (
    PreProcessingConfig,
    QConfig,
    register_preprocessing_config,
)
from onnx_quantize_tpu.plan import PlanEntry, QuantPlan
from onnx_quantize_tpu.utils import tree_get

logger = get_logger(__name__)

__all__ = ["SmoothQuantConfig", "SmoothQuantPass"]


@register_preprocessing_config
class SmoothQuantConfig(PreProcessingConfig):
    """SmoothQuant parameters (alpha controls the act->weight migration)."""

    preprocessing_type: Literal["smooth_quant"] = "smooth_quant"
    alpha: float = 0.5

    def build_pass(self, qconfig: QConfig) -> "SmoothQuantPass":
        return SmoothQuantPass(alpha=self.alpha, target_op_types=qconfig.target_op_types)


class SmoothQuantPass:
    """In-place param/plan pass applying SmoothQuant per target site."""

    def __init__(self, alpha: float, target_op_types):
        self.alpha = alpha
        self.target_op_types = target_op_types

    def _compute_activation_scale(self, inputs: np.ndarray) -> np.ndarray:
        hidden_dim = inputs.shape[-1]
        tensor = np.abs(inputs.reshape(-1, hidden_dim))
        act_scale = np.max(tensor, axis=0)
        # Clamp to avoid scale=0 (zero-activation channels need no smoothing).
        return np.maximum(act_scale, 1e-5)

    def _smooth_site(self, entry: PlanEntry, params: dict) -> bool:
        if entry.site.op_type not in self.target_op_types:
            return False
        if entry.qconfig_dict is None:
            return False
        qconfig = entry.qconfig()
        if not qconfig.preprocessors:
            return False
        assert entry.captured_input is not None, (
            f"SmoothQuant requires captured inputs for site {entry.name}"
        )

        site_params = tree_get(params, entry.site.param_path)
        weights = np.asarray(site_params["w"], dtype=np.float32)

        act_scale = self._compute_activation_scale(entry.captured_input)
        weights_scale = np.max(np.abs(weights), axis=1)

        scale = np.power(act_scale, self.alpha) / np.power(
            weights_scale + 1e-9, 1 - self.alpha
        )

        # Fuse s into the weight, and 1/s into the input path (the Mul node).
        site_params["w"] = scale.reshape(-1, 1) * weights
        prev = site_params.get("prescale")
        prescale = (1.0 / scale).astype(np.float32)
        site_params["prescale"] = prescale if prev is None else np.asarray(prev) * prescale

        # Update captured inputs in place so later stages see smoothed acts.
        entry.captured_input = entry.captured_input / scale.reshape((1, -1))
        return True

    def __call__(self, model, params: dict, plan: QuantPlan, qconfig: QConfig) -> bool:
        modified = False
        for entry in plan:
            modified |= self._smooth_site(entry, params)
        if modified:
            logger.info("SmoothQuant pass modified the model")
        return modified
