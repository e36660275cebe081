"""HQQ: half-quadratic zero-point optimization (weights-only uint4 group quant).

Parity target: ``/root/reference/src/onnx_quantize/core/_algorithms/hqq.py:26-213``.
Same alternating proximal updates: shrink operator
``sign(x)·relu(|x| − β⁻¹·(|x|+1e-8)^(p−1))``, zero-point update
``mean(Wq − (W−We)·s⁻¹)``, ``β ← β·κ`` per iteration, early stop when the error
stops improving. HQQ's constraints (uint4, asymmetric, group, group_size ≥ 16
power of two) are enforced through ``validate_weight_args``, and the zero point
stays in float (zp_dtype forced to scale_dtype).

The iteration is a fixed small count (default 20) over the whole weight at once,
so it runs as vectorized jnp ops (device-resident on TPU); the early-stop
comparison syncs one scalar per iteration.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Literal

import jax.numpy as jnp
import numpy as np

from onnx_quantize_tpu.core.dtypes import QuantType
from onnx_quantize_tpu.core.enums import QuantizationStrategy
from onnx_quantize_tpu.core.numerics import (
    compute_qparams_from_array,
    postprocess_array,
    preprocess_array,
)
from onnx_quantize_tpu.core.qconfig import AlgorithmConfig, register_algorithm_config

if TYPE_CHECKING:
    from onnx_quantize_tpu.core.qconfig import QConfig, QWeightArgs
    from onnx_quantize_tpu.plan import PlanEntry

__all__ = ["HqqConfig", "hqq_quantize"]


@register_algorithm_config
class HqqConfig(AlgorithmConfig):
    """HQQ parameters (ref ``hqq.py:26-44``)."""

    algorithm_type: Literal["hqq"] = "hqq"
    lp_norm: float = 0.7
    beta: float = 1e1
    kappa: float = 1.01
    iters: int = 20
    early_stop: bool = True

    @staticmethod
    def _check_hqq_constraints(dtype, symmetric, strategy, group_size) -> None:
        if dtype != QuantType.QUInt4:
            raise ValueError(f"HQQ only supports uint4 weight type. Found: {dtype}")
        if symmetric:
            raise ValueError("HQQ only supports asymmetric quantization.")
        if strategy != QuantizationStrategy.GROUP:
            raise ValueError(
                f"HQQ only supports 'group' quantization strategy. Found: {strategy}"
            )
        if group_size != -1 and (group_size < 16 or (group_size & (group_size - 1)) != 0):
            raise ValueError(
                f"HQQ requires group_size to be greater than 16 and a power of 2. "
                f"Found: {group_size}"
            )

    def validate_weight_args(self, weight_args: "QWeightArgs") -> None:
        self._check_hqq_constraints(
            weight_args.dtype,
            weight_args.symmetric,
            weight_args.strategy,
            weight_args.group_size,
        )
        # HQQ keeps the zero point in float: same dtype as the scale.
        weight_args.zp_dtype = weight_args.scale_dtype

    def quantize_weights(
        self,
        weight: np.ndarray,
        qconfig: "QConfig",
        entry: "PlanEntry | None" = None,
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        w = qconfig.weights
        group_size = entry.group_size if entry is not None else w.group_size
        return hqq_quantize(
            weight,
            quant_type=w.dtype,
            group_size=group_size if group_size is not None else -1,
            reduce_range=w.reduce_range,
            clip_ratio=w.clip_ratio,
            mse=w.mse,
            scale_dtype=w.scale_dtype,
            zp_dtype=w.zp_dtype,
            lp_norm=self.lp_norm,
            beta=self.beta,
            kappa=self.kappa,
            iters=self.iters,
            early_stop=self.early_stop,
        )


def _shrink_op(x, beta: float, lp_norm: float):
    return jnp.sign(x) * jnp.maximum(
        0.0, jnp.abs(x) - (1.0 / beta) * jnp.power(jnp.abs(x) + 1e-8, lp_norm - 1)
    )


def _optimize_zero_point(w_f, scale, zero_point, quant_type: QuantType,
                         reduce_range: bool, lp_norm: float, beta: float,
                         kappa: float, iters: int, early_stop: bool):
    """Alternating prox updates on the zero point (ref ``hqq.py:106-144``)."""
    best_error = np.inf
    best_zp = np.asarray(zero_point).copy()

    inv_scale = 1.0 / jnp.asarray(scale)  # HQQ works with the inverted scale
    zero_point = jnp.asarray(zero_point)
    w_f = jnp.asarray(w_f)
    qmin, qmax = quant_type.qrange(is_symmetric=False, reduce_range=reduce_range)

    for _ in range(iters):
        w_q = jnp.clip(jnp.round(w_f * inv_scale + zero_point), qmin, qmax)
        w_r = (w_q - zero_point) / inv_scale
        w_e = _shrink_op(w_f - w_r, beta, lp_norm)

        beta *= kappa

        current_error = float(jnp.mean(jnp.abs(w_f - w_r)))
        if current_error < best_error:
            best_error = current_error
            best_zp = np.asarray(zero_point).copy()
        elif early_stop:
            break

        zero_point = jnp.mean(w_q - (w_f - w_e) * inv_scale, axis=1, keepdims=True)

    return best_zp


def hqq_quantize(
    w_f: np.ndarray,
    quant_type: QuantType,
    group_size: int,
    reduce_range: bool = False,
    clip_ratio: float = 1.0,
    mse: bool = False,
    scale_dtype=np.float32,
    zp_dtype=np.float32,
    lp_norm: float = 0.7,
    beta: float = 1e1,
    kappa: float = 1.01,
    iters: int = 20,
    early_stop: bool = True,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """HQQ-quantize a ``(in_features, out_features)`` weight with a float zp."""
    assert np.dtype(zp_dtype) == np.dtype(scale_dtype), (
        "HQQ requires scale and zero point to share a dtype."
    )
    w_f = jnp.asarray(w_f, dtype=jnp.float32)
    pre = preprocess_array(w_f, QuantizationStrategy.GROUP, group_size)
    scale, zero_point = compute_qparams_from_array(
        pre,
        quant_type,
        QuantizationStrategy.GROUP,
        group_size,
        is_symmetric=False,
        reduce_range=reduce_range,
        clip_ratio=clip_ratio,
        mse=mse,
        scale_dtype=scale_dtype,
        zp_dtype=zp_dtype,
    )

    zero_point = _optimize_zero_point(
        pre, scale, zero_point, quant_type, reduce_range,
        lp_norm, beta, kappa, iters, early_stop,
    )

    # HQQ quantize: round(x/s + zp) in float (no int cast before the shift),
    # then clip (ref hqq.py:160-170).
    qmin, qmax = quant_type.qrange(is_symmetric=False, reduce_range=reduce_range)
    w_q = jnp.clip(jnp.round(pre / jnp.asarray(scale) + jnp.asarray(zero_point)), qmin, qmax)
    w_q = w_q.astype(jnp.dtype(quant_type.container_dtype))
    w_q = postprocess_array(w_q, w_f.shape, QuantizationStrategy.GROUP, group_size)

    return np.asarray(w_q), np.asarray(scale), np.asarray(zero_point)
