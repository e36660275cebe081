"""HQQ: half-quadratic zero-point optimization (weights-only uint4 group quant).

Parity target: ``/root/reference/src/onnx_quantize/core/_algorithms/hqq.py:26-213``.
Same alternating proximal updates: shrink operator
``sign(x)·relu(|x| − β⁻¹·(|x|+1e-8)^(p−1))``, zero-point update
``mean(Wq − (W−We)·s⁻¹)``, ``β ← β·κ`` per iteration, early stop when the error
stops improving. HQQ's constraints (uint4, asymmetric, group, group_size ≥ 16
power of two) are enforced through ``validate_weight_args``, and the zero point
stays in float (zp_dtype forced to scale_dtype).

The optimization loop is a single jitted ``lax.fori_loop`` with carried
(zp, best_error, best_zp, stopped): a fixed trip count with a "stopped" latch
reproduces the reference's early-stop break exactly (once the error stops
improving, the carry freezes, so later iterations are no-ops), while the whole
loop stays device-resident with zero per-iteration host syncs. The beta
schedule (β·κ^i) is precomputed on the host in float64 to match the reference's
Python-float accumulation.
"""

from __future__ import annotations

from functools import partial
from typing import TYPE_CHECKING, Literal

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

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


def _shrink_op(x, inv_beta, lp_norm: float):
    """``sign(x)·relu(|x| − β⁻¹·(|x|+1e-8)^(p−1))`` (HQQ paper eq. 5)."""
    return jnp.sign(x) * jnp.maximum(
        0.0, jnp.abs(x) - inv_beta * jnp.power(jnp.abs(x) + 1e-8, lp_norm - 1)
    )


@partial(jax.jit, static_argnames=("lp_norm", "qmin", "qmax", "iters", "early_stop"))
def _hqq_zp_loop(w_f, inv_scale, zp0, inv_betas, *, lp_norm: float,
                 qmin: float, qmax: float, iters: int, early_stop: bool):
    """Device-resident alternating-prox loop; returns the best zero point.

    Semantics match the reference loop (``hqq.py:106-144``) exactly: the error
    of the *current* zp is evaluated before the zp update; on improvement the
    current zp becomes the best; on the first non-improvement with early_stop
    the carry latches (``stopped``) and every later iteration recomputes the
    identical frozen state, so the result equals a Python-level ``break``.
    """

    def body(i, carry):
        zp, best_err, best_zp, stopped = carry
        w_q = jnp.clip(jnp.round(w_f * inv_scale + zp), qmin, qmax)
        w_r = (w_q - zp) / inv_scale
        w_e = _shrink_op(w_f - w_r, inv_betas[i], lp_norm)

        err = jnp.mean(jnp.abs(w_f - w_r))
        improved = err < best_err
        take = improved & ~stopped
        best_err = jnp.where(take, err, best_err)
        best_zp = jnp.where(take, zp, best_zp)
        if early_stop:
            stopped = stopped | ~improved

        zp_next = jnp.mean(w_q - (w_f - w_e) * inv_scale, axis=1, keepdims=True)
        zp = jnp.where(stopped, zp, zp_next)
        return zp, best_err, best_zp, stopped

    init = (zp0, jnp.asarray(jnp.inf, w_f.dtype), zp0, jnp.asarray(False))
    _, _, best_zp, _ = lax.fori_loop(0, iters, body, init)
    return best_zp


def _optimize_zero_point(w_f, scale, zero_point, quant_type: QuantType,
                         reduce_range: bool, lp_norm: float, beta: float,
                         kappa: float, iters: int, early_stop: bool):
    """Alternating prox updates on the zero point (ref ``hqq.py:106-144``)."""
    qmin, qmax = quant_type.qrange(is_symmetric=False, reduce_range=reduce_range)
    # β·κ^i accumulated in host float64 (matches the reference's Python floats),
    # inverted there, then shipped once as an f32 vector.
    inv_betas = np.asarray(
        [1.0 / (beta * kappa**i) for i in range(max(iters, 1))], np.float32
    )
    best_zp = _hqq_zp_loop(
        jnp.asarray(w_f),
        1.0 / jnp.asarray(scale),  # HQQ works with the inverted scale
        jnp.asarray(zero_point),
        jnp.asarray(inv_betas),
        lp_norm=float(lp_norm),
        qmin=float(qmin),
        qmax=float(qmax),
        iters=int(iters),
        early_stop=bool(early_stop),
    )
    return np.asarray(best_zp)


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
