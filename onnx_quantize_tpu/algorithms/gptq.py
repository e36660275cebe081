"""GPTQ: Hessian-based error-corrected weight quantization.

Parity target: ``/root/reference/src/onnx_quantize/core/_algorithms/gptq.py:33-324``.
Same numerics — Hessian ``H = 2/n · XᵀX`` with running renormalization, dead
channel masking, optional actorder permutation, damped Cholesky inverse
``Hinv = chol((chol(H+λI)⁻¹)ᵀ · chol(H+λI)⁻¹)ᵀ`` with an RTN fallback on
numerical failure, a block sweep (block_size=128) with in-block column loop and
error propagation, per-group scale recompute every ``group_size`` columns, and a
final scale/zp recompute from the quantized result.

TPU-first design: the sequential column loop is expressed as a
``lax.fori_loop`` over masked rank-1 updates inside a single jit (columns padded
to a block multiple with numerically-transparent zero rows), so the whole sweep
compiles to one XLA program per weight shape. A host (numpy) implementation with
identical semantics covers the ragged-group and in-loop-MSE cases and serves as
the test oracle.
"""

from __future__ import annotations

import functools
import math
from typing import TYPE_CHECKING, ClassVar, Literal

import jax
import jax.numpy as jnp
import numpy as np

from onnx_quantize_tpu._logging import get_logger
from onnx_quantize_tpu.core.dtypes import QuantType
from onnx_quantize_tpu.core.enums import QuantizationStrategy
from onnx_quantize_tpu.core.numerics import (
    compute_qparams,
    compute_qparams_from_array,
    preprocess_array,
)
from onnx_quantize_tpu.core.qconfig import AlgorithmConfig, register_algorithm_config

if TYPE_CHECKING:
    from onnx_quantize_tpu.core.qconfig import QConfig
    from onnx_quantize_tpu.plan import PlanEntry

logger = get_logger(__name__)

__all__ = ["GPTQConfig", "gptq_quantize", "accumulate_hessian"]


@register_algorithm_config
class GPTQConfig(AlgorithmConfig):
    """GPTQ parameters (ref ``gptq.py:33-49``).

    Args:
        block_size: lazy-batch block width for the error-corrected sweep.
        percdamp: Hessian dampening as a fraction of mean(diag(H)).
        actorder: quantize columns in decreasing diag(H) order.
    """

    requires_calibration: ClassVar[bool] = True

    algorithm_type: Literal["gptq"] = "gptq"
    block_size: int = 128
    percdamp: float = 0.01
    actorder: bool = False

    def quantize_weights(
        self,
        weight: np.ndarray,
        qconfig: "QConfig",
        entry: "PlanEntry | None" = None,
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        assert entry is not None, "GPTQ requires a plan entry with calibration data."
        assert entry.captured_input is not None, (
            "GPTQ requires calibration inputs on the plan entry."
        )
        w = qconfig.weights
        group_size = entry.group_size if entry.group_size is not None else w.group_size
        return gptq_quantize(
            weight,
            entry.captured_input,
            quant_type=w.dtype,
            strategy=w.strategy,
            is_symmetric=w.symmetric,
            reduce_range=w.reduce_range,
            clip_ratio=w.clip_ratio,
            block_size=self.block_size,
            percdamp=self.percdamp,
            group_size=group_size if group_size is not None else -1,
            actorder=self.actorder,
            mse=w.mse,
            scale_dtype=w.scale_dtype,
            zp_dtype=w.zp_dtype,
        )


def accumulate_hessian(inp: np.ndarray, H: np.ndarray, num_samples: int):
    """Running Hessian accumulation ``H += 2/n · XᵀX`` (ref ``gptq.py:246-260``)."""
    num_added = inp.shape[0]
    inp = np.reshape(inp, (-1, inp.shape[-1]))

    H = H * (num_samples / (num_samples + num_added))
    num_samples += num_added

    inp = math.sqrt(2 / num_samples) * inp.astype(np.float32)
    H = H + inp.T @ inp
    return H, num_samples


def _cholesky_inverse_sweep(H: np.ndarray, percdamp: float):
    """Damped upper-Cholesky of H⁻¹, with identity fallback on failure."""
    K = H.shape[0]
    damp = percdamp * float(np.mean(np.diag(H)))
    H = H + damp * np.eye(K, dtype=H.dtype)
    L = np.asarray(jnp.linalg.cholesky(jnp.asarray(H)))
    if np.isnan(L).any():
        return None
    Li = np.asarray(jnp.linalg.inv(jnp.asarray(L)))
    M = np.asarray(jnp.linalg.cholesky(jnp.asarray(Li.T @ Li)))
    if np.isnan(M).any():
        return None
    return M.T  # upper triangular


def _channelwise_qparams(w_slice_t, quant_type, is_symmetric, reduce_range, clip_ratio,
                         mse, scale_dtype, zp_dtype):
    """Per-out-channel qparams of a ``(N, k)`` row-major slice, squeezed to (N,)."""
    scale, zp = compute_qparams_from_array(
        w_slice_t,
        quant_type=quant_type,
        strategy=QuantizationStrategy.CHANNEL,
        group_size=-1,
        is_symmetric=is_symmetric,
        reduce_range=reduce_range,
        clip_ratio=clip_ratio,
        mse=mse,
        scale_dtype=scale_dtype,
        zp_dtype=np.float32,
    )
    return np.squeeze(np.asarray(scale)), np.squeeze(np.asarray(zp))


@functools.partial(
    jax.jit,
    static_argnames=(
        "qmin", "qmax", "block_size", "group_size", "use_group",
        "sym", "rr", "clip_ratio", "qt_name",
    ),
)
def _gptq_sweep_jit(W, Hinv, scale0, zp0, *, qmin, qmax, block_size, group_size,
                    use_group, sym, rr, clip_ratio, qt_name):
    """One-XLA-program GPTQ block sweep over a zero-padded (K_pad, N) weight."""
    K_pad, N = W.shape
    num_blocks = K_pad // block_size
    quant_type = QuantType(qt_name)

    def recompute_group_qparams(W_full, c):
        # Per-group channelwise qparams from the block-updated full weight,
        # matching the reference's read of W[(c):(c+gs), :] (gptq.py:168-184).
        w_slice = jax.lax.dynamic_slice(W_full, (c, 0), (group_size, N))
        rmin = jnp.min(w_slice, axis=0) * clip_ratio
        rmax = jnp.max(w_slice, axis=0) * clip_ratio
        rmin = jnp.minimum(rmin, 0.0)
        rmax = jnp.maximum(rmax, 0.0)
        scale, zp = compute_qparams(
            rmin, rmax, quant_type, sym, rr, scale_dtype=np.float32, zp_dtype=np.float32
        )
        return scale, zp

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (block_size, 1), 0)
    full_row_ids = jax.lax.broadcasted_iota(jnp.int32, (K_pad, 1), 0)

    def block_step(b, carry):
        W, Q, Qint, scale, zp = carry
        i1 = b * block_size
        W1 = jax.lax.dynamic_slice(W, (i1, 0), (block_size, N))
        Hinv1 = jax.lax.dynamic_slice(Hinv, (i1, i1), (block_size, block_size))

        def col_step(i, inner):
            W1, Q1, Qint1, Err1, scale, zp = inner
            c = i1 + i
            if use_group:
                scale, zp = jax.lax.cond(
                    c % group_size == 0,
                    lambda: recompute_group_qparams(W, c),
                    lambda: (scale, zp),
                )
            w = jax.lax.dynamic_slice(W1, (i, 0), (1, N))[0]
            d = jax.lax.dynamic_slice(Hinv1, (i, i), (1, 1))[0, 0]

            qint = jnp.clip(jnp.round(w / scale).astype(jnp.int32) + zp, qmin, qmax)
            qint = qint.astype(jnp.float32)
            q = (qint - zp) * scale
            err = (w - q) / d

            colH = jax.lax.dynamic_slice(Hinv1, (0, i), (block_size, 1))
            update = jnp.where(row_ids >= i, colH * err[None, :], 0.0)
            W1 = W1 - update
            Q1 = jax.lax.dynamic_update_slice(Q1, q[None, :], (i, 0))
            Qint1 = jax.lax.dynamic_update_slice(Qint1, qint[None, :], (i, 0))
            Err1 = jax.lax.dynamic_update_slice(Err1, err[None, :], (i, 0))
            return (W1, Q1, Qint1, Err1, scale, zp)

        init = (
            W1,
            jnp.zeros_like(W1),
            jnp.zeros_like(W1),
            jnp.zeros_like(W1),
            scale,
            zp,
        )
        W1, Q1, Qint1, Err1, scale, zp = jax.lax.fori_loop(0, block_size, col_step, init)

        Q = jax.lax.dynamic_update_slice(Q, Q1, (i1, 0))
        Qint = jax.lax.dynamic_update_slice(Qint, Qint1, (i1, 0))
        # Propagate block error to all later rows (masked full-matrix update).
        HinvCols = jax.lax.dynamic_slice(Hinv, (0, i1), (K_pad, block_size))
        tail_update = jnp.where(full_row_ids >= i1 + block_size, HinvCols @ Err1, 0.0)
        W = W - tail_update
        return (W, Q, Qint, scale, zp)

    Q = jnp.zeros_like(W)
    Qint = jnp.zeros_like(W)
    W, Q, Qint, scale, zp = jax.lax.fori_loop(
        0, num_blocks, block_step, (W, Q, Qint, scale0, zp0)
    )
    return Q, Qint


def _gptq_sweep_host(W, Hinv, scale, zp, *, qmin, qmax, block_size, group_size,
                     use_group, quant_type, sym, rr, clip_ratio, mse,
                     scale_dtype, zp_dtype):
    """Reference-exact numpy sweep (handles ragged groups and in-loop MSE)."""
    K, N = W.shape
    W = W.copy()
    Q = np.zeros_like(W)
    Qint = np.zeros_like(W)

    for i1 in range(0, K, block_size):
        i2 = min(i1 + block_size, K)
        count = i2 - i1
        W1 = W[i1:i2, :].copy()
        Q1 = np.zeros_like(W1)
        Qint1 = np.zeros_like(W1)
        Err1 = np.zeros_like(W1)
        Hinv1 = Hinv[i1:i2, i1:i2]

        for i in range(count):
            c = i1 + i
            if use_group and c % group_size == 0:
                scale, zp = _channelwise_qparams(
                    W[c : c + group_size, :].T,
                    quant_type, sym, rr, clip_ratio, mse, scale_dtype, zp_dtype,
                )
            w = W1[i, :]
            d = Hinv1[i, i]
            qint = np.clip(np.round(w / scale).astype(np.int32) + zp, qmin, qmax)
            qint = qint.astype(np.float32)
            q = (qint - zp) * scale
            err = (w - q) / d

            Q1[i, :] = q
            Qint1[i, :] = qint
            W1[i:, :] -= np.outer(Hinv1[i:, i], err)
            Err1[i, :] = err

        Q[i1:i2, :] = Q1
        Qint[i1:i2, :] = Qint1
        W[i2:, :] -= Hinv[i2:, i1:i2] @ Err1

    return Q, Qint


def gptq_quantize(
    weights: np.ndarray,
    inputs: np.ndarray,
    quant_type: QuantType = QuantType.QInt8,
    strategy: QuantizationStrategy = QuantizationStrategy.CHANNEL,
    group_size: int = 32,
    is_symmetric: bool = False,
    reduce_range: bool = False,
    clip_ratio: float = 1.0,
    block_size: int = 128,
    percdamp: float = 0.01,
    actorder: bool = False,
    mse: bool = False,
    scale_dtype=np.float32,
    zp_dtype=np.int8,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """GPTQ-quantize a ``(in_features, out_features)`` weight.

    ``inputs`` are captured activations of shape ``(samples, ..., in_features)``.
    Returns ``(q_weight, scale, zero_point)`` in the reference's artifact layout.
    """
    W = np.asarray(weights, dtype=np.float32).copy()
    K, N = W.shape

    H = np.zeros((K, K), dtype=np.float32)
    H, _ = accumulate_hessian(np.asarray(inputs), H, 0)

    use_group = strategy == QuantizationStrategy.GROUP and group_size and group_size != -1
    used_strategy = (
        QuantizationStrategy.CHANNEL if strategy == QuantizationStrategy.GROUP else strategy
    )

    # Initial qparams from the full weight, per used_strategy (ref gptq.py:103-117).
    if used_strategy == QuantizationStrategy.TENSOR:
        scale, zp = compute_qparams_from_array(
            W.T, quant_type, QuantizationStrategy.TENSOR, -1, is_symmetric,
            reduce_range, clip_ratio=clip_ratio, mse=mse,
            scale_dtype=scale_dtype, zp_dtype=np.float32,
        )
        scale, zp = np.float32(np.asarray(scale)), np.float32(np.asarray(zp))
    else:
        scale, zp = _channelwise_qparams(
            W.T, quant_type, is_symmetric, reduce_range, clip_ratio, mse,
            scale_dtype, zp_dtype,
        )

    # Mask dead Hessian channels (ref gptq.py:119-121).
    dead = np.diag(H) == 0
    H[dead, dead] = 1.0
    W[dead, :] = 0.0

    perm = None
    if actorder:
        perm = np.argsort(np.diag(H))[::-1]
        W = W[perm, :]
        H = H[perm, :][:, perm]

    Hinv = _cholesky_inverse_sweep(H, percdamp)
    if Hinv is None:
        logger.warning(
            "Failed to invert hessian due to numerical instability. Consider "
            "increasing percdamp, increasing the number of calibration samples, "
            "or shuffling the calibration dataset. Falling back to "
            "round-to-nearest for this module."
        )
        Hinv = np.eye(K, dtype=np.float32)

    qmin, qmax = quant_type.qrange(is_symmetric, reduce_range)
    gs = int(group_size) if use_group else -1

    jit_ok = (not mse) and (not use_group or K % gs == 0)
    if jit_ok:
        # Pad K to a block multiple; zero rows + identity Hinv diagonal are
        # numerically transparent (err = 0) so results match the unpadded sweep.
        K_pad = ((K + block_size - 1) // block_size) * block_size
        if K_pad != K:
            W_p = np.zeros((K_pad, N), dtype=np.float32)
            W_p[:K] = W
            Hinv_p = np.eye(K_pad, dtype=np.float32)
            Hinv_p[:K, :K] = Hinv
        else:
            W_p, Hinv_p = W, Hinv
        Q, Qint = _gptq_sweep_jit(
            jnp.asarray(W_p), jnp.asarray(Hinv_p),
            jnp.asarray(scale, dtype=jnp.float32), jnp.asarray(zp, dtype=jnp.float32),
            qmin=qmin, qmax=qmax, block_size=block_size,
            group_size=gs if use_group else 1, use_group=bool(use_group),
            sym=is_symmetric, rr=reduce_range, clip_ratio=float(clip_ratio),
            qt_name=quant_type.value,
        )
        Q = np.asarray(Q)[:K]
        Qint = np.asarray(Qint)[:K]
    else:
        Q, Qint = _gptq_sweep_host(
            W, Hinv, scale, zp, qmin=qmin, qmax=qmax, block_size=block_size,
            group_size=gs, use_group=bool(use_group), quant_type=quant_type,
            sym=is_symmetric, rr=reduce_range, clip_ratio=clip_ratio, mse=mse,
            scale_dtype=scale_dtype, zp_dtype=zp_dtype,
        )

    if actorder:
        invperm = np.argsort(perm)
        Q = Q[invperm, :]
        Qint = Qint[invperm, :]

    Qint = Qint.astype(quant_type.container_dtype)

    # Final scale/zp recompute from the dequantized result with the original
    # strategy (ref gptq.py:218-231).
    Q_pre = np.asarray(preprocess_array(Q, strategy, group_size))
    scale, zp = compute_qparams_from_array(
        Q_pre, quant_type, strategy, group_size, is_symmetric, reduce_range,
        clip_ratio=clip_ratio, mse=mse, scale_dtype=scale_dtype, zp_dtype=np.float32,
    )
    scale, zp = np.asarray(scale), np.asarray(zp)
    if strategy in {QuantizationStrategy.TENSOR, QuantizationStrategy.CHANNEL}:
        scale, zp = np.squeeze(scale), np.squeeze(zp)

    scale = scale.astype(np.float32)
    zp = zp.astype(Qint.dtype)
    return Qint, scale, zp
