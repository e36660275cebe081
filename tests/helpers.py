"""Shared test fixtures: tiny models in the reference test style.

Mirrors the reference helpers (``test/helpers.py:5-21``,
``test/test_quantize.py:20-39``): 2-layer MatMul model, Gemm model with bias,
fan-out shared-activation model; weights from a truncated normal
(sigma=0.1, clip 2.5 sigma) so quantization error stays small.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from onnx_quantize_tpu import nn
from onnx_quantize_tpu.nn.module import InputSpec


def truncated_normal(rng: np.random.Generator, shape, sigma=0.1, clip=2.5):
    w = rng.standard_normal(shape)
    return (sigma * np.clip(w, -clip, clip)).astype(np.float32)


class TwoMatMul(nn.Module):
    """x @ W1 @ W2 — two MatMul sites (no bias)."""

    def __init__(self, d_in=16, d_mid=32, d_out=8):
        super().__init__()
        self.fc1 = nn.Linear(d_in, d_mid, use_bias=False)
        self.fc2 = nn.Linear(d_mid, d_out, use_bias=False)
        self.input_specs = [InputSpec("input", (d_in,))]
        self.finalize()

    def __call__(self, params, x, ctx=None):
        return self.fc2(params["fc2"], self.fc1(params["fc1"], x, ctx=ctx), ctx=ctx)

    def random_params(self, rng: np.random.Generator):
        return {
            "fc1": {"w": jnp.asarray(truncated_normal(rng, (self.fc1.in_features, self.fc1.out_features)))},
            "fc2": {"w": jnp.asarray(truncated_normal(rng, (self.fc2.in_features, self.fc2.out_features)))},
        }


class GemmModel(nn.Module):
    """Two Gemm sites (bias)."""

    def __init__(self, d_in=16, d_mid=32, d_out=8):
        super().__init__()
        self.fc1 = nn.Linear(d_in, d_mid, use_bias=True)
        self.fc2 = nn.Linear(d_mid, d_out, use_bias=True)
        self.input_specs = [InputSpec("input", (d_in,))]
        self.finalize()

    def __call__(self, params, x, ctx=None):
        return self.fc2(params["fc2"], self.fc1(params["fc1"], x, ctx=ctx), ctx=ctx)

    def random_params(self, rng: np.random.Generator):
        return {
            "fc1": {
                "w": jnp.asarray(truncated_normal(rng, (self.fc1.in_features, self.fc1.out_features))),
                "b": jnp.asarray(truncated_normal(rng, (self.fc1.out_features,))),
            },
            "fc2": {
                "w": jnp.asarray(truncated_normal(rng, (self.fc2.in_features, self.fc2.out_features))),
                "b": jnp.asarray(truncated_normal(rng, (self.fc2.out_features,))),
            },
        }


class FanOutModel(nn.Module):
    """One activation feeding two parallel MatMul sites (shared input)."""

    def __init__(self, d=16):
        super().__init__()
        self.left = nn.Linear(d, d, use_bias=False)
        self.right = nn.Linear(d, d, use_bias=False)
        self.input_specs = [InputSpec("input", (d,))]
        self.finalize()

    def __call__(self, params, x, ctx=None):
        return self.left(params["left"], x, ctx=ctx) + self.right(params["right"], x, ctx=ctx)

    def random_params(self, rng: np.random.Generator):
        d = self.left.in_features
        return {
            "left": {"w": jnp.asarray(truncated_normal(rng, (d, d)))},
            "right": {"w": jnp.asarray(truncated_normal(rng, (d, d)))},
        }


class MixedModel(nn.Module):
    """One MatMul site + one Gemm site (for per-op-type targeting tests)."""

    def __init__(self, d=16):
        super().__init__()
        self.mm = nn.Linear(d, d, use_bias=False)
        self.gemm = nn.Linear(d, d, use_bias=True)
        self.input_specs = [InputSpec("input", (d,))]
        self.finalize()

    def __call__(self, params, x, ctx=None):
        return self.gemm(params["gemm"], self.mm(params["mm"], x, ctx=ctx), ctx=ctx)

    def random_params(self, rng: np.random.Generator):
        d = self.mm.in_features
        return {
            "mm": {"w": jnp.asarray(truncated_normal(rng, (d, d)))},
            "gemm": {
                "w": jnp.asarray(truncated_normal(rng, (d, d))),
                "b": jnp.asarray(truncated_normal(rng, (d,))),
            },
        }
