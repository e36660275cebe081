"""A/B the W4 nibble-unpack strategy at the unpack-bound lm_head shape.

The W4 kernel at shallow K / fat N (270M lm_head: 640x262144) is VPU-bound in
the unpack chain (u8 -> i32 -> bitwise -> f32 -> bf16: ~355 GB/s effective vs
W8's 702). Direct u8->bf16 and i32->bf16 casts are unimplemented on this
toolchain (round-2 probe), but a u16 bitcast trick IS available:

    bf16(128 + v) == bitcast_u16(0x4300 | v)   (exact: v < 128 fits the
    7-bit mantissa)

so the unpack becomes u16 widen, mask/or, bitcast, one bf16 subtract —
roughly half the i32-domain work. This probes both variants through the real
grid/block structure.

Run alone on the chip:
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/tpu_probe_w4_unpack.py
"""

import functools
import json
import os
import time

os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from onnx_quantize_tpu.ops.kernels.matmul_w4 import _pick_blocks


def _kernel(x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref, *, gs, n_k, ppb,
            variant):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    for p in range(ppb):
        x = x_ref[:]
        lo = 2 * p * gs
        xl = x[:, lo : lo + gs]
        xh = x[:, lo + gs : lo + 2 * gs]
        xs_l = jnp.sum(xl.astype(jnp.float32), axis=1, keepdims=True)
        xs_h = jnp.sum(xh.astype(jnp.float32), axis=1, keepdims=True)

        if variant == "i32":
            w = w_ref[p * gs : (p + 1) * gs, :].astype(jnp.int32)
            low_c = (w & 0x0F).astype(jnp.float32).astype(jnp.bfloat16)
            high_c = (w >> 4).astype(jnp.float32).astype(jnp.bfloat16)
            dot_l = jnp.dot(xl, low_c, preferred_element_type=jnp.float32)
            dot_h = jnp.dot(xh, high_c, preferred_element_type=jnp.float32)
            acc_ref[:] += (dot_l - xs_l * z_ref[p, 0:1, :]) * s_ref[p, 0:1, :] + (
                dot_h - xs_h * z_ref[p, 1:2, :]
            ) * s_ref[p, 1:2, :]
        else:
            # u16 bitcast unpack — no shifts (arith.shrui is illegal here),
            # no per-element casts through f32:
            #   bf16(128 + v_lo)     = bitcast(0x4300 | (w & 0x0F))
            #   bf16(2048 + 16 v_hi) = bitcast(0x4500 | (w & 0xF0))
            # The constant offsets and the 16x fold into the existing affine
            # epilogue on the (bm, bn) partial product:
            #   dot(x, v_lo) = dot_raw_l - 128 * sum(x)
            #   dot(x, v_hi) = (dot_raw_h - 2048 * sum(x)) / 16.
            w16 = w_ref[p * gs : (p + 1) * gs, :].astype(jnp.uint16)
            low_c = jax.lax.bitcast_convert_type(
                (w16 & 0x000F) | 0x4300, jnp.bfloat16)
            high_c = jax.lax.bitcast_convert_type(
                (w16 & 0x00F0) | 0x4500, jnp.bfloat16)
            dot_l = jnp.dot(xl, low_c, preferred_element_type=jnp.float32)
            dot_h = jnp.dot(xh, high_c, preferred_element_type=jnp.float32)
            acc_ref[:] += (
                dot_l - xs_l * (z_ref[p, 0:1, :] + 128.0)
            ) * s_ref[p, 0:1, :] + (
                dot_h - xs_h * (2048.0 + 16.0 * z_ref[p, 1:2, :])
            ) * (s_ref[p, 1:2, :] * (1.0 / 16.0))

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def build_call(K, N, gs, bm, variant):
    G = K // gs
    n_pairs = G // 2
    bn, ppb = _pick_blocks(bm, N, gs, n_pairs)
    n_k = n_pairs // ppb
    kern = functools.partial(_kernel, gs=gs, n_k=n_k, ppb=ppb, variant=variant)

    @jax.jit
    def call(x2d, data, scales, zps):
        return pl.pallas_call(
            kern,
            grid=(x2d.shape[0] // bm, N // bn, n_k),
            in_specs=[
                pl.BlockSpec((bm, 2 * ppb * gs), lambda i, j, k: (i, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ppb * gs, bn), lambda i, j, k: (k, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ppb, 2, bn), lambda i, j, k: (k, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ppb, 2, bn), lambda i, j, k: (k, 0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((x2d.shape[0], N), jnp.float32),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
        )(x2d, data, scales, zps)

    return call


def bench(call, x, data, scales, zps, iters=(150, 600)):
    def timed(n):
        @jax.jit
        def loop(x0, seed, d, s, z):
            def body(i, carry):
                xi = jnp.tanh(x0 + carry).astype(x0.dtype)
                y = call(xi, d, s, z)
                return jnp.sum(jnp.abs(y)).astype(jnp.float32) * 1e-30 + carry

            return jax.lax.fori_loop(0, n, body, seed)

        float(loop(x, jnp.float32(0.0), data, scales, zps))
        ts = []
        for rep in range(3):
            t = time.time()
            loop(x, jnp.float32((rep + 1) * 1e-6), data, scales, zps
                 ).block_until_ready()
            ts.append(time.time() - t)
        return float(np.median(ts))

    lo, hi = iters
    return (timed(hi) - timed(lo)) / (hi - lo)


def main():
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    M, bm = 32, 32
    for K, N, gs in ((640, 262144, 64), (2560, 262144, 128)):
        G = K // gs
        data = rng.integers(0, 255, size=(K // 2, N)).astype(np.uint8)
        scales = (0.01 + 0.001 * rng.random((G // 2, 2, N))).astype(np.float32)
        zps = (7.0 + rng.integers(0, 2, size=(G // 2, 2, N))).astype(np.float32)
        x = jax.device_put(jnp.asarray(
            rng.standard_normal((M, K)), jnp.bfloat16), dev)
        d = jax.device_put(jnp.asarray(data), dev)
        s = jax.device_put(jnp.asarray(scales), dev)
        z = jax.device_put(jnp.asarray(zps), dev)

        # Correctness cross-check first.
        y_i32 = build_call(K, N, gs, bm, "i32")(x, d, s, z)
        y_u16 = build_call(K, N, gs, bm, "u16")(x, d, s, z)
        err = float(jnp.max(jnp.abs(y_i32 - y_u16)))
        rel = err / float(jnp.max(jnp.abs(y_i32)))

        row = {"shape": f"{K}x{N} g{gs}", "rel_err": round(rel, 8)}
        for variant in ("i32", "u16"):
            call = build_call(K, N, gs, bm, variant)
            sec = bench(call, x, d, s, z)
            row[f"{variant}_us"] = round(sec * 1e6, 1)
            row[f"{variant}_gbps"] = round(K * N / 2 / sec / 1e9, 1)
        row["speedup"] = round(row["i32_us"] / row["u16_us"], 3)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
