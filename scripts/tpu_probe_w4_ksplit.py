"""Probe: K-widened W4 decode kernel vs the shipped per-pair-dot kernel.

Round-2 post-mortem (`tpu_probe_w4_unpack.py`) proved the nibble-unpack VPU
chain is NOT the binding cost at mid-size decode shapes (gate_up/qkv, 66-67%
of datasheet) — the small-K MXU dots / memory scheduling are: the shipped
kernel issues one (bm, gs) x (gs, bn) dot PER scale group (K=128 contraction,
poor MXU pipeline fill). VERDICT r2 #5 asks for one more attempt at that
cost.

This variant widens the contraction: per grid step it unpacks ALL ppb group
pairs and applies the per-group scale onto the weight tile (one extra VPU mul
per weight), writes the scaled bf16 rows into a VMEM scratch, and issues ONE
(bm, 2*ppb*gs) x (2*ppb*gs, bn) dot. The zero-point affine is folded into a
SECOND small dot: y -= XS @ ZS with XS (bm, n_groups) the per-group x sums
and ZS (n_groups, bn) the baked zp*s rows. Numerics: the weight rounds to
bf16 after scaling (same trade the prefill dense path takes) instead of the
shipped kernel's exact-f32 epilogue — measured here, judged separately.

Run alone on the chip:
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/tpu_probe_w4_ksplit.py
"""

import functools
import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_kernel():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(x_ref, w_ref, s_ref, zs_ref, o_ref, acc_ref, ws_ref, *, gs, n_k,
             ppb, bm, compute_dtype):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        xs_cols = []
        zs_rows = []
        x = x_ref[:]
        for p in range(ppb):
            w = w_ref[p * gs : (p + 1) * gs, :].astype(jnp.int32)
            low = w & 0x0F
            high = w >> 4
            ws_ref[2 * p * gs : (2 * p + 1) * gs, :] = (
                low.astype(jnp.float32) * s_ref[p, 0:1, :]
            ).astype(compute_dtype)
            ws_ref[(2 * p + 1) * gs : (2 * p + 2) * gs, :] = (
                high.astype(jnp.float32) * s_ref[p, 1:2, :]
            ).astype(compute_dtype)
            lo = 2 * p * gs
            xs_cols.append(
                jnp.sum(x[:, lo : lo + gs].astype(jnp.float32), axis=1, keepdims=True)
            )
            xs_cols.append(
                jnp.sum(x[:, lo + gs : lo + 2 * gs].astype(jnp.float32), axis=1,
                        keepdims=True)
            )
            zs_rows.append(zs_ref[p, 0:1, :])
            zs_rows.append(zs_ref[p, 1:2, :])

        acc_ref[:] += jnp.dot(x, ws_ref[:], preferred_element_type=jnp.float32)
        xs = jnp.concatenate(xs_cols, axis=1)           # (bm, 2*ppb)
        zs = jnp.concatenate(zs_rows, axis=0)           # (2*ppb, bn)
        acc_ref[:] -= jnp.dot(xs, zs, preferred_element_type=jnp.float32)

        @pl.when(k == n_k - 1)
        def _():
            o_ref[:] = acc_ref[:].astype(o_ref.dtype)

    @functools.partial(
        jax.jit, static_argnames=("gs", "bm", "bn", "ppb", "interpret")
    )
    def call(x2d, data, scales, zs, *, gs, bm, bn, ppb, interpret=False):
        M, K_pad = x2d.shape
        half_rows, N = data.shape
        n_pairs = half_rows // gs
        n_k = n_pairs // ppb
        grid = (M // bm, N // bn, n_k)
        kernel = functools.partial(
            kern, gs=gs, n_k=n_k, ppb=ppb, bm=bm, compute_dtype=x2d.dtype
        )
        return pl.pallas_call(
            kernel,
            grid=grid,
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
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((bm, bn), jnp.float32),
                pltpu.VMEM((2 * ppb * gs, bn), x2d.dtype),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(x2d, data, scales, zs)

    return call


def build_qt(K, N, gs, seed=0):
    import jax

    from onnx_quantize_tpu.algorithms.rtn import rtn_quantize
    from onnx_quantize_tpu.core.dtypes import QuantType
    from onnx_quantize_tpu.core.enums import QuantizationStrategy
    from onnx_quantize_tpu.nn.qtensor import make_qtensor

    rng = np.random.default_rng(seed)
    w = (0.1 * rng.standard_normal((K, N))).astype(np.float32)
    q, s, zp = rtn_quantize(
        w, QuantType.QUInt4, QuantizationStrategy.GROUP, gs, False, False
    )
    return make_qtensor(
        q, s, zp, quant_type=QuantType.QUInt4,
        strategy=QuantizationStrategy.GROUP, group_size=gs, symmetric=False,
        reduce_range=False,
    )


def prep(qt, gs):
    """Kernel operands: packed data, (G/2, 2, N) scales, baked zp*s rows."""
    import jax.numpy as jnp

    from onnx_quantize_tpu.ops.kernels.matmul_w4 import _expand_scales

    K, N = qt.meta.shape
    half_rows = qt.data.shape[0]
    G_pad = 2 * half_rows // gs
    s, z = _expand_scales(qt, G_pad, N)
    zs = (s * z).reshape(G_pad // 2, 2, N)
    s3 = s.reshape(G_pad // 2, 2, N)
    return jnp.asarray(qt.data), s3, zs


def main():
    import jax
    import jax.numpy as jnp

    from onnx_quantize_tpu.ops.kernels.matmul_w4 import w4_dequant_matmul
    from onnx_quantize_tpu.ops.reference import dequantize_weight
    from onnx_quantize_tpu.tools.benchmark import bench_fn

    call = make_kernel()

    # Correctness first (CPU interpret on a small case).
    with jax.default_device(jax.devices("cpu")[0]):
        gs = 64
        qt = build_qt(256, 256, gs)
        data, s3, zs = prep(qt, gs)
        x = jnp.asarray(np.random.default_rng(1).standard_normal((8, 256)),
                        jnp.float32)
        got = call(x, data, s3, zs, gs=gs, bm=8, bn=256, ppb=1, interpret=True)
        want = x @ dequantize_weight(qt)
        err = float(jnp.max(jnp.abs(got - want)))
        print(json.dumps({"check": "interpret", "max_err": err}), flush=True)
        assert err < 1e-3, err

    if jax.default_backend() != "tpu":
        print(json.dumps({"note": "no TPU; perf probe skipped"}))
        return

    shapes = [
        ("1b_gate_up", 1152, 13824, 128),
        ("1b_qkv", 1152, 1536, 128),
        ("270m_gate_up", 640, 4096, 128),
        ("270m_lm_head_g64", 640, 262144, 64),
    ]
    explicit = {
        # deep-K configs the first pass's greedy candidate scan never tried
        "1b_gate_up": [(2304, 5), (1728, 5), (1152, 5)],
        "270m_gate_up": [(1024, 3), (512, 3)],
        "270m_lm_head_g64": [(4096, 5), (2048, 5), (1024, 5)],
        "1b_qkv": [(512, 5), (256, 5)],
    }
    M = 32
    rngx = np.random.default_rng(2)
    for name, K, N, gs in shapes:
        with jax.default_device(jax.devices("cpu")[0]):
            qt = build_qt(K, N, gs)
            data, s3, zs = prep(qt, gs)
            w_dense = np.asarray(dequantize_weight(qt)).astype(np.float32)
        dev = jax.devices()[0]
        qt_dev = jax.tree_util.tree_map(lambda a: jax.device_put(a, dev), qt)
        data, s3, zs = (jax.device_put(a, dev) for a in (data, s3, zs))
        w_bf16 = jax.device_put(jnp.asarray(w_dense, jnp.bfloat16), dev)
        x = jax.device_put(
            jnp.asarray(rngx.standard_normal((M, K)), jnp.bfloat16), dev
        )

        K_pad = 2 * data.shape[0]
        x_pad = jnp.pad(x, ((0, 0), (0, K_pad - K))) if K_pad != K else x
        half = data.shape[0]
        n_pairs = half // gs

        rows = []
        cands = explicit[name]
        for bn, ppb in cands:
            try:
                sec = bench_fn(
                    lambda a, d, s, z: call(
                        a, d, s, z, gs=gs, bm=32, bn=bn, ppb=ppb
                    ),
                    x_pad, data, s3, zs, iters=200,
                )
            except Exception as e:  # noqa: BLE001
                rows.append({"cfg": f"ksplit bn={bn} ppb={ppb}", "error": str(e)[:120]})
                continue
            gb = (data.nbytes + s3.nbytes + zs.nbytes + x.nbytes + M * N * 4) / sec / 1e9
            rows.append({"cfg": f"ksplit bn={bn} ppb={ppb}",
                         "us": round(sec * 1e6, 1), "gbps": round(gb, 1)})

        sec = bench_fn(lambda a, w: w4_dequant_matmul(a, w), x, qt_dev, iters=200)
        gb = (qt_dev.data.nbytes + M * K * 2 + M * N * 4) / sec / 1e9
        rows.append({"cfg": "shipped w4", "us": round(sec * 1e6, 1),
                     "gbps": round(gb, 1)})

        sec = bench_fn(lambda a, w: a @ w, x, w_bf16, iters=200)
        gb = (w_bf16.nbytes + M * K * 2 + M * N * 4) / sec / 1e9
        rows.append({"cfg": "dense bf16 control", "us": round(sec * 1e6, 1),
                     "gbps": round(gb, 1)})

        print(json.dumps({"shape": name, "MKN": [M, K, N], "gs": gs,
                          "rows": rows}), flush=True)


if __name__ == "__main__":
    main()
