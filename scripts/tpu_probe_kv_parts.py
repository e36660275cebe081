"""Decompose the engine KV loop cost: write path vs attend path vs layout.

Follow-up to tpu_probe_kv_layout.py (LBSHD 14.4 ms/step, LBHSD 9.5 ms at the
4B shape): which half carries the remaining inflation, and does a single 5D
scatter into the big buffer beat the slice-out/update/slice-in pattern?

Variants (all (L,B,H,S,D) = (34,32,4,512,256) int8 unless noted):
  b_attend     attend-only on the cache (bf16 dots like the engine)
  b_write      write-only (slice-out, row scatter, slice-in; engine pattern)
  b_write5d    write-only via ONE scatter into the 5D buffer
  b_full5d     write5d + attend
  a_attend     attend-only on the (L,B,S,H,D) layout (read-side layout cost)

Run alone on the chip:
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/tpu_probe_kv_parts.py
"""

import json
import os
import time

os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")

import numpy as np

import jax
import jax.numpy as jnp

L, B, S, H, D = 34, 32, 4, 512, 256  # note: H/S named for LBHSD order below
NL, NB, NH, NS, ND = 34, 32, 4, 512, 256
Hq, G = 8, 2
STEPS_LO, STEPS_HI = 32, 128


def bench_steps(step_fn, operands):
    def timed(iters):
        @jax.jit
        def loop(seed, *ops):
            def body(i, carry):
                acc, state = carry
                acc2, state = step_fn(i, acc + seed * 1e-6, state)
                return (acc2, state)

            acc, _ = jax.lax.fori_loop(0, iters, body, (seed, ops))
            return acc

        float(loop(jnp.float32(0.0), *operands))
        ts = []
        for rep in range(3):
            t0 = time.time()
            loop(jnp.float32((rep + 1) * 1e-6), *operands).block_until_ready()
            ts.append(time.time() - t0)
        return float(np.median(ts))

    t_lo, t_hi = timed(STEPS_LO), timed(STEPS_HI)
    return (t_hi - t_lo) / (STEPS_HI - STEPS_LO) * 1e6


def main():
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]

    kb = rng.integers(-127, 127, size=(NL, NB, NH, NS, ND)).astype(np.int8)
    vb = rng.integers(-127, 127, size=(NL, NB, NH, NS, ND)).astype(np.int8)
    ksb = (0.01 + 0.001 * rng.random((NL, NB, NH, NS))).astype(np.float32)
    vsb = (0.01 + 0.001 * rng.random((NL, NB, NH, NS))).astype(np.float32)
    q = rng.standard_normal((NB, Hq, ND)).astype(np.float32)
    newk = rng.standard_normal((NB, NH, ND)).astype(np.float32)

    bidx = jnp.arange(NB)[:, None]
    hidx = jnp.arange(NH)[None, :]
    results = {}

    def attend_b(qi, kl, vl, ksl, vsl):
        qg = qi.reshape(NB, NH, G, ND)
        logits = jnp.einsum(
            "bkgd,bksd->bkgs", qg, kl.astype(qi.dtype)
        ).astype(jnp.float32) * ksl[:, :, None, :]
        p = jax.nn.softmax(logits, axis=-1)
        pv = (p * vsl[:, :, None, :]).astype(qi.dtype)
        o = jnp.einsum("bkgs,bksd->bkgd", pv, vl.astype(qi.dtype))
        return jnp.sum(jnp.abs(o.astype(jnp.float32)))

    # --- b_attend: attend-only, engine-like bf16 dots ---
    def step_attend(i, acc, state):
        ck, cv, cks, cvs, qv = state
        qi = jnp.tanh(qv + acc).astype(jnp.bfloat16)
        total = jnp.float32(0.0)
        for layer in range(NL):
            total += attend_b(qi, ck[layer], cv[layer], cks[layer], cvs[layer])
        return acc + total * 1e-30, state

    ops = [jax.device_put(jnp.asarray(a), dev) for a in (kb, vb, ksb, vsb, q)]
    results["b_attend"] = bench_steps(step_attend, ops)
    print(json.dumps({"arm": "b_attend", "us": round(results["b_attend"], 1)}),
          flush=True)

    # --- b_write: engine-style slice-out/scatter/slice-in write ---
    def step_write(i, acc, state):
        ck, cv, nk = state
        pos = (128 + i % 64)[None, None] + jnp.zeros((NB, NH), jnp.int32)
        upd = jnp.clip(jnp.round(jnp.tanh(nk + acc) * 100.0), -127, 127
                       ).astype(jnp.int8)
        for layer in range(NL):
            ck = ck.at[layer].set(
                ck[layer].at[bidx, hidx, pos].set(upd, mode="drop"))
            cv = cv.at[layer].set(
                cv[layer].at[bidx, hidx, pos].set(upd, mode="drop"))
        # Read a position that was actually WRITTEN this step: a fixed unwritten
        # index would leave the scatters formally dead (a compiler with scatter
        # range analysis could DCE the whole body — the loop-invariant trap).
        live = jnp.sum(ck[0, 0, 0, 128 + i % 64].astype(jnp.float32))
        return acc + live * 1e-30, (ck, cv, nk)

    ops_w = [jax.device_put(jnp.asarray(a), dev) for a in (kb, vb, newk)]
    results["b_write"] = bench_steps(step_write, ops_w)
    print(json.dumps({"arm": "b_write", "us": round(results["b_write"], 1)}),
          flush=True)

    # --- b_write5d: one scatter straight into the (L,B,H,S,D) buffer ---
    def step_write5d(i, acc, state):
        ck, cv, nk = state
        pos = (128 + i % 64)[None, None] + jnp.zeros((NB, NH), jnp.int32)
        upd = jnp.clip(jnp.round(jnp.tanh(nk + acc) * 100.0), -127, 127
                       ).astype(jnp.int8)
        for layer in range(NL):
            ck = ck.at[layer, bidx, hidx, pos].set(upd, mode="drop")
            cv = cv.at[layer, bidx, hidx, pos].set(upd, mode="drop")
        live = jnp.sum(ck[0, 0, 0, 128 + i % 64].astype(jnp.float32))
        return acc + live * 1e-30, (ck, cv, nk)

    results["b_write5d"] = bench_steps(step_write5d, ops_w)
    print(json.dumps({"arm": "b_write5d", "us": round(results["b_write5d"], 1)}),
          flush=True)

    # --- b_full5d ---
    def step_full5d(i, acc, state):
        ck, cv, cks, cvs, qv, nk = state
        qi = jnp.tanh(qv + acc).astype(jnp.bfloat16)
        pos = (128 + i % 64)[None, None] + jnp.zeros((NB, NH), jnp.int32)
        upd = jnp.clip(jnp.round(jnp.tanh(nk + acc) * 100.0), -127, 127
                       ).astype(jnp.int8)
        total = jnp.float32(0.0)
        for layer in range(NL):
            ck = ck.at[layer, bidx, hidx, pos].set(upd, mode="drop")
            cv = cv.at[layer, bidx, hidx, pos].set(upd, mode="drop")
            total += attend_b(qi, ck[layer], cv[layer], cks[layer], cvs[layer])
        return acc + total * 1e-30, (ck, cv, cks, cvs, qv, nk)

    ops_f = [jax.device_put(jnp.asarray(a), dev)
             for a in (kb, vb, ksb, vsb, q, newk)]
    results["b_full5d"] = bench_steps(step_full5d, ops_f)
    print(json.dumps({"arm": "b_full5d", "us": round(results["b_full5d"], 1)}),
          flush=True)

    # --- a_attend: attend-only on the current (L,B,S,H,D) layout ---
    ka = np.transpose(kb, (0, 1, 3, 2, 4)).copy()
    va = np.transpose(vb, (0, 1, 3, 2, 4)).copy()
    ksa = np.transpose(ksb, (0, 1, 3, 2)).copy()
    vsa = np.transpose(vsb, (0, 1, 3, 2)).copy()

    def step_attend_a(i, acc, state):
        ck, cv, cks, cvs, qv = state
        qi = jnp.tanh(qv + acc).astype(jnp.bfloat16)
        total = jnp.float32(0.0)
        for layer in range(NL):
            kl, vl = ck[layer], cv[layer]  # (B, S, H, D)
            qg = qi.reshape(NB, NH, G, ND)
            logits = jnp.einsum(
                "bkgd,bskd->bkgs", qg, kl.astype(qi.dtype)
            ).astype(jnp.float32) * cks[layer].transpose(0, 2, 1)[:, :, None, :]
            p = jax.nn.softmax(logits, axis=-1)
            pv = (p * cvs[layer].transpose(0, 2, 1)[:, :, None, :]).astype(qi.dtype)
            o = jnp.einsum("bkgs,bskd->bkgd", pv, vl.astype(qi.dtype))
            total += jnp.sum(jnp.abs(o.astype(jnp.float32)))
        return acc + total * 1e-30, state

    ops_a = [jax.device_put(jnp.asarray(a), dev) for a in (ka, va, ksa, vsa, q)]
    results["a_attend"] = bench_steps(step_attend_a, ops_a)
    print(json.dumps({"arm": "a_attend", "us": round(results["a_attend"], 1)}),
          flush=True)

    print(json.dumps({"probe": "kv_parts_4b",
                      "rows": {k: round(v, 1) for k, v in results.items()}}))


if __name__ == "__main__":
    main()
