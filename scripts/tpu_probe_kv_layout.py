"""A/B the KV-cache layout: (L,B,S,H,D) vs (L,B,H,S,D) on the 4B decode path.

The 4B ablations showed ~580 us/layer of S_max-scaled cost in the engine
(smax256 removed 9.8 ms/step) while the isolated GQA attend on standalone
arrays costs 22 us — so the slack must come from how the cache BUFFER is laid
out/updated inside the loop, not the attend math. Hypothesis: with Hkv=4 the
(..., S, H, D) layout puts H=4 in the tiled sublane position (int8 tiles are
(32, 128)), padding the physical buffer ~8x; (..., H, S, D) makes the minor
dims (S, D) = (512, 256), tileable with zero padding.

This probe emulates one decode step's KV work (write at a position + scale-
folded int8 attend, x NUM_LAYERS) inside a fori_loop for both layouts.

Run alone on the chip:
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/tpu_probe_kv_layout.py
"""

import json
import os
import time

os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")

import numpy as np

import jax
import jax.numpy as jnp

L, B, S, H, D = 34, 32, 512, 4, 256
Hq, G = 8, 2
STEPS_LO, STEPS_HI = 32, 128


def bench_steps(step_fn, operands):
    """us per step via the slope between two trip counts (BENCH.md rules)."""

    def timed(iters):
        @jax.jit
        def loop(seed, *ops):
            def body(i, carry):
                acc, state = carry
                acc2, state = step_fn(i, acc + seed * 1e-6, state)
                return (acc2, state)

            acc, _ = jax.lax.fori_loop(0, iters, body, (seed, ops))
            return acc

        float(loop(jnp.float32(0.0), *operands))  # true sync (cold fetch)
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

    k8 = rng.integers(-127, 127, size=(L, B, S, H, D)).astype(np.int8)
    v8 = rng.integers(-127, 127, size=(L, B, S, H, D)).astype(np.int8)
    ks = (0.01 + 0.001 * rng.random((L, B, S, H))).astype(np.float32)
    vs = (0.01 + 0.001 * rng.random((L, B, S, H))).astype(np.float32)
    q = rng.standard_normal((B, Hq, D)).astype(np.float32)
    newk = rng.standard_normal((B, 1, H, D)).astype(np.float32)

    batch_idx = jnp.arange(B)[:, None]

    # ---- layout A: (L, B, S, H, D) — the engine's current layout ----
    def step_a(i, acc, state):
        ck, cv, cks, cvs, qv, nk = state
        qi = jnp.tanh(qv + acc).astype(jnp.bfloat16)
        pos = (128 + i % 64)[None, None] + jnp.zeros((B, 1), jnp.int32)
        total = jnp.float32(0.0)
        for layer in range(L):
            nq = jnp.clip(jnp.round(nk * 100.0), -127, 127).astype(jnp.int8)
            ck = ck.at[layer].set(
                ck[layer].at[batch_idx, pos].set(nq, mode="drop"))
            cv = cv.at[layer].set(
                cv[layer].at[batch_idx, pos].set(nq, mode="drop"))
            kl, vl = ck[layer], cv[layer]  # (B, S, H, D) int8
            qg = qi.reshape(B, H, G, D)
            logits = jnp.einsum(
                "bkgd,bskd->bkgs", qg.astype(jnp.float32), kl.astype(jnp.float32)
            ) * cks[layer].transpose(0, 2, 1)[:, :, None, :]
            p = jax.nn.softmax(logits, axis=-1)
            pv = p * cvs[layer].transpose(0, 2, 1)[:, :, None, :]
            o = jnp.einsum("bkgs,bskd->bkgd", pv, vl.astype(jnp.float32))
            total = total + jnp.sum(jnp.abs(o))
        return acc + total * 1e-30, (ck, cv, cks, cvs, qv, nk)

    ops_a = [jax.device_put(jnp.asarray(a), dev)
             for a in (k8, v8, ks, vs, q, newk)]
    us_a = bench_steps(step_a, ops_a)
    print(json.dumps({"layout": "LBSHD", "us_per_step": round(us_a, 1)}),
          flush=True)

    # ---- layout B: (L, B, H, S, D) — minor dims (S, D), zero padding ----
    def step_b(i, acc, state):
        ck, cv, cks, cvs, qv, nk = state
        qi = jnp.tanh(qv + acc).astype(jnp.bfloat16)
        pos = (128 + i % 64)[None, None] + jnp.zeros((B, H), jnp.int32)
        bidx = jnp.arange(B)[:, None]
        hidx = jnp.arange(H)[None, :]
        total = jnp.float32(0.0)
        for layer in range(L):
            nq = jnp.clip(jnp.round(nk * 100.0), -127, 127).astype(jnp.int8)
            upd = nq[:, 0]  # (B, H, D) — one new row per (batch, head)
            ck = ck.at[layer].set(
                ck[layer].at[bidx, hidx, pos].set(upd, mode="drop"))
            cv = cv.at[layer].set(
                cv[layer].at[bidx, hidx, pos].set(upd, mode="drop"))
            kl, vl = ck[layer], cv[layer]  # (B, H, S, D) int8
            qg = qi.reshape(B, H, G, D)
            logits = jnp.einsum(
                "bkgd,bksd->bkgs", qg.astype(jnp.float32), kl.astype(jnp.float32)
            ) * cks[layer][:, :, None, :]
            p = jax.nn.softmax(logits, axis=-1)
            pv = p * cvs[layer][:, :, None, :]
            o = jnp.einsum("bkgs,bksd->bkgd", pv, vl.astype(jnp.float32))
            total = total + jnp.sum(jnp.abs(o))
        return acc + total * 1e-30, (ck, cv, cks, cvs, qv, nk)

    k8b = np.transpose(k8, (0, 1, 3, 2, 4)).copy()
    v8b = np.transpose(v8, (0, 1, 3, 2, 4)).copy()
    ksb = np.transpose(ks, (0, 1, 3, 2)).copy()
    vsb = np.transpose(vs, (0, 1, 3, 2)).copy()
    ops_b = [jax.device_put(jnp.asarray(a), dev)
             for a in (k8b, v8b, ksb, vsb, q, newk)]
    us_b = bench_steps(step_b, ops_b)
    print(json.dumps({"layout": "LBHSD", "us_per_step": round(us_b, 1)}),
          flush=True)

    print(json.dumps({
        "probe": "kv_layout_4b",
        "LBSHD_us": round(us_a, 1),
        "LBHSD_us": round(us_b, 1),
        "speedup": round(us_a / us_b, 2) if us_b else None,
    }))


if __name__ == "__main__":
    main()
