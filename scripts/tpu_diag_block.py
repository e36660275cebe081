"""Does block_until_ready lie? Time block vs value materialization."""

import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    M, K, N = 32, 640, 262144
    x = jax.device_put(jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16), dev)
    wb = jax.device_put(
        jnp.asarray(0.05 * rng.standard_normal((K, N)), jnp.bfloat16), dev)
    iters = 150

    @jax.jit
    def loop(x0, seed, wt):
        def body(i, carry):
            xi = jnp.tanh(x0 + carry).astype(x0.dtype)
            y = xi @ wt
            return jnp.sum(jnp.abs(y)).astype(jnp.float32) * 1e-30 + carry

        return jax.lax.fori_loop(0, iters, body, seed)

    t0 = time.time()
    r = loop(x, jnp.float32(0.0), wb)
    t1 = time.time()
    r.block_until_ready()
    t2 = time.time()
    v = float(r)
    t3 = time.time()
    print(f"cold: dispatch {t1-t0:.3f}s block {t2-t1:.3f}s float {t3-t2:.4f}s "
          f"v={v:.3e}", flush=True)

    for rep in range(4):
        t0 = time.time()
        r = loop(x, jnp.float32((rep + 1) * 1e-6), wb)
        t1 = time.time()
        r.block_until_ready()
        t2 = time.time()
        v = float(r)
        t3 = time.time()
        print(f"warm{rep}: dispatch {(t1-t0)*1e3:.2f}ms "
              f"block {(t2-t1)*1e3:.2f}ms float {(t3-t2)*1e3:.2f}ms "
              f"per-iter(blk) {(t2-t0)/iters*1e6:.1f}us "
              f"per-iter(flt) {(t3-t0)/iters*1e6:.1f}us v={v:.3e}", flush=True)


if __name__ == "__main__":
    main()
