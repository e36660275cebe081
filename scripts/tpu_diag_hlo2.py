"""Print full optimized HLO for the old additive chain vs the tanh chain."""

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

    def old_loop(x0, seed, wt):
        def body(i, carry):
            y = (x0 + carry * 1e-30) @ wt
            return jnp.sum(jnp.abs(y)).astype(jnp.float32) * 1e-30 + carry

        return jax.lax.fori_loop(0, 150, body, seed)

    def tanh_loop(x0, seed, wt):
        def body(i, carry):
            xi = jnp.tanh(x0 + carry).astype(x0.dtype)
            y = xi @ wt
            return jnp.sum(jnp.abs(y)).astype(jnp.float32) * 1e-30 + carry

        return jax.lax.fori_loop(0, 150, body, seed)

    for name, fn in [("OLD", old_loop), ("TANH", tanh_loop)]:
        txt = jax.jit(fn).lower(x, jnp.float32(0.0), wb).compile().as_text()
        print(f"===== {name} ({len(txt.splitlines())} lines) =====", flush=True)
        print(txt, flush=True)


if __name__ == "__main__":
    main()
