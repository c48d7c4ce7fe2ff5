"""Minimal probe: is lax.fori_loop pathologically slow on this backend?

Times N dependent 4096x4096 bf16 matmuls three ways:
  a. chained dispatch (one jit call per matmul)
  b. one jit containing lax.fori_loop
  c. one jit containing a Python-unrolled chain
"""
import sys
import time

import numpy as np


def note(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    note(f"devices: {jax.devices()}")
    N, D = 32, 4096
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((D, D)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((D, D)) * 0.01, jnp.bfloat16)
    flops_per = 2.0 * D * D * D

    def step(x):
        y = x @ w
        return y / (jnp.abs(y).max() + 1.0)

    one = jax.jit(step)
    one(x0).block_until_ready()
    t0 = time.perf_counter()
    x = x0 + 1e-3
    for _ in range(N):
        x = one(x)
    float(x[0, 0])
    dt = (time.perf_counter() - t0) / N
    note(f"a chained dispatch : {dt*1e3:8.2f} ms/iter "
         f"({flops_per/dt/1e12:6.1f} TF/s)")

    @jax.jit
    def looped(x):
        return jax.lax.fori_loop(0, N, lambda i, c: step(c), x)

    looped(x0).block_until_ready()
    t0 = time.perf_counter()
    float(looped(x0 + 2e-3)[0, 0])
    dt = (time.perf_counter() - t0) / N
    note(f"b fori_loop        : {dt*1e3:8.2f} ms/iter "
         f"({flops_per/dt/1e12:6.1f} TF/s)")

    @jax.jit
    def unrolled(x):
        for _ in range(N):
            x = step(x)
        return x

    unrolled(x0).block_until_ready()
    t0 = time.perf_counter()
    float(unrolled(x0 + 3e-3)[0, 0])
    dt = (time.perf_counter() - t0) / N
    note(f"c unrolled in jit  : {dt*1e3:8.2f} ms/iter "
         f"({flops_per/dt/1e12:6.1f} TF/s)")


if __name__ == "__main__":
    main()
