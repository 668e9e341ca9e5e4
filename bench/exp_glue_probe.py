"""One-off probe: how much of the per-solve time is XLA glue vs the two
Pallas kernels? Times 200-step scans of (a) the solve kernel alone with
constant inputs, (b) the MPF kernel alone, (c) the full fused step
(bench.py default). Run on TPU: `python bench/exp_glue_probe.py`."""

import time

import jax
import jax.numpy as jnp

from dust_tpu.ops.pallas_mpf import fused_pendulum_mpf_optimize
from dust_tpu.ops.pallas_solve import fused_pendulum_solve

STEPS = 4000
HZ, M, NP, NA = 30, 3, 8, 128


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    key = jax.random.key(0)
    theta = jax.random.normal(key, (M, HZ)) * 0.5
    actions = jax.random.normal(key, (NA, M, HZ))
    lengths = jnp.ones((NP,))
    masses = jnp.ones((NP,))
    state0 = jnp.array([jnp.pi, 0.0])

    @jax.jit
    def solve_scan(theta):
        def body(th, _):
            outs = fused_pendulum_solve(
                state0, th, th, jnp.full((M,), -jnp.log(M)), th,
                th[0], actions, lengths, masses, 0.3, 2.0, 1.0, 0.5,
                2.0, 1.0, hz=HZ, m=M, n_params=NP, n_act=NA,
            )
            return outs[0], outs[4][0]
        _, a = jax.lax.scan(body, theta, None, length=STEPS)
        return a

    t = timeit(solve_scan, theta)
    print(f"solve kernel alone: {t / STEPS * 1e6:.1f} us/step "
          f"({STEPS / t:.0f} steps/s)")

    x = jnp.ones((50, 2)) + jax.random.normal(key, (50, 2)) * 0.1

    @jax.jit
    def mpf_scan(x):
        def body(x, _):
            x2 = fused_pendulum_mpf_optimize(
                x, x, jnp.array([jnp.pi, 0.0]), jnp.array([3.0, 0.1]),
                jnp.array([0.5]), 0.05, 0.1, 1e-3, 0.1, n_steps=20,
            )
            return x2, x2[0, 0]
        _, a = jax.lax.scan(body, x, None, length=STEPS)
        return a

    t = timeit(mpf_scan, x)
    print(f"mpf kernel alone:   {t / STEPS * 1e6:.1f} us/step "
          f"({STEPS / t:.0f} steps/s)")

    @jax.jit
    def both_scan(theta, x):
        def body(carry, _):
            th, x = carry
            outs = fused_pendulum_solve(
                state0, th, th, jnp.full((M,), -jnp.log(M)), th,
                th[0], actions, lengths, masses, 0.3, 2.0, 1.0, 0.5,
                2.0, 1.0, hz=HZ, m=M, n_params=NP, n_act=NA,
            )
            x2 = fused_pendulum_mpf_optimize(
                x, x, jnp.array([jnp.pi, 0.0]), jnp.array([3.0, 0.1]),
                jnp.array([0.5]), 0.05, 0.1, 1e-3, 0.1, n_steps=20,
            )
            return (outs[0], x2), outs[4][0]
        _, a = jax.lax.scan(body, (theta, x), None, length=STEPS)
        return a

    t = timeit(both_scan, theta, x)
    print(f"both kernels:       {t / STEPS * 1e6:.1f} us/step "
          f"({STEPS / t:.0f} steps/s)")


if __name__ == "__main__":
    main()
