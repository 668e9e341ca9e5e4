"""Layout experiment: does the rollout's tiny trailing state dim waste
the VPU?

Hypothesis: [R, 2]-shaped elementwise chains tile (sublane, lane) =
(R-ish, 2) — 2/128 lanes used — while a structure-of-arrays layout
(theta [R], theta_d [R]) fills lanes completely. Measures a 30-step
pendulum rollout scan over R=3072 rollouts both ways, dispatch-amortized.

Run: python bench/bench_layout.py
"""

import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

R = 3072
H = 30
ITERS = 200
DT = 0.05


def step_aos(states, actions):
    """Array-of-structs: states [R, 2], actions [R, 1] (production path)."""
    theta = states[..., 0:1]
    theta_d = states[..., 1:2]
    acts = jnp.clip(actions, -2.0, 2.0)
    theta_d = theta_d + DT * (
        -3.0 * 9.8 / 2.0 * jnp.sin(theta + math.pi) + 3.0 * acts
    )
    theta_d = jnp.clip(theta_d, -8.0, 8.0)
    theta = theta + theta_d * DT
    return jnp.concatenate([theta, theta_d], axis=-1)


def step_soa(theta, theta_d, acts):
    """Structure-of-arrays: three [R] vectors."""
    acts = jnp.clip(acts, -2.0, 2.0)
    theta_d = theta_d + DT * (
        -3.0 * 9.8 / 2.0 * jnp.sin(theta + math.pi) + 3.0 * acts
    )
    theta_d = jnp.clip(theta_d, -8.0, 8.0)
    theta = theta + theta_d * DT
    return theta, theta_d


@jax.jit
def rollout_aos(s0, actions):  # actions [H, R, 1]
    def body(s, a):
        s2 = step_aos(s, a)
        return s2, jnp.sum(s2)

    def outer(i, carry):
        s, acc = carry
        s, tot = jax.lax.scan(body, s0 + 1e-6 * acc, actions)
        return s, acc + tot.sum()

    s, acc = jax.lax.fori_loop(0, ITERS, outer, (s0, jnp.float32(0.0)))
    return acc


@jax.jit
def rollout_soa(theta0, theta_d0, actions):  # actions [H, R]
    def body(carry, a):
        th, thd = carry
        th, thd = step_soa(th, thd, a)
        return (th, thd), jnp.sum(th)

    def outer(i, carry):
        th, thd, acc = carry
        (th, thd), tot = jax.lax.scan(
            body, (theta0 + 1e-6 * acc, theta_d0), actions
        )
        return th, thd, acc + tot.sum()

    th, thd, acc = jax.lax.fori_loop(
        0, ITERS, outer, (theta0, theta_d0, jnp.float32(0.0))
    )
    return acc


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best / ITERS


def main():
    key = jax.random.key(0)
    s0 = jax.random.normal(key, (R, 2))
    actions = jax.random.normal(key, (H, R, 1)) * 2

    t_aos = timeit(rollout_aos, s0, actions)
    t_soa = timeit(rollout_soa, s0[:, 0], s0[:, 1], actions[..., 0])
    print(json.dumps({
        "rollout_aos_us": round(t_aos * 1e6, 1),
        "rollout_soa_us": round(t_soa * 1e6, 1),
        "speedup": round(t_aos / t_soa, 2),
        "R": R, "H": H,
    }))


if __name__ == "__main__":
    main()
