"""Map the scale ceilings (VERDICT r1 #9): sweep n=4096, MPF m=32768.

Turns "chip-saturated at n=1024" into a measured ceiling: one recorded
probe per axis, with the failure mode (VMEM / HBM / latency / compile)
named from the actual error or the scaling shape.

  sweep_nN     scenario-sweep megakernel at N total episodes (N/8
               scanned groups per dispatch) — the group axis is pure
               program-repetition, so solves/s should stay flat until
               log-buffer HBM traffic or scan length matters.
  mpf_mM       FusedMPF posterior update (20 SVGD steps) at M
               particles — the streaming Gram kernel's HBM-bound
               regime (K tiles never touch HBM; x/score do).

Run on real TPU:
  timeout 1800 python bench/probes/scale_limits_probe.py
(env ONLY=sweep_n4096 etc., REPEATS=3.)
"""

import json
import os
import sys
import time
import traceback
from pathlib import Path

ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp

from dust_tpu.experiments import build_pendulum_stack, load_config


def time_best(run, repeats):
    jax.block_until_ready(run(0))
    best = float("inf")
    for i in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(run(i + 1))
        best = min(best, time.perf_counter() - t0)
    return best


def bench_sweep_n(n, steps, repeats):
    from dust_tpu.simulation import megakernel_pendulum_sweep_fn

    S = 8
    groups = n // S
    config = load_config(ROOT / "demo/pendulum_config.yaml")
    stack = build_pendulum_stack(config, jax.random.key(0), case="dust")
    sweep = megakernel_pendulum_sweep_fn(
        stack, config["exp_params"], steps=steps, n_sc=S, unroll=True
    )
    lens = jnp.linspace(0.8, 1.2, S)
    mass = jnp.linspace(0.9, 1.1, S)

    @jax.jit
    def run_groups(seeds):
        return jax.lax.scan(
            lambda _, s: (0, sweep(s, lens, mass)["cost"]), 0, seeds
        )[1]

    def run(i):
        seeds = jnp.stack(
            [jnp.full((groups,), i, jnp.int32),
             jnp.arange(groups, dtype=jnp.int32) * 1000], axis=1
        )
        return run_groups(seeds)

    best = time_best(run, repeats)
    return {"solves_per_s": round(n * steps / best, 1),
            "groups": groups}


def bench_mpf_m(m, repeats, chain=None):
    from dust_tpu.inference.mpf import FusedMPF

    config = load_config(ROOT / "demo/pendulum_config.yaml")
    stack = build_pendulum_stack(config, jax.random.key(0), case="dust")
    import optax

    mpf = FusedMPF(likelihood=stack.mpf.likelihood,
                   optimizer=optax.sgd(1e-3))
    particles = jax.random.uniform(jax.random.key(0), (m, 2),
                                   minval=0.6, maxval=1.3)
    obs0 = stack.init_state
    mstate = mpf.init_state(particles, obs0, dim_a=1, bw=0.2)
    if chain is None:
        chain = max(1, min(20, 2_000_000_000 // (m * m)))

    @jax.jit
    def chained(ms):
        def body(ms, _):
            ms, _, _ = mpf.optimize(ms, jnp.array([0.5]), obs0, bw=0.3,
                                    n_steps=20)
            return ms, ()

        ms, _ = jax.lax.scan(body, ms, jnp.arange(chain))
        return ms

    def run(i):
        return chained(mstate).x

    best = time_best(run, repeats) / chain
    return {"updates_per_s": round(1.0 / best, 3),
            "svgd_steps_per_s": round(20.0 / best, 2),
            "gram_gcells_per_s": round(20.0 * m * m / best / 1e9, 2),
            "chain": chain}


def main():
    repeats = int(os.environ.get("REPEATS", "3"))
    only = os.environ.get("ONLY")
    dev = str(jax.devices()[0])
    jobs = {
        "sweep_n1024": lambda: bench_sweep_n(1024, 200, repeats),
        "sweep_n4096": lambda: bench_sweep_n(4096, 200, repeats),
        "mpf_m8192": lambda: bench_mpf_m(8192, repeats),
        "mpf_m32768": lambda: bench_mpf_m(32768, repeats),
    }
    for name, fn in jobs.items():
        if only and name != only:
            continue
        try:
            out = fn()
            out.update({"config": name, "device": dev})
        except Exception as e:
            out = {"config": name, "device": dev,
                   "failed": f"{type(e).__name__}",
                   "detail": str(e).splitlines()[0][:300]}
            traceback.print_exc(file=sys.stderr)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
