"""Measure (don't estimate) the particle sweep-megakernel question.

VERDICT r1 #1b: STATUS_r1 rejected a scenario-batched particle sweep
megakernel on a back-of-envelope (~300 us/episode x serialized groups
loses to the ~5 ms vmapped per-step sweep). This probe measures the
actual candidates at matched (N, STEPS) on the real chip:

  perstep_fused   production path (BASELINE row 7): scenario-vmapped
                  per-step fused-Pallas rollout+cost and mass-posterior
                  kernels (ParticleScenarioSweep)
  vmapped_mega    vmap over N lanes of the EXISTING single-episode
                  particle megakernel (ops/pallas_particle_episode.py):
                  pallas_call lifts the batch axis to a leading grid
                  dimension — sequential grid steps, pipelined. This is
                  exactly the throughput a scenario-batched sweep kernel
                  would have to beat, measured rather than argued: a
                  hand-batched S-in-rows kernel shares work across
                  scenarios only in the glue (one program launch), the
                  per-scenario math is the same VPU/MXU work.
  scanned_mega    lax.scan over N episodes of the same megakernel (the
                  fully-serial model the r1 estimate assumed)

Run on real TPU: `timeout 900 python bench/probes/particle_sweep_probe.py`
(env N=64 STEPS=200 REPEATS=3 ONLY=variant to override).
"""

import json
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp

from dust_tpu.experiments import build_particle_stack, load_config
from dust_tpu.simulation import (
    megakernel_particle_episode_fn,
    particle_episode_fn,
)


def time_best(run, repeats):
    jax.block_until_ready(run(0))  # compile + warm
    best = float("inf")
    for i in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(run(i + 1))
        best = min(best, time.perf_counter() - t0)
    return best


def bench_perstep_fused(n, steps, repeats):
    from dust_tpu.inference.mpf import FusedParticleMPF
    from dust_tpu.parallel.sweep import (
        ParticleScenarioSweep,
        broadcast_scenarios,
    )

    config = load_config(ROOT / "demo/particle_config.yaml")
    config["exp_params"]["fused_rollout"] = True
    stack = build_particle_stack(config, jax.random.key(0))
    exp = config["exp_params"]
    stack.mpf = FusedParticleMPF(
        likelihood=stack.mpf.likelihood, lr=exp["mpf_learning_rate"],
        bw_scale=exp["mpf_bandwidth_scaling"], n_steps=exp["mpf_steps"],
    )
    episode = particle_episode_fn(
        stack.model, stack.controller, svmpc=stack.svmpc, mpf=stack.mpf,
        dyn_dist=stack.dynamics_prior, load=stack.load, steps=steps,
        warm_up=0, mpf_bw=stack.mpf_bw, mpf_steps=stack.mpf_steps,
    )
    sweep = ParticleScenarioSweep(episode, mesh=None)
    state0 = jnp.broadcast_to(stack.init_state, (n, 4))
    dstate = broadcast_scenarios(stack.controller.init_state(), n)
    svstate = broadcast_scenarios(
        stack.svmpc.init_state(stack.init_policies, stack.policies_prior),
        n,
    )
    mstate = broadcast_scenarios(
        stack.mpf.init_state(stack.mpf_init, stack.init_state, 2,
                             bw=stack.mpf_init_bw), n
    )
    masses = jnp.linspace(1.5, 3.0, n)

    def run(i):
        ks = jax.random.split(jax.random.key(i), n)
        return sweep.run(ks, state0, dstate, svstate, mstate,
                         masses)["cum_cost"]

    return n * steps / time_best(run, repeats)


def _mega_episode(steps):
    config = load_config(ROOT / "demo/particle_config.yaml")
    stack = build_particle_stack(config, jax.random.key(0))
    episode = megakernel_particle_episode_fn(
        stack, config["exp_params"], steps=steps, warm_up=0
    )
    return episode


def bench_sweep_mega(n, steps, repeats):
    """The scenario-batched particle sweep megakernel (r2,
    ops/pallas_particle_sweep_episode.py): 8 episodes per Pallas
    program, lax.scan over n/8 groups per dispatch."""
    from dust_tpu.simulation import megakernel_particle_sweep_fn

    S = min(8, n)
    groups = max(1, n // S)
    config = load_config(ROOT / "demo/particle_config.yaml")
    stack = build_particle_stack(config, jax.random.key(0))
    sweep = megakernel_particle_sweep_fn(
        stack, config["exp_params"], steps=steps, n_sc=S, unroll=True
    )
    masses = jnp.linspace(1.6, 2.4, S)

    @jax.jit
    def run_groups(seeds):
        return jax.lax.scan(
            lambda _, sd: (0, sweep(sd, masses)["cum"]), 0, seeds
        )[1]

    def run(i):
        seeds = jnp.stack(
            [jnp.full((groups,), i, jnp.int32),
             jnp.arange(groups, dtype=jnp.int32) * 1000], axis=1
        )
        return run_groups(seeds)

    return n * steps / time_best(run, repeats)


def bench_vmapped_mega(n, steps, repeats):
    episode = _mega_episode(steps)
    masses = jnp.linspace(1.5, 3.0, n)

    @jax.jit
    def run_all(seeds):
        return jax.vmap(lambda s, m: episode(s, m)["cum"][-1])(
            seeds, masses
        )

    def run(i):
        seeds = jnp.stack(
            [jnp.full((n,), i, jnp.int32),
             jnp.arange(n, dtype=jnp.int32)], axis=1
        )
        return run_all(seeds)

    return n * steps / time_best(run, repeats)


def bench_scanned_mega(n, steps, repeats):
    episode = _mega_episode(steps)
    masses = jnp.linspace(1.5, 3.0, n)

    @jax.jit
    def run_all(seeds):
        def body(acc, op):
            s, m = op
            return acc + episode(s, m)["cum"][-1], ()

        tot, _ = jax.lax.scan(body, jnp.float32(0.0), (seeds, masses))
        return tot

    def run(i):
        seeds = jnp.stack(
            [jnp.full((n,), i, jnp.int32),
             jnp.arange(n, dtype=jnp.int32)], axis=1
        )
        return run_all(seeds)

    return n * steps / time_best(run, repeats)


def main():
    n = int(os.environ.get("N", 64))
    steps = int(os.environ.get("STEPS", 200))
    repeats = int(os.environ.get("REPEATS", 3))
    only = os.environ.get("ONLY")
    dev = str(jax.devices()[0])
    variants = {
        "sweep_mega": bench_sweep_mega,
        "perstep_fused": bench_perstep_fused,
        "vmapped_mega": bench_vmapped_mega,
        "scanned_mega": bench_scanned_mega,
    }
    for name, fn in variants.items():
        if only and name != only:
            continue
        solves = fn(n, steps, repeats)
        print(json.dumps({"variant": name, "n": n, "steps": steps,
                          "solves_per_s": round(solves, 1),
                          "device": dev}), flush=True)


if __name__ == "__main__":
    main()
