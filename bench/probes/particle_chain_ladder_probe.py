"""CH x S x n ladder for the PARTICLE sweep megakernel (r5).

VERDICT r4 #1b: the multi-chain lever, ported from the pendulum sweep
kernel (`ops/pallas_particle_sweep_episode.py` n_chains). Same
methodology as `chain_ladder_probe.py` (scan over groups inside ONE
dispatch, best-of repeats) at the particle demo shapes.

Run on real TPU:
    timeout 3600 python bench/probes/particle_chain_ladder_probe.py
Env: PLADDER_S="8,16" PLADDER_CH="1,2,4" PLADDER_N="256,1024,2048"
     PLADDER_STEPS=200 PLADDER_REPEATS=3
"""

import json
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(ROOT))
os.chdir(ROOT)

from dust_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from dust_tpu.experiments import build_particle_stack, load_config
from dust_tpu.simulation import megakernel_particle_sweep_fn

STEPS = int(os.environ.get("PLADDER_STEPS", "200"))
REPEATS = int(os.environ.get("PLADDER_REPEATS", "3"))

config = load_config("demo/particle_config.yaml")
stack = build_particle_stack(config, jax.random.key(0))


def measure(S, CH, n):
    groups = max(1, n // (S * CH))
    sweep = megakernel_particle_sweep_fn(
        stack, config["exp_params"], steps=STEPS, n_sc=S, warm_up=0,
        unroll=True, n_chains=CH,
    )
    masses = jnp.linspace(1.6, 2.4, S)

    @jax.jit
    def chained(seeds):
        def body(_, s):
            return 0, sweep(s, masses)["cum"]

        _, cums = jax.lax.scan(body, 0, seeds)
        return cums

    def run(i):
        seeds = jnp.stack(
            [jnp.full((groups,), i, jnp.int32),
             jnp.arange(groups, dtype=jnp.int32) * 1000], axis=1
        )
        return chained(seeds)

    run(0).block_until_ready()          # compile + warm
    best = float("inf")
    for i in range(REPEATS):
        t0 = time.perf_counter()
        run(i + 1).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    rate = groups * S * CH * STEPS / best
    gs_us = best / (groups * STEPS) * 1e6
    return rate, gs_us


def main():
    s_list = [int(s) for s in
              os.environ.get("PLADDER_S", "8,16").split(",")]
    ch_list = [int(c) for c in
               os.environ.get("PLADDER_CH", "1,2,4").split(",")]
    n_list = [int(n) for n in
              os.environ.get("PLADDER_N", "256,1024,2048").split(",")]
    for S in s_list:
        for CH in ch_list:
            for n in n_list:
                if n < S * CH:
                    continue
                try:
                    rate, gs_us = measure(S, CH, n)
                    print(json.dumps({
                        "S": S, "CH": CH, "n": n,
                        "solves_per_s": round(rate, 1),
                        "group_step_us": round(gs_us, 2),
                        "us_per_solve": round(gs_us / (S * CH), 3),
                    }), flush=True)
                except Exception as e:
                    print(json.dumps({
                        "S": S, "CH": CH, "n": n,
                        "error": f"{type(e).__name__}: {e}"[:200],
                    }), flush=True)


if __name__ == "__main__":
    main()
