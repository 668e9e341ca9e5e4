"""Attribute the particle sweep megakernel's group-step time to
sections by toggling STATIC kernel args (semantics change, timing
attribution only — the pendulum `section_probe.py` pattern):

  full            the bench configuration (demo shapes, S=8)
  mpf0            mpf_steps=0 (no MPF SVGD loop)
  mpf0_np1        + n_params=1 (rollout rows 384 -> 48)
  mpf0_np1_hz8    + hz=8 (rollout/acc loops 40 -> 8 iterations;
                  isolates the per-step fixed sections: Silverman
                  grouped sort + packing, draws, Stein, selection,
                  simulator, logging)

r4: SECTION=1 additionally measures each probe_skip section gate
(pallas_particle_sweep_episode.py) as full-minus-skip[x] marginals —
the full decomposition mandated by VERDICT r3 #5: rng (hardware PRNG
Box-Muller fills), silverman (grouped-bitonic SVMPC bandwidth sort +
rr-major packing), draws (MPF-prior dynamics draws + rollout-row
scatter), occ (ALL occupancy-grid tests: rollout + sim + MPF + term),
rollout (hz-step fori over 4 state tiles), disco (beta + softmax
weight tiles), acc (hz-step delta/glik accumulation), stein (SVMPC
Stein + weighted GMM prior matmuls), forward (posterior weights +
argmax + roll), sim ([8, 1] column physics), mpfglue (pair_tile/
colbcast glue + the MPF loop), term (crash/goal termination), logs
(12-field log-row scatter).

Run on real TPU: timeout 1800 python bench/probes/particle_section_probe.py
         SECTION=1 timeout 3600 python bench/probes/particle_section_probe.py
"""

import json
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(ROOT))

from dust_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from dust_tpu.experiments import build_particle_stack, load_config
from dust_tpu.simulation import megakernel_particle_sweep_fn

STEPS, REPEATS = 200, 3
# N_SC=16 measures the r4 widened layout; 8 (default) the r1-r3 one.
# CHAINS>1 measures the r5 multi-chain body.
N_SC = int(os.environ.get("N_SC", "8"))
CHAINS = int(os.environ.get("CHAINS", "1"))
GROUPS = int(os.environ.get("GROUPS", "8"))


def run(tag, probe_skip=(), **overrides):
    config = load_config(ROOT / "demo/particle_config.yaml")
    config["exp_params"].update(overrides)
    stack = build_particle_stack(config, jax.random.key(0))
    sweep = megakernel_particle_sweep_fn(
        stack, config["exp_params"], steps=STEPS, n_sc=N_SC,
        unroll=True, probe_skip=probe_skip, n_chains=CHAINS,
    )
    masses = jnp.linspace(1.6, 2.4, N_SC)

    @jax.jit
    def run_groups(seeds):
        return jax.lax.scan(
            lambda _, sd: (0, sweep(sd, masses)["cum"]), 0, seeds
        )[1]

    def once(i):
        seeds = jnp.stack(
            [jnp.full((GROUPS,), i, jnp.int32),
             jnp.arange(GROUPS, dtype=jnp.int32) * 1000], axis=1)
        return run_groups(seeds)

    once(0).block_until_ready()
    best = float("inf")
    for r in range(REPEATS):
        t0 = time.perf_counter()
        once(r + 1).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    us = best / (GROUPS * STEPS) * 1e6
    print(json.dumps({"variant": tag, "us_per_group_step": round(us, 2),
                      "solves_per_s": round(GROUPS * N_SC * STEPS / best,
                                            1)
                      }), flush=True)
    return us


def main():
    only = os.environ.get("ONLY")
    if os.environ.get("SECTION", "0") == "1":
        # full-minus-skip[x] marginal per section gate (r4)
        sections = ["rng", "silverman", "draws", "occ", "rollout",
                    "disco", "acc", "stein", "forward", "sim",
                    "mpfglue", "term", "logs"]
        if only:
            sections = [s for s in sections if s in only.split(",")]
        full = run("full")
        marg = {}
        for s in sections:
            t = run(f"skip_{s}", probe_skip=(s,))
            marg[s] = full - t
        print("---- marginals (full - skip[x]) ----")
        total = 0.0
        for s in sections:
            print(f"  {s:10s} {marg[s]:5.1f} us")
            total += marg[s]
        print(f"  {'SUM':10s} {total:5.1f} us of {full:.1f} "
              "(sections overlap with glue; sum < full expected)")
        return
    variants = {
        "full": {},
        "mpf0": dict(mpf_steps=0),
        "mpf0_np1": dict(mpf_steps=0, params_samples=1),
        "mpf0_np1_hz8": dict(mpf_steps=0, params_samples=1, horizon=8),
    }
    for tag, over in variants.items():
        if only and tag != only:
            continue
        run(tag, **over)


if __name__ == "__main__":
    main()
