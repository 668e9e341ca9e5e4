"""Attribute the sweep megakernel's group-step time to sections by
toggling STATIC kernel args (semantics change, timing attribution only):

  full                 the bench.py headline configuration
  mpf0                 mpf_steps=0 (no MPF SVGD loop)
  mpf0_fbw             + mpf_fixed_bw (no per-scenario MPF Silverman)
  mpf0_fbw_np1         + n_params=1 (rollout rows 192 -> 24: the
                       row-scaled rollout/cost/draw-scatter cost)

r4: SECTION=1 additionally measures each probe_skip section gate
(pallas_sweep_episode.py) as full-minus-skip[x] marginals — the
decomposition of the r3 "rest" bucket (VERDICT r3 #1): rng (hardware
PRNG Box-Muller fills), silverman (SVMPC bandwidth sort), draws
(dynamics-parameter draws + rollout-row scatter), rollout (hz-step
fori), disco (softmax weight tiles), acc (hz-step delta/glik
accumulation), stein (SVMPC Stein + GMM prior matmuls), forward
(selection gram + argmax + roll), sim ([8,1] physics), mpfglue
(MPF stack/colbcast glue around the loop), logs (log-row scatters).

Dispatch overhead is amortized exactly like phase_probe: one jitted
scan over GROUPS whole-episode programs per dispatch.

Run on real TPU: python bench/probes/section_probe.py
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))

from dust_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

from dust_tpu.ops.pallas_sweep_episode import fused_pendulum_sweep_episode

HZ, M, NA, MM = 30, 3, 128, 50
# N_SC=16 measures the production (r4 widened) layout; N_SC=8 the
# r1-r3 one. CHAINS>1 measures the r4/r5 multi-chain body (n_chains
# independent episode-chains per program — marginals then say what the
# chain interleaving does and does not hide). GROUPS scales down so
# the episode batch stays 256.
N_SC = int(os.environ.get("N_SC", "8"))
CHAINS = int(os.environ.get("CHAINS", "1"))
STEPS = 200
GROUPS = int(os.environ.get("GROUPS", str(max(1, 256 // (N_SC * CHAINS)))))


def run(tag, n_params=8, m_mpf=MM, mpf_steps=20, mpf_fixed_bw=None,
        probe_skip=()):
    key = jax.random.key(0)
    theta0 = jax.random.normal(key, (M, HZ)) * 0.3
    mpfx0 = jnp.ones((m_mpf, 2))
    lens = jnp.linspace(0.8, 1.2, N_SC)
    mass = jnp.linspace(0.9, 1.1, N_SC)

    def ep(seed):
        return fused_pendulum_sweep_episode(
            seed, jnp.array([np.pi, 0.0]), theta0, theta0,
            jnp.zeros((M, HZ)), mpfx0, 0.05, lens, mass,
            2.0, 2.0, 1.0, 1.0, 2.0, 1e-3, 0.1,
            n_sc=N_SC, steps=STEPS, hz=HZ, m=M, n_params=n_params,
            n_act=NA, m_mpf=m_mpf, mpf_steps=mpf_steps,
            mpf_fixed_bw=mpf_fixed_bw,
            unroll=os.environ.get("UNROLL", "1") == "1",
            probe_skip=probe_skip, n_chains=CHAINS,
        )["cost"]

    @jax.jit
    def sweep(seeds):
        return jax.lax.scan(lambda _, s: (0, ep(s)), 0, seeds)[1]

    def once(i):
        seeds = jnp.stack(
            [jnp.full((GROUPS,), i, jnp.int32),
             jnp.arange(GROUPS, dtype=jnp.int32) * 1000], axis=1)
        return sweep(seeds)

    once(0).block_until_ready()
    ts = []
    for r in range(3):
        t0 = time.perf_counter()
        once(r + 1).block_until_ready()
        ts.append(time.perf_counter() - t0)
    us = min(ts) / (STEPS * GROUPS) * 1e6
    per_solve = us / (N_SC * CHAINS)
    print(f"{tag}: {us:.1f} us/group-step ({per_solve:.2f} us/solve)")
    return us


full = run("full")
if os.environ.get("SECTION", "0") == "1":
    # full-minus-skip[x] marginal per section gate (r4)
    sections = ["rng", "silverman", "draws", "rollout", "disco", "acc",
                "stein", "forward", "sim", "mpfglue", "logs"]
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
else:
    m0 = run("mpf0", mpf_steps=0)
    fbw = run("mpf0_fbw", mpf_steps=0, mpf_fixed_bw=0.1)
    np1 = run("mpf0_fbw_np1", mpf_steps=0, mpf_fixed_bw=0.1,
              n_params=1)
    print(f"MPF loop: {full - m0:.1f} us, "
          f"MPF silverman: {m0 - fbw:.1f} us, "
          f"7/8 of rollout rows: {fbw - np1:.1f} us, rest: {np1:.1f} us")
