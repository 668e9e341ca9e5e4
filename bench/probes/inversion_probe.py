"""Probe the SVMPC-only vs dual sweep-megakernel inversion (VERDICT r1).

BASELINE.md r1 recorded the SVMPC-only sweep (config #1, no MPF,
n_params=1) at 231k solves/s vs 312.8k for the FULL dual loop — config
#1 does strictly less work per solve, so either the svmpc_only kernel
path is unoptimized or the r1 numbers were taken under different tunnel
load. This probe times, in ONE process back-to-back (same tunnel
conditions):

  dual          — the headline: n_params=8, mpf_steps=20, m_mpf=50
  svmpc_only    — the degenerate path: n_params=1, mpf_steps=0, m_mpf=1
  dual_np1      — dual config but n_params=1 (isolates the rollout-row
                  count effect: 24 rollout rows/group vs 192)
  dual_mpf0     — dual config but mpf_steps=0 (isolates the MPF loop)

Run on the real TPU: `timeout 900 python bench/probes/inversion_probe.py`
(env N=256 STEPS=200 REPEATS=3 to override).
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

from dust_tpu.experiments import build_pendulum_stack, load_config
from dust_tpu.simulation import megakernel_pendulum_sweep_fn


def time_best(run, repeats):
    run(0)  # compile + warm
    best = float("inf")
    for i in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(run(i + 1))
        best = min(best, time.perf_counter() - t0)
    return best


def bench(n, steps, repeats, case, mpf_over=None):
    S = min(8, n)
    groups = max(1, n // S)
    config = load_config(ROOT / "demo/pendulum_config.yaml")
    exp = config["exp_params"]
    if mpf_over:
        exp = dict(exp, **mpf_over)
        config = dict(config, exp_params=exp)
    stack = build_pendulum_stack(
        config, jax.random.key(0),
        case="svmpc" if case == "svmpc_only" else "dust",
    )
    # unroll=True matches the bench.py headline conditions. The rolled
    # body (unroll=False) currently fails TPU compilation with a Mosaic
    # relayout error on the [rows, 128] fori_loop carry
    # ("Invalid relayout: ... replicated in destination but not in
    # source for 'vector<192x128xf32>'"); the headline never uses it.
    sweep = megakernel_pendulum_sweep_fn(
        stack, exp, steps=steps, n_sc=S,
        unroll=os.environ.get("UNROLL", "1") == "1",
        svmpc_only=(case == "svmpc_only"),
    )
    lens = jnp.linspace(0.8, 1.2, S)
    mass = jnp.linspace(0.9, 1.1, S)

    @jax.jit
    def run_groups(seeds):
        def body(_, s):
            return 0, sweep(s, lens, mass)["cost"]

        _, costs = jax.lax.scan(body, 0, seeds)
        return costs

    def run(i):
        seeds = jnp.stack(
            [jnp.full((groups,), i, jnp.int32),
             jnp.arange(groups, dtype=jnp.int32) * 1000], axis=1
        )
        return run_groups(seeds)

    best = time_best(run, repeats)
    return n * steps / best


def main():
    n = int(os.environ.get("N", 256))
    steps = int(os.environ.get("STEPS", 200))
    repeats = int(os.environ.get("REPEATS", 3))
    dev = str(jax.devices()[0])
    variants = {
        "dual": ("dual", None),
        "svmpc_only": ("svmpc_only", None),
        "dual_np1": ("dual", {"params_samples": 1}),
        "dual_mpf0": ("dual", {"mpf_steps": 0}),
    }
    only = os.environ.get("ONLY")
    for name, (case, over) in variants.items():
        if only and name != only:
            continue
        solves = bench(n, steps, repeats, case, over)
        print(json.dumps({"variant": name, "n": n, "steps": steps,
                          "solves_per_s": round(solves, 1),
                          "device": dev}), flush=True)


if __name__ == "__main__":
    main()
