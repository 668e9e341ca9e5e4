"""End-to-end CH x S x n ladder for the pendulum sweep megakernel.

VERDICT r4 #1a: the multi-chain lever (n_chains independent
episode-chains per Pallas program, `ops/pallas_sweep_episode.py`)
shipped as the bench default (CH=4) without a recorded ladder. This
probe measures the full frontier with the bench.py methodology (scan
over groups inside ONE dispatch, best-of repeats):

    for S in {8, 16} x CH in {1, 2, 4, 8} x n in {256, 1024, 4096}:
        solves/s at demo shapes, steps=200

The scheduling premise is `dualchain_probe.py` (independent serial
chains overlap at ~1.0x on this hardware, incl. block-64 interleave
granularity); this ladder locates the end-to-end knee where VMEM
pressure / instruction-cache growth eats the overlap win.

Run on real TPU: timeout 3600 python bench/probes/chain_ladder_probe.py
Env: LADDER_S="8,16" LADDER_CH="1,2,4,8" LADDER_N="256,1024,4096"
     LADDER_STEPS=200 LADDER_REPEATS=3
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

from dust_tpu.experiments import build_pendulum_stack, load_config
from dust_tpu.simulation import megakernel_pendulum_sweep_fn

STEPS = int(os.environ.get("LADDER_STEPS", "200"))
REPEATS = int(os.environ.get("LADDER_REPEATS", "3"))

config = load_config("demo/pendulum_config.yaml")
stack = build_pendulum_stack(config, jax.random.key(0), case="dust")


def measure(S, CH, n):
    groups = max(1, n // (S * CH))
    sweep = megakernel_pendulum_sweep_fn(
        stack, config["exp_params"], steps=STEPS, n_sc=S, warm_up=0,
        unroll=True, n_chains=CH,
    )
    lens = jnp.linspace(0.8, 1.2, S)
    mass = jnp.linspace(0.9, 1.1, S)

    @jax.jit
    def chained(seeds):
        def body(_, s):
            return 0, sweep(s, lens, mass)["cost"]

        _, costs = jax.lax.scan(body, 0, seeds)
        return costs

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
    # device time per multi-chain group-step (S*CH solves advance)
    gs_us = best / (groups * STEPS) * 1e6
    return rate, gs_us


def main():
    s_list = [int(s) for s in
              os.environ.get("LADDER_S", "8,16").split(",")]
    ch_list = [int(c) for c in
               os.environ.get("LADDER_CH", "1,2,4,8").split(",")]
    n_list = [int(n) for n in
              os.environ.get("LADDER_N", "256,1024,4096").split(",")]
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
                except Exception as e:   # VMEM / lowering ceilings
                    print(json.dumps({
                        "S": S, "CH": CH, "n": n,
                        "error": f"{type(e).__name__}: {e}"[:200],
                    }), flush=True)


if __name__ == "__main__":
    main()
