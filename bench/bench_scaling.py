"""Scenario-sweep scaling measurement.

Measures sweep throughput (episodes/s) while the scenario axis spans
1, 2, 4, ... devices of whatever platform is available — the scaling-
efficiency artifact for the >=80%-at-2+-hosts target. On this round's
single-TPU-chip environment it degenerates to the 8-device virtual CPU
mesh (mechanism validation, not a hardware number: virtual devices share
host cores); on a real slice the same script reports per-axis efficiency
directly.

Design note (SURVEY.md §7.4.7): each scenario's solve lives entirely on
one chip; cross-device traffic is scenario scatter/gather only, so
scaling efficiency is expected to be near-linear over ICI and DCN.

Run: python bench/bench_scaling.py [--steps N] [--per-device N]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from dust_tpu.experiments import build_pendulum_stack, load_config
from dust_tpu.parallel import ScenarioSweep, make_mesh
from dust_tpu.parallel.sweep import broadcast_scenarios
from dust_tpu.simulation import PendulumSimulation

ROOT = Path(__file__).resolve().parent.parent


def run_sweep(n_devices, per_device, steps, repeats=2):
    config = load_config(ROOT / "demo/pendulum_config.yaml")
    config["exp_params"].update(
        horizon=16, action_samples=32, params_samples=4,
        mpf_n_particles=16, mpf_steps=5, n_particles=3,
    )
    stack = build_pendulum_stack(config, jax.random.key(0), case="dust")
    harness = PendulumSimulation(
        controller=stack.controller, svmpc=stack.svmpc, mpf=stack.mpf,
        model=stack.model, steps=steps, warm_up=0,
        mpf_bw=stack.mpf_bw, mpf_steps=5,
    )
    mesh = make_mesh(n_devices=n_devices, axis_names=("scenario",))
    sweep = ScenarioSweep(harness, stack.dynamics_prior, mesh=mesh)

    n = n_devices * per_device
    true_params = {
        "length": jnp.linspace(0.7, 1.2, n),
        "mass": jnp.linspace(1.2, 0.7, n),
    }
    init_obs = jnp.broadcast_to(stack.init_state.reshape(1, 1, -1), (n, 1, 2))
    dstate = broadcast_scenarios(
        stack.controller.init_state(stack.init_policies), n
    )
    svstate = broadcast_scenarios(
        stack.svmpc.init_state(stack.init_policies, stack.policies_prior), n
    )
    mstate = broadcast_scenarios(
        stack.mpf.init_state(stack.mpf_init, stack.init_state, 1), n
    )

    def run(i):
        keys = jax.random.split(jax.random.key(i), n)
        return sweep.run(keys, true_params, init_obs, dstate, svstate,
                         mstate)["avg_cum_cost"]

    out = run(0)
    jax.block_until_ready(out)
    best = 1e9
    for i in range(repeats):
        t0 = time.perf_counter()
        out = run(i + 1)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return n / best  # episodes/s


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--per-device", type=int, default=4)
    args = parser.parse_args()

    total = len(jax.devices())
    sizes = [d for d in (1, 2, 4, 8, 16, 32) if d <= total]
    base = None
    for nd in sizes:
        eps = run_sweep(nd, args.per_device, args.steps)
        if base is None:
            base = eps
        print(json.dumps({
            "devices": nd,
            "episodes_per_s": round(eps, 3),
            "scaling_efficiency": round(eps / (base * nd), 3),
            "platform": jax.default_backend(),
        }))


if __name__ == "__main__":
    main()
