"""Pendulum swing-up experiment: the DuSt paper's 4-case comparison.

TPU-native counterpart of the reference `demo/pendulum_example.py:31-263`:
DuSt-MPC (dual inference), SVMPC (mean params), MPPI baseline (exact
model), and DISCO+UTF, all on the same sampled set of true parameters.

Usage:
    python demo/pendulum_example.py [--steps N] [--episodes N]
        [--cases dust,svmpc,mppi,disco_utf] [--seed N] [--save]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import pandas as pd

from dust_tpu.experiments import build_pendulum_stack, load_config
from dust_tpu.simulation import PendulumSimulation
from dust_tpu.utils.helper import save_progress
from dust_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

CASES = {
    "dust": "DuSt-MPC",
    "svmpc": "SVMPC",
    "mppi": "MPPI Baseline",
    "disco_utf": "DISCO",
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default=None)
    parser.add_argument("--steps", type=int, default=None)
    parser.add_argument("--episodes", type=int, default=None)
    parser.add_argument("--cases", default="dust,svmpc,mppi,disco_utf")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--save", action="store_true")
    args = parser.parse_args()

    config_path = args.config or Path(__file__).parent / "pendulum_config.yaml"
    config_data = load_config(config_path)
    sim = config_data["sim_params"]
    steps = args.steps or sim["steps"]
    episodes = args.episodes or sim["episodes"]

    key = jax.random.key(args.seed)
    key, k_params = jax.random.split(key)

    # One true-parameter set shared by all cases
    # (`pendulum_example.py:149-152`)
    from dust_tpu.distributions import Uniform
    import jax.numpy as jnp

    dyn_prior = Uniform(
        jnp.array([0.6, 0.6]), jnp.array([1.3, 1.3]), event_ndims=1
    )
    draws = dyn_prior.sample(k_params, (episodes,))
    parameters_set = [
        {"length": float(d[0]), "mass": float(d[1])} for d in draws
    ]
    print("true parameter sets:", parameters_set)

    result_df = pd.DataFrame([])
    for case in args.cases.split(","):
        label = CASES[case]
        print(f"\nRunning {label} simulation:")
        key, k_build, k_run = jax.random.split(key, 3)
        stack = build_pendulum_stack(config_data, k_build, case=case)
        experiment_params = parameters_set
        harness = PendulumSimulation(
            controller=stack.controller,
            svmpc=stack.svmpc,
            mpf=stack.mpf,
            model=stack.model,
            steps=steps,
            warm_up=sim["warm_up"],
            use_svmpc=stack.svmpc is not None,
            mpf_bw=stack.mpf_bw,
            mpf_steps=stack.mpf_steps,
            # MPPI baseline plans with the exact per-episode model
            # (`pendulum_example.py:217-236` use_exact_model=True)
            use_exact_model=(case == "mppi"),
        )
        df = harness.run(
            k_run,
            experiment_params,
            init_state=stack.init_state,
            init_policies=stack.init_policies,
            policies_prior=stack.policies_prior,
            dyn_dist=stack.dynamics_prior,
            mpf_init=stack.mpf_init,
            verbose=True,
        )
        df["Case"] = label
        result_df = pd.concat((result_df, df), axis=0)
        tail = df.groupby("Iteration")["Cost"].apply(
            lambda s: s.tail(max(steps // 10, 1)).mean()
        )
        print(f"{label}: mean terminal cost per episode:\n{tail}")

    print("\nSummary (mean AvgCumCost at final step):")
    print(
        result_df[result_df["Timestep"] == steps - 1]
        .groupby("Case")["AvgCumCost"]
        .mean()
    )
    if args.save:
        path = save_progress(
            data=result_df.reset_index().to_dict(), params=config_data
        )
        print(f"saved to {path}")


if __name__ == "__main__":
    main()
