"""Particle-navigation hyperparameter tuning.

TPU-native counterpart of the reference `demo/particle_tuning.py` (Optuna,
500 sequential trials over lr / alpha / prior sigma / weighted-prior /
ctrl sigma / horizon; failed episodes score inf): the same space through
`dust_tpu.tuning.random_search`, each trial one closed-loop episode.

Usage: python demo/particle_tuning.py [--trials N] [--steps N]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

from dust_tpu.experiments import build_particle_stack, load_config
from dust_tpu.simulation import run_particle_episode
from dust_tpu.tuning import random_search

SPACE = {
    "learning_rate": (1.0, 300.0, "log"),
    "alpha": (0.25, 4.0, "log"),
    "prior_sigma": (1.0, 10.0),
    "weighted_prior": [True, False],
    "ctrl_sigma": (1.0, 10.0),
    "horizon": [30, 40, 50],
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--trials", type=int, default=10)
    parser.add_argument("--steps", type=int, default=100)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    config_path = Path(__file__).parent / "particle_config.yaml"

    def objective(trial):
        config = load_config(config_path)
        config["exp_params"].update(trial)
        stack = build_particle_stack(config, jax.random.key(args.seed))
        svstate = stack.svmpc.init_state(
            stack.init_policies, stack.policies_prior
        )
        mstate = (
            stack.mpf.init_state(
                stack.mpf_init, stack.init_state, stack.controller.dim_a,
                bw=stack.mpf_init_bw,
            )
            if stack.mpf is not None else None
        )
        result = run_particle_episode(
            jax.random.key(args.seed + 1),
            model=stack.model,
            controller=stack.controller,
            svmpc=stack.svmpc, svstate=svstate,
            mpf=stack.mpf, mstate=mstate,
            dyn_dist=stack.dynamics_prior,
            init_state=stack.init_state,
            load=stack.load,
            steps=args.steps,
            warm_up=config["sim_params"]["warm_up"],
            mpf_bw=stack.mpf_bw, mpf_steps=stack.mpf_steps,
            use_svmpc=stack.use_svmpc,
        )
        return result["cum_cost"]  # inf on crash, like the reference guard

    best, value, _ = random_search(
        objective, SPACE, args.trials, seed=args.seed, verbose=True
    )
    print(f"\nbest: {best} -> {value:.3f}")


if __name__ == "__main__":
    main()
