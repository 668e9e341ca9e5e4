"""Pendulum hyperparameter tuning.

TPU-native counterpart of the reference `demo/pendulum_tuning.py` (Optuna,
200 sequential trials over lr / alpha / prior sigma / horizon minimizing
mean episode cost): the same search space through `random_search`, plus a
`--parallel-lr` mode that evaluates a whole learning-rate grid as one
vmapped (mesh-shardable) device program.

Usage:
    python demo/pendulum_tuning.py [--trials N] [--steps N]
    python demo/pendulum_tuning.py --parallel-lr 16
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dust_tpu.experiments import build_pendulum_stack, load_config
from dust_tpu.simulation import PendulumSimulation
from dust_tpu.tuning import (
    parallel_lr_sweep,
    pendulum_asha_objective,
    pendulum_sweep_tail_objective,
    random_search,
    successive_halving,
)
from dust_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

SPACE = {
    "learning_rate": (0.1, 10.0, "log"),
    "alpha": (0.25, 4.0, "log"),
    "prior_sigma": (0.5, 5.0),
    "horizon": [20, 30, 40],
}

# the ASHA space samples the compile-static params (alpha, horizon)
# from grids so each rung batches trials sharing them into one wide
# vmapped program (see `pendulum_asha_objective`)
ASHA_SPACE = {
    "learning_rate": (0.1, 10.0, "log"),
    "alpha": [0.25, 0.5, 1.0, 2.0, 4.0],
    "prior_sigma": (0.5, 5.0),
    "horizon": [20, 30, 40],
}

# --tail space: every key is a traced SMEM scalar of the sweep
# megakernel (zero recompiles across trials); brackets the demo
# config (lr=2, alpha=1, ctrl_sigma=2, prior_sigma=2), whose defect
# is intermittent upright-hold loss on the torque-limited corners
TAIL_SPACE = {
    "learning_rate": (0.5, 15.0, "log"),
    "alpha": (0.5, 2.0, "log"),
    "ctrl_sigma": (1.0, 4.0),
    "prior_sigma": (1.0, 4.0),
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--trials", type=int, default=20)
    parser.add_argument("--steps", type=int, default=100)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--parallel-lr", type=int, default=0,
                        help="evaluate N learning rates in one program")
    parser.add_argument("--asha", type=int, default=0,
                        help="batched successive halving over N configs")
    parser.add_argument("--max-budget", type=int, default=0,
                        help="ASHA full-episode budget (default --steps)")
    parser.add_argument("--tail", type=int, default=0,
                        help="ASHA over N configs minimizing the "
                             "WORST-corner tail cost of the 8-scenario "
                             "robustness sweep (VERDICT r3 #7)")
    parser.add_argument("--seeds", type=int, default=2,
                        help="--tail: sweep seeds averaged per trial")
    args = parser.parse_args()

    config_path = Path(__file__).parent / "pendulum_config.yaml"
    base_config = load_config(config_path)
    true_params = {"length": 1.0, "mass": 1.0}

    if args.tail:
        # the sweep_example robustness grid; every sampled key is a
        # traced SMEM scalar -> one Mosaic compile per budget
        max_budget = args.max_budget or max(args.steps, 200)
        lens = jnp.linspace(0.7, 1.25, 8)
        mass = jnp.linspace(1.25, 0.7, 8)
        objective = pendulum_sweep_tail_objective(
            base_config, lens, mass, seed=args.seed, verbose=True,
            n_seeds=args.seeds,
        )
        best, value, history, episode_eq = successive_halving(
            objective, TAIL_SPACE, args.tail, eta=3,
            min_budget=max(25, max_budget // 9),
            max_budget=max_budget, seed=args.seed, verbose=True,
        )
        print(f"\nbest: {best} -> worst-corner tail {value:.4f} "
              f"({episode_eq:.1f} sweep-equivalents for {args.tail} "
              "configs)")
        return

    if args.asha:
        max_budget = args.max_budget or args.steps
        objective = pendulum_asha_objective(
            base_config, true_params, seed=args.seed
        )
        best, value, history, episode_eq = successive_halving(
            objective, ASHA_SPACE, args.asha, eta=3,
            min_budget=max(1, max_budget // 9), max_budget=max_budget,
            seed=args.seed, verbose=True,
        )
        print(f"\nbest: {best} -> {value:.3f} "
              f"({episode_eq:.1f} episode-equivalents for {args.asha} "
              f"configs; the reference's Optuna study spends 200)")
        return

    if args.parallel_lr:
        # one compiled program, N lanes, each with its own lr
        config = load_config(config_path)
        stack = build_pendulum_stack(
            config, jax.random.key(args.seed), case="svmpc"
        )
        # rebuild SVMPC with an injectable learning rate
        stack.svmpc.optimizer = optax.inject_hyperparams(optax.sgd)(
            learning_rate=1.0
        )
        harness = PendulumSimulation(
            controller=stack.controller, svmpc=stack.svmpc,
            model=stack.model, steps=args.steps, warm_up=0,
        )
        lrs = jnp.logspace(-1, 1, args.parallel_lr)
        costs = parallel_lr_sweep(
            harness, stack, lrs, jax.random.key(args.seed + 1), true_params
        )
        for lr, c in zip(np.asarray(lrs), np.asarray(costs)):
            print(f"lr={lr:8.3f}  avg_cum_cost={c:10.2f}")
        best = int(np.nanargmin(np.asarray(costs)))
        print(f"best lr: {float(lrs[best]):.3f} "
              f"(cost {float(costs[best]):.2f})")
        return

    def objective(trial):
        config = load_config(config_path)
        config["exp_params"].update(
            learning_rate=trial["learning_rate"],
            alpha=trial["alpha"],
            prior_sigma=trial["prior_sigma"],
            horizon=trial["horizon"],
        )
        stack = build_pendulum_stack(
            config, jax.random.key(args.seed), case="svmpc"
        )
        harness = PendulumSimulation(
            controller=stack.controller, svmpc=stack.svmpc,
            model=stack.model, steps=args.steps, warm_up=0,
        )
        df = harness.run(
            jax.random.key(args.seed + 1), [true_params],
            init_state=stack.init_state,
            init_policies=stack.init_policies,
            policies_prior=stack.policies_prior,
            dyn_dist=stack.dynamics_prior,
        )
        return float(df["Cost"].mean())

    best, value, history = random_search(
        objective, SPACE, args.trials, seed=args.seed, verbose=True
    )
    print(f"\nbest: {best} -> {value:.3f}")


if __name__ == "__main__":
    main()
