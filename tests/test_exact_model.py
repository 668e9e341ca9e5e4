"""Exact-model baseline: per-episode true parameters reach the
controller's rollouts as traced values (regression for the stale-constant
trap of mutating a static model between episodes)."""

import jax
import numpy as np

from dust_tpu.experiments import build_pendulum_stack, load_config
from dust_tpu.simulation import PendulumSimulation


def test_exact_model_varies_per_episode():
    cfg = load_config("demo/pendulum_config.yaml")
    cfg["exp_params"].update(horizon=8, action_samples=16)
    stack = build_pendulum_stack(cfg, jax.random.key(0), case="mppi")
    harness = PendulumSimulation(
        controller=stack.controller, model=stack.model, steps=8,
        use_svmpc=False, use_exact_model=True,
    )
    df = harness.run(
        jax.random.key(1),
        [{"length": 0.6, "mass": 0.6}, {"length": 1.3, "mass": 1.3}],
        init_state=stack.init_state,
        init_policies=stack.init_policies,
        dyn_dist=stack.dynamics_prior,
    )
    ep0 = df[df["Iteration"] == 0]["Actions"].to_numpy()
    ep1 = df[df["Iteration"] == 1]["Actions"].to_numpy()
    # planning under different exact dynamics must produce different plans
    # (same PRNG key per episode index would otherwise make them collide
    # only if the override were ignored)
    assert not np.allclose(ep0, ep1)
    assert np.isfinite(df["Cost"].to_numpy()).all()
