"""Closed-loop harness tests: episode runners produce finite,
reference-schema results; checkpoints round-trip."""

import jax
import jax.numpy as jnp
import numpy as np

from dust_tpu.experiments import (
    build_particle_stack,
    build_pendulum_stack,
    load_config,
)
from dust_tpu.simulation import PendulumSimulation, run_particle_episode
from dust_tpu.utils.helper import load_checkpoint, save_checkpoint

PEND_CFG = "demo/pendulum_config.yaml"
PART_CFG = "demo/particle_config.yaml"

REFERENCE_COLUMNS = [
    "Cost", "Position", "Speed", "Actions", "Timestep", "Iteration",
    "DynParticles", "DynBandwidths", "PolParticles", "Weights",
    "ExpParams", "AvgCumCost",
]


def _small(cfg, **over):
    cfg = load_config(cfg)
    cfg["exp_params"].update(over)
    return cfg


def test_pendulum_dust_harness_runs():
    cfg = _small(PEND_CFG, horizon=10, action_samples=16, params_samples=2,
                 mpf_n_particles=10, mpf_steps=2)
    stack = build_pendulum_stack(cfg, jax.random.key(0), case="dust")
    harness = PendulumSimulation(
        controller=stack.controller, svmpc=stack.svmpc, mpf=stack.mpf,
        model=stack.model, steps=12, warm_up=2,
        mpf_bw=stack.mpf_bw, mpf_steps=2,
    )
    df = harness.run(
        jax.random.key(1),
        [{"length": 1.0, "mass": 1.0}, {"length": 0.8, "mass": 1.2}],
        init_state=stack.init_state,
        init_policies=stack.init_policies,
        policies_prior=stack.policies_prior,
        dyn_dist=stack.dynamics_prior,
        mpf_init=stack.mpf_init,
    )
    assert list(df.columns) == REFERENCE_COLUMNS + ["Case"][:0] or all(
        c in df.columns for c in REFERENCE_COLUMNS
    )
    assert len(df) == 24  # 2 episodes x 12 steps
    assert np.isfinite(df["Cost"].to_numpy()).all()
    assert np.isfinite(df["Position"].to_numpy()).all()
    # warm-up steps emit zero actions
    ep0 = df[df["Iteration"] == 0]
    np.testing.assert_array_equal(ep0["Actions"].to_numpy()[:2], 0.0)


def test_pendulum_disco_harness_runs():
    cfg = _small(PEND_CFG, horizon=10, action_samples=16)
    stack = build_pendulum_stack(cfg, jax.random.key(0), case="mppi")
    harness = PendulumSimulation(
        controller=stack.controller, model=stack.model, steps=10,
        use_svmpc=False,
    )
    df = harness.run(
        jax.random.key(1),
        [{"length": 1.0, "mass": 1.0}],
        init_state=stack.init_state,
        init_policies=stack.init_policies,
        dyn_dist=stack.dynamics_prior,
    )
    assert len(df) == 10
    assert np.isfinite(df["Cost"].to_numpy()).all()


def test_particle_episode_runs_and_moves_toward_goal():
    cfg = load_config(PART_CFG)
    cfg["exp_params"].update(
        horizon=15, action_samples=16, params_samples=2,
        mpf_n_particles=10, mpf_steps=3,
    )
    stack = build_particle_stack(cfg, jax.random.key(3))
    svstate = stack.svmpc.init_state(stack.init_policies,
                                     stack.policies_prior)
    mstate = stack.mpf.init_state(
        stack.mpf_init, stack.init_state, 2, bw=stack.mpf_init_bw
    )
    result = run_particle_episode(
        jax.random.key(4),
        model=stack.model,
        controller=stack.controller,
        svmpc=stack.svmpc, svstate=svstate,
        mpf=stack.mpf, mstate=mstate,
        dyn_dist=stack.dynamics_prior,
        init_state=stack.init_state,
        load=stack.load, steps=40, warm_up=3,
        mpf_bw=stack.mpf_bw, mpf_steps=3,
    )
    assert result["steps"] <= 40
    assert np.isfinite(result["trajectory"]).all()
    start = np.asarray(stack.init_state[:2])
    target = np.asarray(stack.model.target[:2])
    d0 = np.linalg.norm(target - start)
    d1 = np.linalg.norm(target - result["final_state"][:2])
    assert d1 < d0  # moved toward the goal


def test_checkpoint_roundtrip(tmp_path):
    cfg = _small(PEND_CFG, horizon=8, action_samples=8)
    stack = build_pendulum_stack(cfg, jax.random.key(0), case="svmpc")
    svstate = stack.svmpc.init_state(stack.init_policies,
                                     stack.policies_prior)
    dstate = stack.controller.init_state(stack.init_policies)
    carry = (jax.random.key(5), jnp.zeros((1, 2)), dstate, svstate)
    path = save_checkpoint(tmp_path / "ck.pkl", carry, step=17,
                           extra={"case": "svmpc"})
    carry2, step, extra = load_checkpoint(path)
    assert step == 17 and extra == {"case": "svmpc"}
    for a, b in zip(jax.tree_util.tree_leaves(carry),
                    jax.tree_util.tree_leaves(carry2)):
        if jnp.issubdtype(a.dtype, jax.dtypes.prng_key):
            a, b = jax.random.key_data(a), jax.random.key_data(b)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
