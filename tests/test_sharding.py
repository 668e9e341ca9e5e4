"""Sharded scenario sweeps on the virtual 8-device CPU mesh: sharded and
unsharded runs agree exactly on fixed keys (SURVEY.md §7.5 distributed
strategy)."""

import jax
import jax.numpy as jnp
import numpy as np

from dust_tpu.experiments import build_pendulum_stack, load_config
from dust_tpu.parallel import ScenarioSweep, make_mesh
from dust_tpu.parallel.sweep import broadcast_scenarios
from dust_tpu.simulation import PendulumSimulation

PEND_CFG = "demo/pendulum_config.yaml"


def _sweep_inputs(stack, n, steps):
    keys = jax.random.split(jax.random.key(7), n)
    true_params = {
        "length": jnp.linspace(0.7, 1.2, n),
        "mass": jnp.linspace(0.7, 1.2, n)[::-1],
    }
    init_obs = jnp.broadcast_to(stack.init_state.reshape(1, 1, -1),
                                (n, 1, 2))
    dstate = broadcast_scenarios(
        stack.controller.init_state(stack.init_policies), n
    )
    svstate = broadcast_scenarios(
        stack.svmpc.init_state(stack.init_policies, stack.policies_prior), n
    )
    mstate = broadcast_scenarios(
        stack.mpf.init_state(stack.mpf_init, stack.init_state, 1), n
    )
    return keys, true_params, init_obs, dstate, svstate, mstate


def test_sharded_sweep_matches_unsharded():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    cfg = load_config(PEND_CFG)
    cfg["exp_params"].update(
        horizon=8, action_samples=8, params_samples=2,
        mpf_n_particles=8, mpf_steps=2, n_particles=2,
    )
    stack = build_pendulum_stack(cfg, jax.random.key(0), case="dust")
    harness = PendulumSimulation(
        controller=stack.controller, svmpc=stack.svmpc, mpf=stack.mpf,
        model=stack.model, steps=6, warm_up=1,
        mpf_bw=stack.mpf_bw, mpf_steps=2,
    )

    n = 16
    inputs = _sweep_inputs(stack, n, steps=6)

    mesh = make_mesh(axis_names=("scenario",))
    sharded = ScenarioSweep(harness, stack.dynamics_prior, mesh=mesh)
    out_sharded = sharded.run(*inputs)

    unsharded = ScenarioSweep(harness, stack.dynamics_prior, mesh=None)
    out_plain = unsharded.run(*inputs)

    assert out_sharded["costs"].shape == (n, 6)
    assert bool(out_sharded["healthy"].all())
    np.testing.assert_allclose(
        np.asarray(out_sharded["costs"]), np.asarray(out_plain["costs"]),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_sharded["avg_cum_cost"]),
        np.asarray(out_plain["avg_cum_cost"]),
        rtol=1e-5,
    )
    # the scenario axis is actually distributed
    assert len(out_sharded["costs"].sharding.device_set) == 8


def test_scenarios_differ_by_true_params():
    """Different true parameters must produce different trajectories —
    the sweep really varies the simulator per lane."""
    cfg = load_config(PEND_CFG)
    cfg["exp_params"].update(
        horizon=8, action_samples=8, params_samples=2,
        mpf_n_particles=8, mpf_steps=2, n_particles=2,
    )
    stack = build_pendulum_stack(cfg, jax.random.key(0), case="dust")
    harness = PendulumSimulation(
        controller=stack.controller, svmpc=stack.svmpc, mpf=stack.mpf,
        model=stack.model, steps=6, warm_up=1,
        mpf_bw=stack.mpf_bw, mpf_steps=2,
    )
    n = 4
    keys = jnp.broadcast_to(jax.random.key(3), (n,))
    true_params = {
        "length": jnp.array([0.7, 0.9, 1.1, 1.3]),
        "mass": jnp.full((n,), 1.0),
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
    out = ScenarioSweep(harness, stack.dynamics_prior).run(
        keys, true_params, init_obs, dstate, svstate, mstate
    )
    states = np.asarray(out["states"])
    # same key, different lengths -> trajectories diverge
    assert not np.allclose(states[0], states[3])
