"""Particle scenario sweep: vmapped episodes with per-lane true masses,
sharded over the 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from dust_tpu.experiments import build_particle_stack, load_config
from dust_tpu.parallel import make_mesh
from dust_tpu.parallel.sweep import ParticleScenarioSweep, broadcast_scenarios
from dust_tpu.simulation import particle_episode_fn


def test_particle_sweep_runs_sharded():
    cfg = load_config("demo/particle_config.yaml")
    cfg["exp_params"].update(
        horizon=12, action_samples=16, params_samples=2,
        mpf_n_particles=8, mpf_steps=2, n_particles=3,
    )
    stack = build_particle_stack(cfg, jax.random.key(0))
    episode = particle_episode_fn(
        stack.model, stack.controller, svmpc=stack.svmpc, mpf=stack.mpf,
        dyn_dist=stack.dynamics_prior, load=stack.load, steps=15,
        warm_up=2, mpf_bw=stack.mpf_bw, mpf_steps=2,
    )

    n = 8
    mesh = make_mesh(axis_names=("scenario",))
    sweep = ParticleScenarioSweep(episode, mesh=mesh)

    keys = jax.random.split(jax.random.key(1), n)
    state0 = jnp.broadcast_to(stack.init_state, (n, 4))
    dstate = broadcast_scenarios(stack.controller.init_state(), n)
    svstate = broadcast_scenarios(
        stack.svmpc.init_state(stack.init_policies, stack.policies_prior), n
    )
    mstate = broadcast_scenarios(
        stack.mpf.init_state(stack.mpf_init, stack.init_state, 2,
                             bw=stack.mpf_init_bw), n
    )
    masses = jnp.linspace(1.5, 3.0, n)

    out = sweep.run(keys, state0, dstate, svstate, mstate, masses)
    assert out["final_state"].shape == (n, 4)
    finite = np.isfinite(np.asarray(out["cum_cost"]))
    crashed = np.asarray(out["crashed"])
    # crashed lanes report inf, healthy lanes finite
    assert (finite == ~crashed).all()
    assert len(out["cum_cost"].sharding.device_set) == 8
    # different masses -> different trajectories
    fs = np.asarray(out["final_state"])
    assert not np.allclose(fs[0], fs[-1])
