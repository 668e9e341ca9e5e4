"""Fused particle rollout+cost kernel == the scan rollout + cost fns
(interpreter mode on CPU), including in-kernel rectangle collisions,
crash-freeze dynamics, and the full MultiDisco.forward fused path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dust_tpu.experiments import build_particle_stack, load_config
from dust_tpu.models import Particle
from dust_tpu.ops.pallas_particle_rollout import (
    fused_particle_rollout_costs,
    make_fused_particle_state_costs,
)

_ENV = dict(
    dt=0.015,
    control_type="acceleration",
    can_crash=True,
    with_obstacle=True,
    deterministic=True,
    obst_preset="grid_4x4",
    obst_width=2.1,
    max_speed=5.0,
    max_accel=10.0,
    map_cell_size=0.1,
    map_size=[22, 22],
    map_type="direct",
    target_state=[9.0, 9.0, 0, 0],
    cost_params=dict(w_qpos=0.5, w_qvel=0.25, w_ctrl=0.2, w_obs=1.0e6,
                     w_qpos_T=1.0e3, w_qvel_T=0.1),
)


def _model(**over):
    env = dict(_ENV)
    env.update(over)
    return Particle(uncertain_params=["mass"], mass=2.0, **env)


def _scan_reference(model, s0, actions, masses):
    """Evolve every (param, traj) pair with model.step + the built-in
    cost fns, mirroring MultiDisco.rollout + compute_cost's state part."""
    n_params = masses.shape[0]
    n_act, n_pol, hz, _ = actions.shape
    params = {"mass": masses.reshape(n_params, 1, 1, 1)}
    states = jnp.broadcast_to(s0, (n_params, n_act, n_pol, 4))
    cost = jnp.zeros((n_params, n_act, n_pol))
    for t in range(hz):
        cost = cost + model.default_inst_cost(states, actions[:, :, t, :])
        states = model.step(states, actions[:, :, t, :], params)
    return cost + model.default_term_cost(states)


def _kernel_costs(model, s0, actions, masses):
    hook_cfg = make_fused_particle_state_costs(model, interpret=True)
    del hook_cfg  # config validation; call the kernel directly below
    om = model.obst_map
    rects, grid = None, None
    if om is not None:
        xlo, xhi, ylo, yhi = (np.asarray(b) for b in om.rect_bounds)
        rects = tuple(
            (float(a), float(b), float(c), float(d))
            for a, b, c, d in zip(xlo, xhi, ylo, yhi)
        )
        grid = (1.0 / om.cell_size, float(om.c_offset[0]),
                float(om.c_offset[1]), float(om.map.shape[0] - 1),
                float(om.map.shape[1] - 1))
    w = tuple(float(v) for v in np.asarray(model.w_state))
    wc = tuple(float(v) for v in np.asarray(model.w_ctrl))
    wt = tuple(float(v) for v in np.asarray(model.w_term))
    return fused_particle_rollout_costs(
        s0, actions, masses, dt=float(model.dt), max_acc=model.max_acc,
        max_speed=model.max_speed,
        weights=(*w, *wc, float(model.w_obs), *wt),
        target=tuple(float(v) for v in np.asarray(model.target)),
        rects=rects, grid=grid,
        crash=model.can_crash and model.with_obstacle, interpret=True,
    )


@pytest.mark.parametrize("start", [(-9.0, -9.0), (0.0, 0.0)])
def test_kernel_matches_scan_rollout(start):
    """Cost parity over trajectories that cross obstacle cells; the
    (0, 0) start sits inside the central obstacle block (crash-frozen
    from step 0). Non-multiple-of-8 trajectory counts exercise padding."""
    model = _model()
    k1, k2 = jax.random.split(jax.random.key(1))
    n_act, n_pol, hz = 7, 3, 11
    actions = 12.0 * jax.random.normal(k1, (n_act, n_pol, hz, 2))
    masses = jax.random.uniform(k2, (4,), minval=1.5, maxval=3.0)
    s0 = jnp.array([*start, 0.8, 1.2], jnp.float32)

    fused = _kernel_costs(model, s0, actions, masses)
    ref = _scan_reference(model, s0, actions, masses)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(ref), rtol=2e-5, atol=2e-3
    )


def test_kernel_matches_scan_rollout_no_obstacles():
    model = _model(with_obstacle=False, can_crash=False)
    k1, k2 = jax.random.split(jax.random.key(2))
    actions = 12.0 * jax.random.normal(k1, (5, 2, 9, 2))
    masses = jax.random.uniform(k2, (3,), minval=1.5, maxval=3.0)
    s0 = jnp.array([-9.0, -9.0, 0.0, 0.0], jnp.float32)

    fused = _kernel_costs(model, s0, actions, masses)
    ref = _scan_reference(model, s0, actions, masses)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(ref), rtol=2e-5, atol=2e-4
    )


def _stack(fused):
    cfg = load_config("demo/particle_config.yaml")
    cfg["exp_params"].update(
        horizon=10, action_samples=8, params_samples=3, n_particles=3,
        mpf_n_particles=8, mpf_steps=2, fused_rollout=fused,
    )
    return build_particle_stack(cfg, jax.random.key(0))


def test_forward_fused_matches_plain():
    plain = _stack(False)
    fused = _stack(True)
    assert plain.controller.fused_state_costs is None
    assert fused.controller.fused_state_costs is not None

    dstate = plain.controller.init_state()
    key = jax.random.key(7)
    state = plain.init_state[None]

    out_p = plain.controller.forward(dstate, state, plain.model,
                                     plain.dynamics_prior, key)
    out_f = fused.controller.forward(dstate, state, fused.model,
                                     fused.dynamics_prior, key)
    np.testing.assert_allclose(
        np.asarray(out_p[1]), np.asarray(out_f[1]), rtol=2e-5, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out_p[0].a_mat), np.asarray(out_f[0].a_mat),
        rtol=2e-5, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out_p[0].a_mix), np.asarray(out_f[0].a_mix),
        rtol=2e-5, atol=2e-4,
    )
    assert out_f[2] is None and out_p[2] is not None


def test_full_solve_fused_matches_plain():
    """One whole SVMPC optimize agrees across the two paths."""
    plain = _stack(False)
    fused = _stack(True)
    dstate = plain.controller.init_state()
    svstate = plain.svmpc.init_state(plain.init_policies,
                                     plain.policies_prior)
    key = jax.random.key(3)
    state = plain.init_state[None]

    sv_p, d_p, c_p = plain.svmpc.optimize(
        svstate, dstate, state, plain.dynamics_prior, key
    )
    sv_f, d_f, c_f = fused.svmpc.optimize(
        svstate, dstate, state, fused.dynamics_prior, key
    )
    np.testing.assert_allclose(
        np.asarray(c_p), np.asarray(c_f), rtol=2e-5, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(sv_p.theta), np.asarray(sv_f.theta), rtol=2e-5,
        atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(d_p.a_mat), np.asarray(d_f.a_mat), rtol=2e-5, atol=2e-4
    )


def test_hook_rejects_unsupported_configs():
    stochastic = _model(deterministic=False)
    with pytest.raises(ValueError, match="deterministic"):
        make_fused_particle_state_costs(stochastic, interpret=True)

    model = _model()
    hook = make_fused_particle_state_costs(model, interpret=True)
    actions = jnp.zeros((4, 2, 6, 2))
    s0 = jnp.array([-9.0, -9.0, 0.0, 0.0])
    with pytest.raises(ValueError, match="mass"):
        hook(s0, actions, {"mass": jnp.ones((2,)),
                           "extra_load": jnp.ones((2,))})
