"""Rollout-axis sharded DISCO forward == unsharded forward (psum/pmin
reassembly of the information-theoretic update)."""

import jax
import jax.numpy as jnp
import numpy as np

from dust_tpu.controllers import MultiDisco
from dust_tpu.models import PendulumModel
from dust_tpu.parallel import make_mesh
from dust_tpu.parallel.rollout import make_sharded_disco_forward
from dust_tpu.spaces import Box
from tests.test_disco import inst_cost_jnp, term_cost_jnp


def test_sharded_rollout_forward_matches_unsharded(rng):
    mesh = make_mesh(axis_names=("rollout",))
    model = PendulumModel()
    n_actions, n_pol, horizon = 64, 3, 10
    ctrl = MultiDisco(
        observation_space=Box(dim=2),
        action_space=Box(dim=1, low=-2.0, high=2.0),
        hz_len=horizon,
        n_policies=n_pol,
        action_samples=n_actions,
        temperature=0.8,
        a_cov=4.0 * jnp.eye(1),
        inst_cost_fn=inst_cost_jnp,
        term_cost_fn=term_cost_jnp,
        params_sampling="none",
    )

    a_mat0 = jnp.asarray(rng.normal(size=(n_pol, horizon, 1)), jnp.float32)
    eps = jnp.asarray(
        rng.normal(size=(n_actions, n_pol, horizon, 1)) * 2, jnp.float32
    )
    state = jnp.array([[3.0, 0.2]])
    dstate = ctrl.init_state(a_mat0)

    # unsharded oracle via the standard forward with injected noise
    ds_ref, costs_ref, _, _, omega_ref, _ = ctrl.forward(
        dstate, state, model, eps_noise=eps
    )

    fwd = make_sharded_disco_forward(ctrl, model, mesh)
    ds_sh, costs_sh, omega_sh = jax.jit(fwd)(dstate, state, eps)

    np.testing.assert_allclose(
        np.asarray(costs_sh), np.asarray(costs_ref), rtol=1e-5, atol=1e-5
    )
    # psum reassembles the logsumexp in a different reduction order;
    # f32 tolerance accordingly
    np.testing.assert_allclose(
        np.asarray(omega_sh), np.asarray(omega_ref), rtol=1e-3, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(ds_sh.a_mat), np.asarray(ds_ref.a_mat), rtol=1e-3,
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(ds_sh.a_mix), np.asarray(ds_ref.a_mix), rtol=1e-3,
        atol=1e-7,
    )


def test_sharded_forward_stable_with_extreme_cost_spread(rng):
    """Low temperature + one policy far above the global best: the
    per-policy normalizer must not underflow to -inf (regression: the
    psum logsumexp previously lacked a per-policy max subtraction)."""
    mesh = make_mesh(axis_names=("rollout",))
    model = PendulumModel()
    n_actions, n_pol, horizon = 16, 2, 6
    ctrl = MultiDisco(
        observation_space=Box(dim=2),
        action_space=Box(dim=1, low=-2.0, high=2.0),
        hz_len=horizon,
        n_policies=n_pol,
        action_samples=n_actions,
        temperature=0.05,  # (cost - beta)/temp >> 88 for the bad policy
        a_cov=4.0 * jnp.eye(1),
        inst_cost_fn=inst_cost_jnp,
        term_cost_fn=term_cost_jnp,
        params_sampling="none",
    )
    # policy 0 near upright (cheap), policy 1 saturated torque (expensive)
    a_mat = jnp.stack([
        jnp.zeros((horizon, 1)),
        jnp.full((horizon, 1), 2.0),
    ])
    eps = jnp.asarray(rng.normal(size=(n_actions, n_pol, horizon, 1)) * 0.1,
                      jnp.float32)
    state = jnp.array([[0.05, 0.0]])  # near upright
    dstate = ctrl.init_state(a_mat)

    fwd = make_sharded_disco_forward(ctrl, model, mesh)
    ds_sh, costs, omega = jax.jit(fwd)(dstate, state, eps)
    assert np.isfinite(np.asarray(omega)).all()
    assert np.isfinite(np.asarray(ds_sh.a_mat)).all()
    assert np.isfinite(np.asarray(ds_sh.a_mix)).all()

    ds_ref, costs_r, _, _, omega_r, _ = ctrl.forward(
        dstate, state, model, eps_noise=eps
    )
    np.testing.assert_allclose(np.asarray(omega), np.asarray(omega_r),
                               rtol=1e-3, atol=1e-6)
