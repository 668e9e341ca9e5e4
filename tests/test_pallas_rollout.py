"""Fused pendulum rollout+cost kernel == the scan rollout + compute_cost
state part, and the full MultiDisco.forward fused path == the plain path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dust_tpu.experiments import build_pendulum_stack, load_config
from dust_tpu.models import PendulumModel
from dust_tpu.ops.pallas_rollout import (
    fused_pendulum_rollout_costs,
    make_fused_pendulum_state_costs,
)


def _stack(fused, case="dust"):
    cfg = load_config("demo/pendulum_config.yaml")
    cfg["exp_params"].update(
        horizon=12, action_samples=9, params_samples=3, n_particles=3,
        fused_rollout=fused,
    )
    return build_pendulum_stack(cfg, jax.random.key(0), case=case)


def test_kernel_matches_scan_rollout():
    model = PendulumModel(uncertain_params=("length", "mass"))
    k1, k2, k3 = jax.random.split(jax.random.key(1), 3)
    n_act, n_pol, hz = 7, 3, 11          # deliberately non-multiples of 8
    actions = 2.5 * jax.random.normal(k1, (n_act, n_pol, hz, 1))
    lengths = jax.random.uniform(k2, (4,), minval=0.6, maxval=1.3)
    masses = jax.random.uniform(k3, (4,), minval=0.6, maxval=1.3)
    s0 = jnp.array([np.pi, 0.3], jnp.float32)

    fused = fused_pendulum_rollout_costs(
        s0, actions, lengths, masses, dt=model.dt, g=9.8, interpret=True
    )

    # reference: evolve every (param, traj) pair with model.step
    params = {
        "length": lengths.reshape(4, 1, 1, 1),
        "mass": masses.reshape(4, 1, 1, 1),
    }
    states = jnp.broadcast_to(s0, (4, n_act, n_pol, 2))
    cost = jnp.zeros((4, n_act, n_pol))
    for t in range(hz):
        cost = cost + (
            50.0 * (jnp.cos(states[..., 0]) - 1.0) ** 2
            + states[..., 1] ** 2
        )
        states = model.step(states, actions[:, :, t, :], params)
    cost = cost + (
        50.0 * (jnp.cos(states[..., 0]) - 1.0) ** 2 + states[..., 1] ** 2
    )

    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(cost), rtol=2e-5, atol=2e-4
    )


@pytest.mark.parametrize("case", ["dust", "svmpc"])
def test_forward_fused_matches_plain(case):
    plain = _stack(False, case)
    fused = _stack(True, case)
    assert plain.controller.fused_state_costs is None
    assert fused.controller.fused_state_costs is not None

    dstate = plain.controller.init_state(plain.init_policies)
    key = jax.random.key(7)
    state = plain.init_state.reshape(1, -1)
    pd = plain.dynamics_prior if case == "dust" else None

    out_p = plain.controller.forward(dstate, state, plain.model, pd, key)
    out_f = fused.controller.forward(dstate, state, fused.model, pd, key)

    # costs, new plan, mixture weights, omega all agree; states is None
    # on the fused path (trajectories never materialized)
    np.testing.assert_allclose(
        np.asarray(out_p[1]), np.asarray(out_f[1]), rtol=2e-5, atol=2e-4
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
    """One whole SVMPC optimize + forward agrees across the two paths."""
    plain = _stack(False)
    fused = _stack(True)
    dstate = plain.controller.init_state(plain.init_policies)
    svstate = plain.svmpc.init_state(plain.init_policies,
                                     plain.policies_prior)
    key = jax.random.key(3)
    state = plain.init_state.reshape(1, -1)

    sv_p, d_p, c_p = plain.svmpc.optimize(
        svstate, dstate, state, plain.dynamics_prior, key
    )
    sv_f, d_f, c_f = fused.svmpc.optimize(
        svstate, dstate, state, fused.dynamics_prior, key
    )
    np.testing.assert_allclose(
        np.asarray(c_p), np.asarray(c_f), rtol=2e-5, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(sv_p.theta), np.asarray(sv_f.theta), rtol=2e-5,
        atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(d_p.a_mat), np.asarray(d_f.a_mat), rtol=2e-5, atol=2e-4
    )


def test_kernel_vmaps_over_scenarios():
    """vmap lifts the kernel to a leading grid dim (the fused sweep path,
    bench/bench_all.py bench_sweep(fused=True)): batched == per-lane."""
    k1, k2 = jax.random.split(jax.random.key(5))
    n_sc, n_act, n_pol, hz = 3, 5, 2, 7
    s0 = jnp.stack(
        [jnp.array([np.pi, 0.0]) + 0.2 * i for i in range(n_sc)]
    )
    actions = 2.0 * jax.random.normal(k1, (n_sc, n_act, n_pol, hz, 1))
    lengths = jax.random.uniform(k2, (4,), minval=0.7, maxval=1.2)
    masses = lengths[::-1]

    f = lambda s, a: fused_pendulum_rollout_costs(
        s, a, lengths, masses, dt=0.05, g=9.8, interpret=True
    )
    batched = jax.vmap(f)(s0, actions)
    single = jnp.stack([f(s0[i], actions[i]) for i in range(n_sc)])
    np.testing.assert_allclose(
        np.asarray(batched), np.asarray(single), rtol=1e-6, atol=1e-6
    )


def test_hook_rejects_unknown_param_keys():
    model = PendulumModel(uncertain_params=("length", "mass"))
    hook = make_fused_pendulum_state_costs(model, interpret=True)
    actions = jnp.zeros((4, 2, 6, 1))
    s0 = jnp.array([np.pi, 0.0])
    with pytest.raises(ValueError, match="length/mass"):
        hook(s0, actions, {"g": jnp.float32(12.0),
                           "length": jnp.ones((1,)),
                           "mass": jnp.ones((1,))})
