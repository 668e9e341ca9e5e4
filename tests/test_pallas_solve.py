"""Whole-solve Pallas kernel (ops/pallas_solve.py) == the plain
SVMPC.optimize + SVMPC.forward chain on identical PRNG keys.

FusedPendulumSVMPC reproduces the plain path's exact key-split
discipline, so everything downstream (action noise, parameter draws,
costs, Stein step, selection, roll) must agree to float tolerance —
no noise injection needed.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dust_tpu.experiments import build_pendulum_stack, load_config

RTOL, ATOL = 2e-4, 2e-4


def _stack(fused_solve, case="dust", **over):
    cfg = load_config("demo/pendulum_config.yaml")
    cfg["exp_params"].update(
        horizon=12, action_samples=9, params_samples=3, n_particles=3,
        fused_solve=fused_solve, **over,
    )
    return build_pendulum_stack(cfg, jax.random.key(0), case=case)


def _inputs(stack):
    dstate = stack.controller.init_state(stack.init_policies)
    svstate = stack.svmpc.init_state(stack.init_policies,
                                     stack.policies_prior)
    state = stack.init_state.reshape(1, -1)
    return dstate, svstate, state


@pytest.mark.parametrize("case", ["dust", "svmpc"])
@pytest.mark.parametrize("likelihood", ["ExponentiatedUtility",
                                        "ExpectedCost"])
def test_solve_fused_matches_plain(case, likelihood):
    plain = _stack(False, case, likelihood=likelihood)
    fused = _stack(True, case, likelihood=likelihood)
    d_p, sv_p, state = _inputs(plain)
    d_f, sv_f, _ = _inputs(fused)
    key = jax.random.key(11)
    pd = plain.dynamics_prior if case == "dust" else None

    sv_p, d_p, c_p = plain.svmpc.optimize(sv_p, d_p, state, pd, key)
    sv_f, d_f, c_f = fused.svmpc.optimize(sv_f, d_f, state, pd, key)

    np.testing.assert_allclose(np.asarray(c_f), np.asarray(c_p),
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(sv_f.theta),
                               np.asarray(sv_p.theta), rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(d_f.a_mat), np.asarray(d_p.a_mat),
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(d_f.a_mix), np.asarray(d_p.a_mix),
                               rtol=RTOL, atol=ATOL)

    k_fwd = jax.random.key(12)
    sv_p2, a_p, w_p = plain.svmpc.forward(sv_p, c_p, key=k_fwd)
    sv_f2, a_f, w_f = fused.svmpc.forward(sv_f, c_f, key=k_fwd)

    np.testing.assert_allclose(np.asarray(w_f), np.asarray(w_p),
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(a_f), np.asarray(a_p),
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(sv_f2.theta),
                               np.asarray(sv_p2.theta), rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(sv_f2.prior.locs),
                               np.asarray(sv_p2.prior.locs),
                               rtol=RTOL, atol=ATOL)


def test_solve_fused_closed_loop():
    """A short closed-loop episode stays on the plain path's trajectory."""
    from dust_tpu.simulation import PendulumSimulation

    logs = {}
    for fused in (False, True):
        stack = _stack(fused)
        harness = PendulumSimulation(
            controller=stack.controller, svmpc=stack.svmpc, mpf=stack.mpf,
            model=stack.model, steps=8, warm_up=2,
            mpf_bw=stack.mpf_bw, mpf_steps=stack.mpf_steps,
        )
        episode = jax.jit(harness.episode_fn(stack.dynamics_prior))
        dstate, svstate, state = _inputs(stack)
        mstate = stack.mpf.init_state(stack.mpf_init, stack.init_state, 1)
        true_params = {"length": jnp.float32(1.0), "mass": jnp.float32(1.0)}
        _, out = episode(
            jax.random.key(5), true_params, state, dstate, svstate, mstate
        )
        logs[fused] = out

    # states, actions, costs follow the same closed-loop trajectory
    for i in (0, 1, 2):
        np.testing.assert_allclose(
            np.asarray(logs[True][i]), np.asarray(logs[False][i]),
            rtol=5e-3, atol=5e-3,
        )


def test_solve_kernel_vmaps_over_scenarios():
    """vmap lifts the solve kernel to a leading grid dim (sweep path)."""
    stack = _stack(True)
    d0, sv0, state = _inputs(stack)
    pd = stack.dynamics_prior
    keys = jax.random.split(jax.random.key(3), 3)
    states = jnp.stack([state + 0.1 * i for i in range(3)])

    def solve(key, st):
        sv, d, c = stack.svmpc.optimize(sv0, d0, st, pd, key)
        return sv.theta, d.a_mat, c

    batched = jax.vmap(solve)(keys, states)
    for i in range(3):
        single = solve(keys[i], states[i])
        for b, s in zip(batched, single):
            np.testing.assert_allclose(
                np.asarray(b[i]), np.asarray(s), rtol=1e-6, atol=1e-6
            )
