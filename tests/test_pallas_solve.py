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


# -- particle task (ctrl_dim 2, weighted prior, in-kernel collisions) ----


def _particle_stack(fused_solve, **over):
    from dust_tpu.experiments import build_particle_stack

    cfg = load_config("demo/particle_config.yaml")
    cfg["exp_params"].update(
        horizon=10, action_samples=9, params_samples=3, n_particles=3,
        fused_solve=fused_solve, **over,
    )
    return build_particle_stack(cfg, jax.random.key(0))


def _particle_inputs(stack):
    dstate = stack.controller.init_state()
    svstate = stack.svmpc.init_state(stack.init_policies,
                                     stack.policies_prior)
    state = stack.init_state.reshape(1, -1)
    return dstate, svstate, state


@pytest.mark.parametrize("weighted", [True, False])
def test_particle_solve_fused_matches_plain(weighted):
    """Weighted-prior logits, 2-D controls and in-kernel rectangle
    collisions all agree with the plain chain."""
    plain = _particle_stack(False, weighted_prior=weighted)
    fused = _particle_stack(True, weighted_prior=weighted)
    d_p, sv_p, state = _particle_inputs(plain)
    d_f, sv_f, _ = _particle_inputs(fused)
    key = jax.random.key(21)
    pd = plain.dynamics_prior

    # exercise the weighted-prior logits: run two optimize+forward
    # rounds so the second round's prior carries the first's weights
    for i in range(2):
        k_opt = jax.random.fold_in(key, 2 * i)
        k_fwd = jax.random.fold_in(key, 2 * i + 1)
        sv_p, d_p, c_p = plain.svmpc.optimize(sv_p, d_p, state, pd, k_opt)
        sv_f, d_f, c_f = fused.svmpc.optimize(sv_f, d_f, state, pd, k_opt)
        np.testing.assert_allclose(np.asarray(c_f), np.asarray(c_p),
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(sv_f.theta),
                                   np.asarray(sv_p.theta),
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(d_f.a_mat),
                                   np.asarray(d_p.a_mat),
                                   rtol=2e-3, atol=2e-3)
        sv_p, a_p, w_p = plain.svmpc.forward(sv_p, c_p, key=k_fwd)
        sv_f, a_f, w_f = fused.svmpc.forward(sv_f, c_f, key=k_fwd)
        np.testing.assert_allclose(np.asarray(w_f), np.asarray(w_p),
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(a_f), np.asarray(a_p),
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(
            np.asarray(jax.nn.log_softmax(sv_f.prior.logits)),
            np.asarray(jax.nn.log_softmax(sv_p.prior.logits)),
            rtol=2e-3, atol=2e-3,
        )


def test_particle_solve_fused_closed_loop():
    """Short particle episode (crash masks, mass change) stays on the
    plain trajectory."""
    from dust_tpu.simulation import particle_episode_fn

    outs = {}
    for fused in (False, True):
        stack = _particle_stack(fused)
        episode = jax.jit(particle_episode_fn(
            stack.model, stack.controller, svmpc=stack.svmpc,
            mpf=stack.mpf, dyn_dist=stack.dynamics_prior, load=stack.load,
            steps=6, warm_up=1, mpf_bw=stack.mpf_bw,
            mpf_steps=stack.mpf_steps,
        ))
        dstate, svstate, _ = _particle_inputs(stack)
        mstate = stack.mpf.init_state(
            stack.mpf_init, stack.init_state, 2, bw=stack.mpf_init_bw
        )
        outs[fused] = episode(
            jax.random.key(9), stack.init_state, dstate, svstate, mstate,
            jnp.float32(stack.model.params_dict["mass"]),
        )

    # final state, done/crash flags and cumulative cost agree
    np.testing.assert_allclose(np.asarray(outs[True][0]),
                               np.asarray(outs[False][0]),
                               rtol=5e-3, atol=5e-3)
    assert bool(outs[True][2]) == bool(outs[False][2])
    np.testing.assert_allclose(np.asarray(outs[True][3]),
                               np.asarray(outs[False][3]),
                               rtol=5e-3, atol=5e-3)
