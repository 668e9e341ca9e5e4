"""Particle whole-episode megakernel (ops/pallas_particle_episode.py)
equivalence tests: host-noise mode must reproduce the composition of the
independently-tested `fused_particle_solve` (tests/test_pallas_solve.py)
and `fused_particle_mpf_optimize` (tests/test_pallas_particle_mpf.py)
kernels with the simulator step, termination masks and weighted-prior
refresh between them (`simulation.particle_episode_fn` sequencing)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dust_tpu.experiments import build_particle_stack, load_config
from dust_tpu.ops.pallas_particle_episode import fused_particle_episode
from dust_tpu.ops.pallas_particle_mpf import fused_particle_mpf_optimize
from dust_tpu.ops.pallas_particle_rollout import particle_kernel_statics
from dust_tpu.ops.pallas_solve import fused_particle_solve


@pytest.fixture(scope="module")
def stack():
    config = load_config("demo/particle_config.yaml")
    st = build_particle_stack(config, jax.random.key(0))
    st.exp = config["exp_params"]
    st.statics = particle_kernel_statics(st.model)
    return st


def _noise(steps, hz, seed=1):
    k1, k2, k3 = jax.random.split(jax.random.key(seed), 3)
    return (jax.random.normal(k1, (steps, 2, hz, 8, 128)),
            jax.random.normal(k2, (steps, 8, 128)),
            jax.random.uniform(k3, (steps, 8, 128)))


def _run_mega(stack, steps, warm_up, eps, pdz, pdu, change_at,
              success_dist=1.0, state0=None):
    exp = stack.exp
    mstate = stack.mpf.init_state(
        stack.mpf_init, stack.init_state, 2, bw=stack.mpf_init_bw
    )
    dstate = stack.controller.init_state()
    return fused_particle_episode(
        jnp.zeros(2, jnp.int32),
        stack.init_state if state0 is None else state0,
        stack.init_policies, stack.policies_prior.locs,
        jax.nn.log_softmax(stack.policies_prior.logits),
        dstate.a_mat, dstate.a_seq, stack.mpf_init, mstate.prior_bw,
        jnp.float32(stack.model.params_dict["mass"]),
        jnp.float32(stack.load),
        exp["ctrl_sigma"], exp["learning_rate"], exp["alpha"],
        1.0 / exp["alpha"], exp["prior_sigma"],
        exp["mpf_learning_rate"], exp["mpf_obs_std"],
        jnp.float32(stack.mpf_bw),
        steps=steps, warm_up=warm_up, hz=exp["horizon"],
        m=exp["n_particles"], n_params=exp["params_samples"],
        n_act=exp["action_samples"], m_mpf=exp["mpf_n_particles"],
        mpf_steps=exp["mpf_steps"], dt=float(stack.model.dt),
        max_acc=float(stack.model.max_acc),
        max_speed=float(stack.model.max_speed),
        change_at=change_at, success_dist=success_dist,
        exp_util=True, weighted_prior=exp["weighted_prior"],
        mpf_log_space=exp["mpf_log_space"], use_fixed_mpf_bw=True,
        mpf_bw_scale=exp["mpf_bandwidth_scaling"], unroll=False,
        host_eps=eps, host_pdz=pdz, host_pdu=pdu, interpret=True,
        **stack.statics,
    )


def _reference_composition(stack, steps, warm_up, eps, pdz, pdu,
                           change_at, success_dist=1.0):
    from dust_tpu.ops.bandwidth import silvermans_rule  # noqa: F401

    exp = stack.exp
    m, hz = exp["n_particles"], exp["horizon"]
    n_act, n_par = exp["action_samples"], exp["params_samples"]
    sig = float(exp["ctrl_sigma"])
    mm = exp["mpf_n_particles"]
    model = stack.model
    mstate = stack.mpf.init_state(
        stack.mpf_init, stack.init_state, 2, bw=stack.mpf_init_bw
    )
    theta = stack.init_policies
    locs = stack.policies_prior.locs
    logits = stack.policies_prior.logits
    dstate = stack.controller.init_state()
    amat, aseq = dstate.a_mat, dstate.a_seq
    x = stack.mpf_init
    pbw = mstate.prior_bw
    lik_loc = stack.init_state
    state = stack.init_state
    done = crashed = False
    cum = 0.0
    base_mass = float(model.params_dict["mass"])
    logs = {k: [] for k in ("state", "action", "cost", "cum", "bw_sv")}
    for t in range(steps):
        from dust_tpu.ops.bandwidth import silvermans_rule

        bw_sv = silvermans_rule(theta)
        acts = jnp.stack(
            [jnp.transpose(eps[t, 0, :, :m, :n_act], (2, 1, 0)),
             jnp.transpose(eps[t, 1, :, :m, :n_act], (2, 1, 0))],
            axis=-1,
        )
        actions = theta[None] + sig * acts
        idx = jnp.minimum(
            jnp.floor(pdu[t, :n_par, 0] * mm), mm - 1
        ).astype(jnp.int32)
        draws = x[idx, 0] + pbw * pdz[t, :n_par, 0]
        masses = jnp.exp(draws)
        log_mix = jax.nn.log_softmax(logits)
        (theta_opt, theta_fwd, amat_n, _, a_seq_sel, w, _) = \
            fused_particle_solve(
                state, theta, locs, log_mix, amat, aseq, actions,
                masses, bw_sv, exp["learning_rate"], exp["alpha"],
                1.0 / exp["alpha"], sig, exp["prior_sigma"],
                hz=hz, m=m, n_params=n_par, n_act=n_act,
                dt=float(model.dt), max_acc=float(model.max_acc),
                max_speed=float(model.max_speed), interpret=True,
                **stack.statics,
            )
        amat = amat_n
        if t >= warm_up:
            action = a_seq_sel[0]
            theta = theta_fwd
            locs = theta_fwd
            logits = jnp.log(jnp.clip(w, 1e-37))
        else:
            action = jnp.zeros(2)
            theta = theta_opt
        sim_mass = base_mass + stack.load if t >= change_at else base_mass
        new_state = model.step(
            state[None], action[None], {"mass": jnp.float32(sim_mass)}
        )[0]
        state = new_state if not done else state
        if t >= warm_up and not done:
            coll = model.obst_map.get_collisions(lik_loc[0:2])
            scale = model.dt * (1.0 - coll)
            x = fused_particle_mpf_optimize(
                x, x, lik_loc, state, action, scale,
                jnp.float32(stack.mpf_bw), pbw,
                exp["mpf_learning_rate"], exp["mpf_obs_std"],
                n_steps=exp["mpf_steps"], max_acc=float(model.max_acc),
                max_speed=float(model.max_speed),
                log_space=exp["mpf_log_space"], interpret=True,
            )
            pbw = jnp.float32(stack.mpf_bw)
            lik_loc = state
        cost = float(model.default_inst_cost(state[None])[0])
        if not done:
            cum += cost
        crash_now = bool(model.obst_map.get_collisions(state[0:2]) > 0)
        success_now = bool(
            jnp.linalg.norm(model.target - state) <= success_dist
        )
        crashed = crashed or (crash_now and not done)
        done = done or crash_now or success_now
        logs["state"].append(np.asarray(state))
        logs["action"].append(np.asarray(action))
        logs["cost"].append(cost)
        logs["cum"].append(cum)
        logs["bw_sv"].append(float(bw_sv))
    return logs, theta, amat, x, done, crashed


@pytest.mark.parametrize("warm_up", [0, 1])
def test_particle_episode_matches_kernel_composition(stack, warm_up):
    steps, hz = 2, stack.exp["horizon"]
    eps, pdz, pdu = _noise(steps, hz)
    out = _run_mega(stack, steps, warm_up, eps, pdz, pdu, change_at=100)
    logs, theta_r, amat_r, x_r, done_r, crashed_r = \
        _reference_composition(stack, steps, warm_up, eps, pdz, pdu,
                               change_at=100)
    np.testing.assert_allclose(
        np.asarray(out["state"]), np.stack(logs["state"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["action"]), np.stack(logs["action"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["cost"]), np.asarray(logs["cost"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["cum"]), np.asarray(logs["cum"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["bw_sv"]), np.asarray(logs["bw_sv"]), atol=1e-6
    )
    np.testing.assert_allclose(out["theta"], theta_r, atol=1e-4)
    np.testing.assert_allclose(out["a_mat"], amat_r, atol=1e-3)
    np.testing.assert_allclose(out["mpf_x"], x_r, atol=1e-5)
    assert bool(out["done"][-1] > 0.5) == done_r
    assert bool(out["crashed"][-1] > 0.5) == crashed_r


def test_particle_episode_termination_freezes(stack):
    """A huge success radius terminates at step 0: the state freezes,
    the cumulative cost stops accruing, and the gated MPF never moves
    the mass particles."""
    steps, hz = 3, stack.exp["horizon"]
    eps, pdz, pdu = _noise(steps, hz, seed=2)
    out = _run_mega(stack, steps, 0, eps, pdz, pdu, change_at=100,
                    success_dist=1e3)
    states = np.asarray(out["state"])
    assert np.asarray(out["done"]).all()
    np.testing.assert_array_equal(states[1], states[0])
    np.testing.assert_array_equal(states[2], states[0])
    cums = np.asarray(out["cum"])
    np.testing.assert_allclose(cums[1], cums[0], rtol=1e-6)
    # MPF ran at step 0 (done was detected after), then froze
    x1 = _run_mega(stack, 1, 0, eps[:1], pdz[:1], pdu[:1],
                   change_at=100, success_dist=1e3)["mpf_x"]
    np.testing.assert_array_equal(np.asarray(out["mpf_x"]),
                                  np.asarray(x1))
