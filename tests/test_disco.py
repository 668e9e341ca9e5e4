"""MultiDisco vs the torch reference `dust/controllers/disco.py`.

Torch RNG streams can't be matched bit-for-bit, so tests inject identical
action noise via `ext_actions` and identical parameter draws via stub
distributions (SURVEY.md §7.4.1 strategy (b))."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from dust_tpu.controllers import MultiDisco
from dust_tpu.models import PendulumModel
from dust_tpu.spaces import Box
from dust_tpu.utils.utf import MerweScaledUTF

HORIZON = 12
N_ACT = 16
N_POL = 3


def inst_cost_jnp(states, actions=None, **_):
    theta = states[..., 0]
    theta_d = states[..., 1]
    return 50.0 * (jnp.cos(theta) - 1) ** 2 + theta_d**2


def term_cost_jnp(states, **_):
    return inst_cost_jnp(states)


def inst_cost_torch(states, controls=None, n_pol=1, debug=None):
    theta, theta_d = states.chunk(2, dim=1)
    return 50.0 * (theta.cos() - 1) ** 2 + 1.0 * theta_d**2


def term_cost_torch(states, n_pol=1, debug=None):
    return inst_cost_torch(states).squeeze()


class TorchStub:
    """Deterministic params_dist stub for the reference controller."""

    def __init__(self, values, log_p):
        self.values = torch.tensor(values)
        self.log_p = torch.tensor(log_p)
        self.event_shape = torch.Size([values.shape[1]])

    def sample(self, shape):
        return self.values.clone()

    def log_prob(self, x):
        return self.log_p.clone()


class JnpStub:
    def __init__(self, values, log_p):
        self.values = jnp.asarray(values)
        self.log_p = jnp.asarray(log_p)

    def sample(self, key, shape):
        return self.values

    def log_prob(self, x):
        return self.log_p


def _make_pair(reference, params_sampling_ref, params_sampling_ours,
               n_pol=N_POL, params_samples=4):
    ref_disco = reference("dust.controllers.disco")
    ref_pend = reference("dust.models.pendulum")

    model_t = ref_pend.PendulumModel(uncertain_params=("length", "mass"))
    model_j = PendulumModel(uncertain_params=("length", "mass"))

    kwargs_t = dict(
        observation_space=model_t.observation_space,
        action_space=model_t.action_space,
        hz_len=HORIZON,
        n_policies=n_pol,
        action_samples=N_ACT,
        temperature=0.7,
        a_cov=2.0**2 * torch.eye(1),
        inst_cost_fn=inst_cost_torch,
        term_cost_fn=term_cost_torch,
        params_sampling=params_sampling_ref,
    )
    theirs = ref_disco.MultiDISCO(**kwargs_t)

    ours = MultiDisco(
        observation_space=Box(dim=2),
        action_space=Box(dim=1, low=-2.0, high=2.0),
        hz_len=HORIZON,
        n_policies=n_pol,
        action_samples=N_ACT,
        temperature=0.7,
        a_cov=2.0**2 * jnp.eye(1),
        inst_cost_fn=inst_cost_jnp,
        term_cost_fn=term_cost_jnp,
        params_sampling=params_sampling_ours,
    )
    return theirs, ours, model_t, model_j


def test_forward_no_params_matches_reference(reference, rng):
    theirs, ours, model_t, model_j = _make_pair(reference, "none", "none")

    state = np.array([[3.0, 0.0]], dtype=np.float32)
    a_mat0 = rng.normal(size=(N_POL, HORIZON, 1)).astype(np.float32)
    ext = rng.normal(size=(N_ACT, N_POL, HORIZON, 1)).astype(np.float32) * 2

    theirs.a_mat = torch.tensor(a_mat0)
    costs_t, states_t, actions_t, omega_t, _ = theirs.forward(
        torch.tensor(state), model_t, None, ext_actions=torch.tensor(ext)
    )

    dstate = ours.init_state(a_mat0)
    dstate2, costs_j, states_j, actions_j, omega_j, _ = ours.forward(
        dstate, jnp.asarray(state), model_j, ext_actions=jnp.asarray(ext)
    )

    np.testing.assert_allclose(np.asarray(costs_j), costs_t.numpy(), rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(states_j), states_t.numpy(), atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(omega_j), omega_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(dstate2.a_mat), theirs.a_mat.numpy(), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(dstate2.a_mix), theirs.a_mix.numpy(), atol=1e-5
    )


def test_forward_sampled_params_matches_reference(reference, rng):
    n_params = 4
    theirs, ours, model_t, model_j = _make_pair(
        reference, True, True, params_samples=n_params
    )
    theirs.n_params = n_params
    theirs._params_shape = [n_params]
    theirs.n_rollouts = n_params * N_ACT * N_POL

    params = rng.uniform(0.6, 1.3, size=(n_params, 2)).astype(np.float32)
    log_p = rng.normal(size=(n_params,)).astype(np.float32)
    state = np.array([[3.0, 0.5]], dtype=np.float32)
    ext = rng.normal(size=(N_ACT, N_POL, HORIZON, 1)).astype(np.float32) * 2
    a_mat0 = rng.normal(size=(N_POL, HORIZON, 1)).astype(np.float32)

    theirs.a_mat = torch.tensor(a_mat0)
    costs_t, states_t, _, omega_t, plogp_t = theirs.forward(
        torch.tensor(state),
        model_t,
        TorchStub(params, log_p),
        ext_actions=torch.tensor(ext),
    )

    dstate = ours.init_state(a_mat0)
    _, costs_j, states_j, _, omega_j, plogp_j = ours.forward(
        dstate,
        jnp.asarray(state),
        model_j,
        params_dist=JnpStub(params, log_p),
        key=jax.random.key(0),
        ext_actions=jnp.asarray(ext),
    )

    np.testing.assert_allclose(np.asarray(costs_j), costs_t.numpy(), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(states_j), states_t.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(omega_j), omega_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(plogp_j), log_p, atol=1e-6)


def test_compute_cost_ctrl_penalty_matches_reference(reference, rng):
    """Control-penalty parity with ctrl_penalty != 1 and actions sampled
    around a_mat != a_seq: the reference recomputes eps = actions - a_seq
    inside `_compute_cost` (`disco.py:338-340`) regardless of how the
    actions were drawn — regression for the internal-sampling path."""
    ref_disco = reference("dust.controllers.disco")
    ref_pend = reference("dust.models.pendulum")

    model_t = ref_pend.PendulumModel()
    model_j = PendulumModel()
    kwargs = dict(hz_len=HORIZON, n_policies=N_POL, action_samples=N_ACT,
                  temperature=0.7, ctrl_penalty=0.4)
    theirs = ref_disco.MultiDISCO(
        observation_space=model_t.observation_space,
        action_space=model_t.action_space,
        a_cov=2.0**2 * torch.eye(1),
        inst_cost_fn=inst_cost_torch, term_cost_fn=term_cost_torch,
        params_sampling="none", **kwargs)
    ours = MultiDisco(
        observation_space=Box(dim=2),
        action_space=Box(dim=1, low=-2.0, high=2.0),
        a_cov=2.0**2 * jnp.eye(1),
        inst_cost_fn=inst_cost_jnp, term_cost_fn=term_cost_jnp,
        params_sampling="none", **kwargs)

    a_seq = rng.normal(size=(HORIZON, 1)).astype(np.float32)
    a_mat = rng.normal(size=(N_POL, HORIZON, 1)).astype(np.float32)
    eps = rng.normal(size=(N_ACT, N_POL, HORIZON, 1)).astype(np.float32)
    actions = eps + a_mat  # internal-sampling geometry: around a_mat
    state = np.array([[2.0, 0.3]], dtype=np.float32)

    theirs.a_seq = torch.tensor(a_seq)
    theirs.a_mat = torch.tensor(a_mat)
    states_t, actions_t, _, _ = theirs._rollout(
        torch.tensor(state), model_t, None, torch.tensor(actions)
    )
    costs_t = theirs._compute_cost(states_t, actions_t)

    dstate = ours.init_state(a_mat).replace(a_seq=jnp.asarray(a_seq))
    states_j = ours.rollout(
        jnp.asarray(state), model_j, jnp.asarray(actions)[None]
    )
    costs_j = ours.compute_cost(dstate, states_j, jnp.asarray(actions))
    np.testing.assert_allclose(
        np.asarray(costs_j), costs_t.numpy(), rtol=2e-4, atol=1e-3
    )


def test_step_strategies_match_reference(reference, rng):
    for strategy in ("argmax", "average"):
        theirs, ours, _, _ = _make_pair(reference, "none", "none")
        a_mat = rng.normal(size=(N_POL, HORIZON, 1)).astype(np.float32) * 3
        a_mix = rng.uniform(0.1, 1.0, size=N_POL).astype(np.float32)

        theirs.a_mat = torch.tensor(a_mat)
        theirs.a_mix = torch.tensor(a_mix)
        next_t = theirs.step(strategy=strategy)

        dstate = ours.init_state().replace(
            a_mat=jnp.asarray(a_mat), a_mix=jnp.asarray(a_mix)
        )
        dstate2, next_j = ours.step(dstate, strategy=strategy)

        np.testing.assert_allclose(np.asarray(next_j), next_t.numpy(), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(dstate2.a_seq), theirs.a_seq.numpy(), atol=1e-5
        )
        if strategy == "average":
            # For "argmax" the reference's in-place clamp on the a_mat view
            # accidentally clips that policy's row (`disco.py:401,409-410`);
            # we keep a_mat untouched, so compare only the non-aliasing path.
            np.testing.assert_allclose(
                np.asarray(dstate2.a_mat), theirs.a_mat.numpy(), atol=1e-5
            )


def test_utf_rollout_states_match_reference(reference, rng):
    """Sigma-point rollouts produce the same trajectories (modulo layout:
    ours is [pts, n_act, 1, ...], the reference flattens to
    [n_act*pts, 1, ...] with sigma-point varying fastest). The *cost*
    branch is intentionally not compared: the reference's UTF weighting
    groups consecutive flat elements (time steps) instead of sigma points
    (`dust/controllers/disco.py:312-323`) — we implement the intended
    sigma-weighted expectation."""
    tf_j = MerweScaledUTF(n=2, alpha=0.5)
    reference("dust.utils.utf")
    import dust.utils.utf as ref_utf_mod

    tf_t = ref_utf_mod.MerweScaledUTF(n=2, alpha=0.5)
    theirs, ours, model_t, model_j = _make_pair(reference, tf_t, tf_j, n_pol=1)

    state = np.array([[2.0, -0.5]], dtype=np.float32)
    ext = rng.normal(size=(N_ACT, 1, HORIZON, 1)).astype(np.float32)

    low = torch.tensor([0.6, 0.6])
    high = torch.tensor([1.3, 1.3])
    dist_t = torch.distributions.Independent(
        torch.distributions.Uniform(low, high), 1
    )
    states_t, _, _, _ = theirs._sigma_rollout(
        torch.tensor(state), model_t, dist_t, torch.tensor(ext)
    )

    from dust_tpu.distributions import Uniform

    dist_j = Uniform(jnp.array([0.6, 0.6]), jnp.array([1.3, 1.3]), event_ndims=1)
    _, _, states_j, _, _, _ = ours.forward(
        ours.init_state(),
        jnp.asarray(state),
        model_j,
        params_dist=dist_j,
        ext_actions=jnp.asarray(ext),
    )

    # ours: [pts, n_act, 1, H+1, S] -> reference layout [n_act*pts, 1, H+1, S]
    pts = tf_j.pts
    ours_flat = np.asarray(states_j).transpose(1, 0, 2, 3, 4).reshape(
        N_ACT * pts, 1, HORIZON + 1, 2
    )
    np.testing.assert_allclose(ours_flat, states_t.numpy(), atol=1e-4)
