"""Closed-loop control-sequence equivalence vs the torch reference — the
BASELINE.json correctness metric: "control-seq error vs reference within
tolerance at matched horizon/particles/seeds".

With parameter sampling off and identical injected action noise, the
whole SVMPC pendulum loop is deterministic on both sides, so we drive
reference and dust_tpu through T closed-loop MPC steps with the same
pre-drawn noise and compare executed actions, states and particles."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import torch

from dust_tpu.controllers import MultiDisco
from dust_tpu.distributions import GMM
from dust_tpu.inference import ExponentiatedUtility, SVMPC
from dust_tpu.models import PendulumModel
from dust_tpu.spaces import Box
from tests.test_disco import (
    inst_cost_jnp,
    inst_cost_torch,
    term_cost_jnp,
    term_cost_torch,
)

M, HORIZON, N_SAMPLES, T_STEPS = 3, 12, 32, 15
ALPHA, LR, PRIOR_SIGMA, CTRL_SIGMA = 1.0, 2.0, 2.0, 2.0
TRUE = {"g": 10.0, "length": 1.05, "mass": 0.9}


def _run_reference(reference, theta0, noise_seq, state0, kernel="rbf"):
    ref_svmpc_mod = reference("dust.inference.svmpc")
    ref_lik_mod = reference("dust.inference.likelihoods")
    ref_disco_mod = reference("dust.controllers.disco")
    ref_pend = reference("dust.models.pendulum")
    ref_svgd = reference("dust.inference.svgd")
    from gpytorch.kernels import RBFKernel  # shimmed

    model = ref_pend.PendulumModel()
    sim_model = ref_pend.PendulumModel(**TRUE)
    ctrl = ref_disco_mod.MultiDISCO(
        observation_space=model.observation_space,
        action_space=model.action_space,
        hz_len=HORIZON,
        n_policies=M,
        action_samples=N_SAMPLES,
        temperature=1 / ALPHA,
        a_cov=CTRL_SIGMA**2 * torch.eye(1),
        inst_cost_fn=inst_cost_torch,
        term_cost_fn=term_cost_torch,
        params_sampling="none",
    )
    prior = ref_svgd.get_gmm(
        torch.tensor(theta0), torch.ones(M), PRIOR_SIGMA**2 * torch.eye(1)
    )
    lik = ref_lik_mod.ExponentiatedUtility(
        alpha=ALPHA, n_samples=N_SAMPLES, controller=ctrl, model=model
    )
    if kernel == "message_passing":
        ref_bk = reference("dust.kernels.base_kernels")
        ref_ck = reference("dust.kernels.composite_kernels")
        kernel_obj = ref_ck.iid_mp(
            base_kernel=ref_bk.RBF(bandwidth=-1), ctrl_dim=1,
            indep_controls=True,
        )
    else:
        kernel_obj = RBFKernel()
    svmpc = ref_svmpc_mod.SVMPC(
        init_particles=torch.tensor(theta0.copy()),
        prior=prior,
        likelihood=lik,
        kernel=kernel_obj,
        n_particles=M,
        n_steps=1,
        optimizer_class=torch.optim.SGD,
        lr=LR,
    )

    tril = torch.linalg.cholesky(CTRL_SIGMA**2 * torch.eye(1))
    step_idx = {"t": 0}

    def fake_rsample(self, shape):
        eps = torch.tensor(noise_seq[step_idx["t"]])
        return self.base_dist.loc + eps @ tril.T

    orig = torch.distributions.Independent.rsample
    torch.distributions.Independent.rsample = fake_rsample
    try:
        state = torch.tensor(state0)
        actions, states = [], []
        for t in range(T_STEPS):
            svmpc.optimize(state, None)
            a_seq, _ = svmpc.forward(state, None)
            action = a_seq[0]
            with torch.no_grad():
                state = sim_model.step(state, action.unsqueeze(0))
            actions.append(action.detach().numpy().copy())
            states.append(state.detach().numpy().copy())
            step_idx["t"] += 1
    finally:
        torch.distributions.Independent.rsample = orig
    return (np.asarray(actions), np.asarray(states),
            svmpc.theta.detach().numpy())


def _run_ours(theta0, noise_seq, state0, kernel="rbf"):
    model = PendulumModel()
    sim_model = PendulumModel(**TRUE)
    ctrl = MultiDisco(
        observation_space=Box(dim=2),
        action_space=Box(dim=1, low=-2.0, high=2.0),
        hz_len=HORIZON,
        n_policies=M,
        action_samples=N_SAMPLES,
        temperature=1 / ALPHA,
        a_cov=CTRL_SIGMA**2 * jnp.eye(1),
        inst_cost_fn=inst_cost_jnp,
        term_cost_fn=term_cost_jnp,
        params_sampling="none",
    )
    lik = ExponentiatedUtility(
        alpha=ALPHA, n_samples=N_SAMPLES, controller=ctrl, model=model
    )
    svmpc = SVMPC(
        likelihood=lik, kernel=kernel, ctrl_dim=1, n_particles=M, n_steps=1,
        optimizer=optax.sgd(LR), reference_compat=(kernel == "rbf"),
    )
    prior = GMM.from_cov(theta0, jnp.ones(M), PRIOR_SIGMA**2 * jnp.eye(1))
    svstate = svmpc.init_state(theta0, prior)
    dstate = ctrl.init_state()

    # bw is irrelevant on the compat path (fixed gpytorch lengthscale);
    # KDEpy-convention Silverman would also match, but pass it explicitly
    # to mirror the reference call shape.
    state = jnp.asarray(state0)
    actions, states = [], []
    key = jax.random.key(0)  # unused: all noise injected
    for t in range(T_STEPS):
        svstate, dstate, costs = svmpc.svgd_step(
            svstate, dstate, state, None, key, bw=0.5,
            noise=jnp.asarray(noise_seq[t]),
        )
        svstate, a_seq, _ = svmpc.forward(svstate, costs)
        action = a_seq[0]
        state = sim_model.step(state, action[None])
        actions.append(np.asarray(action))
        states.append(np.asarray(state))
    return (np.asarray(actions), np.asarray(states),
            np.asarray(svstate.theta))


@pytest.mark.parametrize("kernel", ["rbf", "message_passing"])
def test_closed_loop_control_sequences_match_reference(reference, rng,
                                                       kernel):
    theta0 = (rng.normal(size=(M, HORIZON, 1)) * 2).astype(np.float32)
    noise_seq = rng.normal(
        size=(T_STEPS, N_SAMPLES, M, HORIZON, 1)
    ).astype(np.float32)
    state0 = np.array([[3.0, 0.0]], dtype=np.float32)

    acts_ref, states_ref, theta_ref = _run_reference(
        reference, theta0, noise_seq, state0, kernel
    )
    acts_ours, states_ours, theta_ours = _run_ours(
        theta0, noise_seq, state0, kernel
    )

    # early steps pin the math tightly; later steps allow the f32
    # closed-loop chaos amplification (larger on the message-passing path,
    # whose per-slice median-trick bandwidths switch discretely)
    np.testing.assert_allclose(acts_ours[:8], acts_ref[:8], rtol=1e-3,
                               atol=2e-4)
    tol = 2e-3 if kernel == "rbf" else 5e-2
    np.testing.assert_allclose(acts_ours, acts_ref, atol=tol)
    np.testing.assert_allclose(states_ours, states_ref, atol=3 * tol)
    np.testing.assert_allclose(theta_ours, theta_ref, atol=3 * tol)
    # and the executed trajectories are genuinely nontrivial
    assert np.abs(acts_ref).max() > 0.5
