"""Full DuSt dual-loop closed-loop equivalence vs the torch reference —
the flagship configuration (BASELINE.json config #3): SVMPC control
posterior + sampled dynamics parameters + online MPF dynamics posterior.

All randomness is injected identically on both sides: action-sample noise
via rsample patching, dynamics-parameter draws via stub distributions
cycling pre-drawn arrays. The MPF update itself is deterministic given
the trajectory, so the whole dual loop becomes comparable step by step.
The rollout dynamics distribution is frozen to the stub on both sides
(the reference's live-prior aliasing — PARITY #6 — is sidestepped so the
comparison isolates the solver math)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import torch

from dust_tpu.controllers import MultiDisco
from dust_tpu.distributions import GMM
from dust_tpu.inference import (
    ExponentiatedUtility,
    GaussianLikelihood,
    MPF,
    SVMPC,
)
from dust_tpu.models import PendulumModel
from dust_tpu.spaces import Box
from tests.test_disco import (
    inst_cost_jnp,
    inst_cost_torch,
    term_cost_jnp,
    term_cost_torch,
)

SMALL = dict(M=3, HORIZON=10, N_SAMPLES=16, N_PARAMS=4, T_STEPS=10,
             MPF_N=12, MPF_STEPS=5)
# the literal demo shapes (`demo/pendulum_config.yaml`): horizon 30,
# 128 action samples, 8 param draws, 50 MPF particles x 20 steps
DEMO = dict(M=3, HORIZON=30, N_SAMPLES=128, N_PARAMS=8, T_STEPS=6,
            MPF_N=50, MPF_STEPS=20)
ALPHA, LR, PRIOR_SIGMA, CTRL_SIGMA = 1.0, 2.0, 2.0, 2.0
MPF_LR, MPF_BW, OBS_STD = 1e-3, 0.3, 0.1
TRUE = {"g": 10.0, "length": 1.05, "mass": 0.9}


class _TorchParamStub:
    """Cycles through pre-drawn parameter draws, one per forward call."""

    def __init__(self, draws, log_ps):
        self.draws = draws
        self.log_ps = log_ps
        self.i = 0
        self.event_shape = torch.Size([draws.shape[-1]])

    def sample(self, shape):
        d = torch.tensor(self.draws[self.i % len(self.draws)])
        return d

    def log_prob(self, x):
        lp = torch.tensor(self.log_ps[self.i % len(self.log_ps)])
        self.i += 1
        return lp


class _JnpParamStub:
    def __init__(self, draws, log_ps):
        self.draws = jnp.asarray(draws)
        self.log_ps = jnp.asarray(log_ps)
        self.i = 0

    def sample(self, key, shape):
        return self.draws[self.i % len(self.draws)]

    def log_prob(self, x):
        lp = self.log_ps[self.i % len(self.log_ps)]
        self.i += 1
        return lp


def _run_reference(reference, cfg, theta0, mpf0, noise_seq, param_draws,
                   param_lps, state0):
    M, HORIZON, N_SAMPLES, N_PARAMS, T_STEPS = (
        cfg["M"], cfg["HORIZON"], cfg["N_SAMPLES"], cfg["N_PARAMS"],
        cfg["T_STEPS"],
    )
    MPF_STEPS = cfg["MPF_STEPS"]
    ref_svmpc_mod = reference("dust.inference.svmpc")
    ref_lik_mod = reference("dust.inference.likelihoods")
    ref_disco_mod = reference("dust.controllers.disco")
    ref_pend = reference("dust.models.pendulum")
    ref_svgd = reference("dust.inference.svgd")
    ref_mpf_mod = reference("dust.inference.mpf")
    from gpytorch.kernels import RBFKernel  # shimmed

    model = ref_pend.PendulumModel(uncertain_params=("length", "mass"))
    sim_model = ref_pend.PendulumModel(**TRUE)
    ctrl = ref_disco_mod.MultiDISCO(
        observation_space=model.observation_space,
        action_space=model.action_space,
        hz_len=HORIZON,
        n_policies=M,
        action_samples=N_SAMPLES,
        params_samples=N_PARAMS,
        temperature=1 / ALPHA,
        a_cov=CTRL_SIGMA**2 * torch.eye(1),
        inst_cost_fn=inst_cost_torch,
        term_cost_fn=term_cost_torch,
        params_sampling=True,
    )
    prior = ref_svgd.get_gmm(
        torch.tensor(theta0), torch.ones(M), PRIOR_SIGMA**2 * torch.eye(1)
    )
    lik = ref_lik_mod.ExponentiatedUtility(
        alpha=ALPHA, n_samples=N_SAMPLES, controller=ctrl, model=model
    )
    svmpc = ref_svmpc_mod.SVMPC(
        init_particles=torch.tensor(theta0.copy()),
        prior=prior,
        likelihood=lik,
        kernel=RBFKernel(),
        n_particles=M,
        n_steps=1,
        optimizer_class=torch.optim.SGD,
        lr=LR,
    )
    dynamics_lik = ref_lik_mod.GaussianLikelihood(
        initial_obs=torch.tensor(state0[0]),
        obs_std=OBS_STD,
        model=ref_pend.PendulumModel(uncertain_params=("length", "mass")),
        log_space=False,
    )
    mpf = ref_mpf_mod.MPF(
        init_particles=torch.tensor(mpf0.copy()),
        likelihood=dynamics_lik,
        optimizer_class=torch.optim.SGD,
        lr=MPF_LR,
        bw=MPF_BW,
    )

    param_stub = _TorchParamStub(param_draws, param_lps)
    tril = torch.linalg.cholesky(CTRL_SIGMA**2 * torch.eye(1))
    step_idx = {"t": 0}

    def fake_rsample(self, shape):
        eps = torch.tensor(noise_seq[step_idx["t"]])
        return self.base_dist.loc + eps @ tril.T

    orig = torch.distributions.Independent.rsample
    torch.distributions.Independent.rsample = fake_rsample
    try:
        state = torch.tensor(state0)
        actions, mpf_traj = [], []
        for t in range(T_STEPS):
            svmpc.optimize(state, param_stub, bw=0.5)
            a_seq, _ = svmpc.forward(state, param_stub)
            action = a_seq[0]
            with torch.no_grad():
                state = sim_model.step(state, action.unsqueeze(0))
            mpf.optimize(action, state.squeeze(0), bw=MPF_BW,
                         n_steps=MPF_STEPS)
            actions.append(action.detach().numpy().copy())
            mpf_traj.append(mpf.x.detach().numpy().copy())
            step_idx["t"] += 1
    finally:
        torch.distributions.Independent.rsample = orig
    return np.asarray(actions), np.asarray(mpf_traj)


def _run_ours(cfg, theta0, mpf0, noise_seq, param_draws, param_lps, state0):
    M, HORIZON, N_SAMPLES, N_PARAMS, T_STEPS = (
        cfg["M"], cfg["HORIZON"], cfg["N_SAMPLES"], cfg["N_PARAMS"],
        cfg["T_STEPS"],
    )
    MPF_STEPS = cfg["MPF_STEPS"]
    model = PendulumModel(uncertain_params=("length", "mass"))
    sim_model = PendulumModel(**TRUE)
    ctrl = MultiDisco(
        observation_space=Box(dim=2),
        action_space=Box(dim=1, low=-2.0, high=2.0),
        hz_len=HORIZON,
        n_policies=M,
        action_samples=N_SAMPLES,
        params_samples=N_PARAMS,
        temperature=1 / ALPHA,
        a_cov=CTRL_SIGMA**2 * jnp.eye(1),
        inst_cost_fn=inst_cost_jnp,
        term_cost_fn=term_cost_jnp,
        params_sampling=True,
    )
    lik = ExponentiatedUtility(
        alpha=ALPHA, n_samples=N_SAMPLES, controller=ctrl, model=model
    )
    svmpc = SVMPC(
        likelihood=lik, kernel="rbf", n_particles=M, n_steps=1,
        optimizer=optax.sgd(LR), reference_compat=True,
    )
    prior = GMM.from_cov(theta0, jnp.ones(M), PRIOR_SIGMA**2 * jnp.eye(1))
    svstate = svmpc.init_state(theta0, prior)
    dstate = ctrl.init_state()

    dynamics_lik = GaussianLikelihood(
        obs_std=OBS_STD,
        model=PendulumModel(uncertain_params=("length", "mass")),
    )
    mpf = MPF(likelihood=dynamics_lik, optimizer=optax.sgd(MPF_LR),
              reference_compat=True)
    mstate = mpf.init_state(mpf0, state0[0], dim_a=1, bw=MPF_BW)

    param_stub = _JnpParamStub(param_draws, param_lps)
    state = jnp.asarray(state0)
    actions, mpf_traj = [], []
    key = jax.random.key(0)  # unused: all noise injected
    for t in range(T_STEPS):
        svstate, dstate, costs = svmpc.svgd_step(
            svstate, dstate, state, param_stub, key, bw=0.5,
            noise=jnp.asarray(noise_seq[t]),
        )
        svstate, a_seq, _ = svmpc.forward(svstate, costs)
        action = a_seq[0]
        state = sim_model.step(state, action[None])
        mstate, _, _ = mpf.optimize(mstate, action, state[0], bw=MPF_BW,
                                    n_steps=MPF_STEPS)
        actions.append(np.asarray(action))
        mpf_traj.append(np.asarray(mstate.x))
    return np.asarray(actions), np.asarray(mpf_traj)


@pytest.mark.parametrize("cfg", [SMALL, DEMO],
                         ids=["small", "demo_scale"])
def test_dual_loop_matches_reference(reference, rng, cfg):
    M, HORIZON, N_SAMPLES, N_PARAMS, T_STEPS = (
        cfg["M"], cfg["HORIZON"], cfg["N_SAMPLES"], cfg["N_PARAMS"],
        cfg["T_STEPS"],
    )
    theta0 = (rng.normal(size=(M, HORIZON, 1)) * 2).astype(np.float32)
    mpf0 = rng.uniform(0.6, 1.3, size=(cfg["MPF_N"], 2)).astype(np.float32)
    noise_seq = rng.normal(
        size=(T_STEPS, N_SAMPLES, M, HORIZON, 1)
    ).astype(np.float32)
    param_draws = rng.uniform(
        0.6, 1.3, size=(T_STEPS, N_PARAMS, 2)
    ).astype(np.float32)
    param_lps = rng.normal(size=(T_STEPS, N_PARAMS)).astype(np.float32)
    state0 = np.array([[3.0, 0.0]], dtype=np.float32)

    acts_ref, mpf_ref = _run_reference(
        reference, cfg, theta0, mpf0, noise_seq, param_draws, param_lps,
        state0
    )
    acts_ours, mpf_ours = _run_ours(
        cfg, theta0, mpf0, noise_seq, param_draws, param_lps, state0
    )

    np.testing.assert_allclose(acts_ours[:5], acts_ref[:5], rtol=1e-3,
                               atol=5e-4)
    np.testing.assert_allclose(acts_ours, acts_ref, rtol=5e-3, atol=1e-2)
    # the online dynamics posterior tracks identically
    np.testing.assert_allclose(mpf_ours, mpf_ref, rtol=5e-3, atol=1e-2)
    assert np.abs(acts_ref).max() > 0.5
