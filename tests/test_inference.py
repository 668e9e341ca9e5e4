"""Inference layer: SVGD core, likelihoods, MPF, SVMPC vs the torch
reference (injected noise / fixed bandwidths; `reference_compat=True`)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import torch

from dust_tpu.distributions import GMM, MVN
from dust_tpu.inference import (
    SVGD,
    ExpectedCost,
    ExponentiatedUtility,
    GaussianLikelihood,
    MPF,
    SVMPC,
)
from dust_tpu.controllers import MultiDisco
from dust_tpu.models import PendulumModel
from dust_tpu.spaces import Box
from tests.test_disco import (
    inst_cost_jnp,
    inst_cost_torch,
    term_cost_jnp,
    term_cost_torch,
)


# ---------------------------------------------------------------- SVGD core


def test_svgd_phi_matches_reference(reference, rng):
    ref_svgd = reference("dust.inference.svgd")
    x_np = rng.normal(size=(8, 2)).astype(np.float32)
    bw = 0.8

    # target: N([1, -1], diag(0.5, 2.0))
    loc_t = torch.tensor([1.0, -1.0])
    cov_t = torch.diag(torch.tensor([0.5, 2.0]))
    target_t = torch.distributions.MultivariateNormal(loc_t, cov_t)

    svgd_t = ref_svgd.SVGD()
    x_t = torch.tensor(x_np, requires_grad=True)
    phi_t = svgd_t.phi(x_t, lambda x: target_t.log_prob(x), torch.tensor(bw))

    target_j = MVN.from_cov(jnp.array([1.0, -1.0]), jnp.diag(jnp.array([0.5, 2.0])))
    phi_j = SVGD().phi(jnp.asarray(x_np), target_j.log_prob, bw)

    np.testing.assert_allclose(np.asarray(phi_j), phi_t.detach().numpy(),
                               atol=1e-5)


def test_svgd_converges_to_gaussian():
    """Property: SVGD on a known Gaussian — discrepancy decreases, moments
    approach the target (SURVEY.md §7.5 property test)."""
    target = MVN.from_cov(jnp.array([2.0, -1.0]), 0.5 * jnp.eye(2))
    svgd = SVGD(n_particles=64, n_steps=300, optimizer=optax.adam(0.05))
    x0 = jax.random.normal(jax.random.key(0), (64, 2)) * 3.0

    d0 = svgd.discrepancy(x0, target.log_prob)
    x = svgd.optimize(target.log_prob, initial_particles=x0, bw=None)
    d1 = svgd.discrepancy(x, target.log_prob)

    assert float(d1) < float(d0)
    np.testing.assert_allclose(np.mean(np.asarray(x), axis=0), [2.0, -1.0],
                               atol=0.15)
    np.testing.assert_allclose(np.var(np.asarray(x), axis=0), [0.5, 0.5],
                               atol=0.2)


def test_discrepancy_matches_reference(reference, rng):
    ref_svgd = reference("dust.inference.svgd")
    x_np = rng.normal(size=(10, 3)).astype(np.float32)
    target_t = torch.distributions.MultivariateNormal(
        torch.zeros(3), torch.eye(3)
    )
    d_t = ref_svgd.SVGD().discrepancy(
        torch.tensor(x_np), lambda x: target_t.log_prob(x)
    )
    target_j = MVN.from_cov(jnp.zeros(3), jnp.eye(3))
    d_j = SVGD().discrepancy(jnp.asarray(x_np), target_j.log_prob)
    np.testing.assert_allclose(float(d_j), float(d_t), rtol=1e-4)


# ------------------------------------------------------------- likelihoods


def test_cost_log_probs_match_reference(reference, rng):
    ref_lik = reference("dust.inference.likelihoods")
    costs = rng.uniform(0, 100, size=(16, 5)).astype(np.float32)

    for cls_j, name in [(ExpectedCost, "ExpectedCost"),
                        (ExponentiatedUtility, "ExponentiatedUtility")]:
        cls_t = getattr(ref_lik, name)
        obj_t = cls_t.__new__(cls_t)  # skip __init__ (needs controller)
        obj_t.alpha = 0.7
        lp_t = obj_t.log_prob(torch.tensor(costs))

        obj_j = cls_j.__new__(cls_j)
        obj_j.alpha = 0.7
        lp_j = obj_j.log_prob(jnp.asarray(costs))
        np.testing.assert_allclose(np.asarray(lp_j), lp_t.numpy(), rtol=1e-5)


# -------------------------------------------------------------------- MPF


def _ref_mpf(reference, init_particles, init_obs, lr, bw):
    ref_mpf_mod = reference("dust.inference.mpf")
    ref_lik_mod = reference("dust.inference.likelihoods")
    ref_pend = reference("dust.models.pendulum")

    lik = ref_lik_mod.GaussianLikelihood(
        initial_obs=torch.tensor(init_obs),
        obs_std=0.1,
        model=ref_pend.PendulumModel(uncertain_params=("length", "mass")),
        log_space=False,
    )
    return ref_mpf_mod.MPF(
        init_particles=torch.tensor(init_particles.copy(), requires_grad=True),
        likelihood=lik,
        optimizer_class=torch.optim.SGD,
        lr=lr,
        bw=bw,
    )


def test_mpf_optimize_matches_reference(reference, rng):
    init_particles = rng.uniform(0.6, 1.3, size=(20, 2)).astype(np.float32)
    init_obs = np.array([3.0, 0.0], dtype=np.float32)
    lr, bw, n_steps = 1e-3, 0.25, 8

    theirs = _ref_mpf(reference, init_particles, init_obs, lr, bw)
    action = np.array([1.2], dtype=np.float32)
    new_obs = np.array([2.9, -0.4], dtype=np.float32)
    grads_t, bw_t = theirs.optimize(
        torch.tensor(action), torch.tensor(new_obs), bw=bw, n_steps=n_steps
    )

    lik_j = GaussianLikelihood(
        obs_std=0.1,
        model=PendulumModel(uncertain_params=("length", "mass")),
        log_space=False,
    )
    ours = MPF(likelihood=lik_j, optimizer=optax.sgd(lr),
               reference_compat=True)
    mstate = ours.init_state(init_particles, init_obs, dim_a=1, bw=bw)
    mstate, grads_j, bw_j = ours.optimize(
        mstate, jnp.asarray(action), jnp.asarray(new_obs), bw=bw,
        n_steps=n_steps
    )

    # f32 autograd noise in the sigma=0.1 likelihood gradients (O(100)
    # magnitudes) accumulates over the 8 SGD steps; ~1e-4 relative per step
    np.testing.assert_allclose(
        np.asarray(mstate.x), theirs.x.detach().numpy(), rtol=5e-3, atol=5e-3
    )
    # step 1 matches to the last f32 digit; later steps amplify rounding
    np.testing.assert_allclose(float(grads_j[0]), float(grads_t[0]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(grads_j), grads_t.numpy(), rtol=3e-2)
    assert float(bw_j) == bw


def test_mpf_posterior_concentrates_on_true_params():
    """Property: observing transitions from a pendulum with known
    (length, mass) concentrates the particle cloud near the truth (the
    `plots.py:317-391` ridgeline scenario, SURVEY.md §7.5)."""
    true_len, true_mass = 1.15, 0.8
    true_model = PendulumModel(length=true_len, mass=true_mass)
    est_model = PendulumModel(uncertain_params=("length", "mass"))

    lik = GaussianLikelihood(obs_std=0.05, model=est_model)
    mpf = MPF(likelihood=lik, optimizer=optax.sgd(0.003))
    optimize = jax.jit(
        lambda ms, a, o: mpf.optimize(ms, a, o, bw=0.1, n_steps=10)
    )

    key = jax.random.key(42)
    particles = jax.random.uniform(key, (50, 2), minval=0.6, maxval=1.3)
    obs = jnp.array([2.5, 0.0])
    mstate = mpf.init_state(particles, obs, dim_a=1)

    state = obs[None]
    for i in range(80):
        key, k = jax.random.split(key)
        action = jax.random.uniform(k, (1,), minval=-2.0, maxval=2.0)
        state = true_model.step(state, action[None])
        mstate, _, _ = optimize(mstate, action, state[0])

    mean = np.asarray(mstate.x).mean(axis=0)
    std = np.asarray(mstate.x).std(axis=0)
    assert abs(mean[0] - true_len) < 0.15
    assert abs(mean[1] - true_mass) < 0.2
    assert np.all(std < 0.3)  # cloud concentrates, not explodes


# ------------------------------------------------------------------ SVMPC


def test_svmpc_step_and_forward_match_reference(reference, rng):
    """Full SVMPC SVGD step + forward vs the reference, with identical
    injected action noise and the reference's gpytorch-RBF path
    (`reference_compat=True`)."""
    ref_svmpc_mod = reference("dust.inference.svmpc")
    ref_lik_mod = reference("dust.inference.likelihoods")
    ref_disco_mod = reference("dust.controllers.disco")
    ref_pend = reference("dust.models.pendulum")
    ref_svgd = reference("dust.inference.svgd")
    from gpytorch.kernels import RBFKernel  # shimmed

    m, horizon, n_samples = 3, 8, 16
    alpha, lr, prior_sigma, ctrl_sigma = 1.0, 2.0, 2.0, 2.0
    theta0 = rng.normal(size=(m, horizon, 1)).astype(np.float32)
    noise = rng.normal(size=(n_samples, m, horizon, 1)).astype(np.float32)
    state = np.array([[3.0, 0.0]], dtype=np.float32)
    bw = 0.9  # passed explicitly; gpytorch path ignores it (typo quirk)

    # ---- reference
    model_t = ref_pend.PendulumModel()
    ctrl_t = ref_disco_mod.MultiDISCO(
        observation_space=model_t.observation_space,
        action_space=model_t.action_space,
        hz_len=horizon,
        n_policies=m,
        action_samples=n_samples,
        temperature=1 / alpha,
        a_cov=ctrl_sigma**2 * torch.eye(1),
        inst_cost_fn=inst_cost_torch,
        term_cost_fn=term_cost_torch,
        params_sampling="none",
    )
    prior_t = ref_svgd.get_gmm(
        torch.tensor(theta0), torch.ones(m), prior_sigma**2 * torch.eye(1)
    )
    lik_t = ref_lik_mod.ExponentiatedUtility(
        alpha=alpha, n_samples=n_samples, controller=ctrl_t, model=model_t
    )
    theirs = ref_svmpc_mod.SVMPC(
        init_particles=torch.tensor(theta0.copy(), requires_grad=True),
        prior=prior_t,
        likelihood=lik_t,
        kernel=RBFKernel(),
        n_particles=m,
        n_steps=1,
        optimizer_class=torch.optim.SGD,
        lr=lr,
    )

    # inject the same action noise into the reference's pi.rsample
    noise_t = torch.tensor(noise)
    tril_t = torch.linalg.cholesky(ctrl_sigma**2 * torch.eye(1))

    def fake_rsample(self, shape):
        return self.base_dist.loc + noise_t @ tril_t.T

    orig_rsample = torch.distributions.Independent.rsample
    torch.distributions.Independent.rsample = fake_rsample
    try:
        theirs.optimize(torch.tensor(state), None, bw=bw)
        theta_opt_t = theirs.theta.detach().clone()  # before forward rolls
        a_mat_opt_t = ctrl_t.a_mat.detach().clone()
        a_seq_t, weights_t = theirs.forward(torch.tensor(state), None)
    finally:
        torch.distributions.Independent.rsample = orig_rsample

    # ---- ours
    model_j = PendulumModel()
    ctrl_j = MultiDisco(
        observation_space=Box(dim=2),
        action_space=Box(dim=1, low=-2.0, high=2.0),
        hz_len=horizon,
        n_policies=m,
        action_samples=n_samples,
        temperature=1 / alpha,
        a_cov=ctrl_sigma**2 * jnp.eye(1),
        inst_cost_fn=inst_cost_jnp,
        term_cost_fn=term_cost_jnp,
        params_sampling="none",
    )
    lik_j = ExponentiatedUtility(
        alpha=alpha, n_samples=n_samples, controller=ctrl_j, model=model_j
    )
    ours = SVMPC(
        likelihood=lik_j,
        kernel="rbf",
        n_particles=m,
        n_steps=1,
        optimizer=optax.sgd(lr),
        reference_compat=True,
    )
    prior_j = GMM.from_cov(theta0, jnp.ones(m), prior_sigma**2 * jnp.eye(1))
    svstate = ours.init_state(theta0, prior_j)
    dstate = ctrl_j.init_state()

    svstate, dstate, costs = ours.svgd_step(
        svstate, dstate, jnp.asarray(state), None, jax.random.key(0), bw,
        noise=jnp.asarray(noise),
    )
    np.testing.assert_allclose(
        np.asarray(svstate.theta), theta_opt_t.numpy(), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(dstate.a_mat), a_mat_opt_t.numpy(), atol=2e-4
    )

    svstate, a_seq_j, weights_j = ours.forward(svstate, costs)
    np.testing.assert_allclose(
        np.asarray(a_seq_j), a_seq_t.detach().numpy(), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(weights_j), weights_t.detach().numpy(), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(svstate.theta), theirs.theta.detach().numpy(), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(svstate.prior.locs),
        theirs.prior.component_distribution.base_dist.loc.numpy(),
        atol=2e-4,
    )


def test_mpf_log_space_matches_reference(reference, rng):
    """Log-space parameter particles (the particle demo's MPF mode,
    `demo/particle_config.yaml mpf_log_space: true`) vs the reference."""
    init = np.log(
        rng.uniform(0.6, 1.3, size=(16, 2)).astype(np.float32)
    )
    init_obs = np.array([3.0, 0.0], dtype=np.float32)
    lr, bw, n_steps = 1e-3, 0.25, 5

    ref_mpf_mod = reference("dust.inference.mpf")
    ref_lik_mod = reference("dust.inference.likelihoods")
    ref_pend = reference("dust.models.pendulum")
    lik_t = ref_lik_mod.GaussianLikelihood(
        initial_obs=torch.tensor(init_obs), obs_std=0.1,
        model=ref_pend.PendulumModel(uncertain_params=("length", "mass")),
        log_space=True,
    )
    theirs = ref_mpf_mod.MPF(
        init_particles=torch.tensor(init.copy()),
        likelihood=lik_t, optimizer_class=torch.optim.SGD, lr=lr, bw=bw,
    )
    theirs.optimize(torch.tensor([0.7]), torch.tensor([2.9, -0.4]),
                    bw=bw, n_steps=n_steps)

    lik_j = GaussianLikelihood(
        obs_std=0.1,
        model=PendulumModel(uncertain_params=("length", "mass")),
        log_space=True,
    )
    ours = MPF(likelihood=lik_j, optimizer=optax.sgd(lr),
               reference_compat=True)
    ms = ours.init_state(init, init_obs, dim_a=1, bw=bw)
    ms, _, _ = ours.optimize(ms, jnp.array([0.7]), jnp.array([2.9, -0.4]),
                             bw=bw, n_steps=n_steps)
    np.testing.assert_allclose(
        np.asarray(ms.x), theirs.x.detach().numpy(), rtol=5e-3, atol=5e-4
    )


def test_svmpc_multi_step_optimize(rng):
    """n_steps > 1 runs distinct SVGD updates with per-step PRNG keys."""
    from tests.test_disco import inst_cost_jnp, term_cost_jnp
    from dust_tpu.spaces import Box

    model = PendulumModel()
    ctrl = MultiDisco(
        observation_space=Box(dim=2),
        action_space=Box(dim=1, low=-2.0, high=2.0),
        hz_len=8, n_policies=3, action_samples=16,
        a_cov=4.0 * jnp.eye(1),
        inst_cost_fn=inst_cost_jnp, term_cost_fn=term_cost_jnp,
        params_sampling="none",
    )
    lik = ExponentiatedUtility(alpha=1.0, n_samples=16, controller=ctrl,
                               model=model)
    svmpc = SVMPC(likelihood=lik, n_particles=3, n_steps=3,
                  optimizer=optax.sgd(1.0))
    theta0 = jnp.asarray(rng.normal(size=(3, 8, 1)), jnp.float32)
    prior = GMM.from_cov(theta0, jnp.ones(3), 4.0 * jnp.eye(1))
    sv1 = svmpc.init_state(theta0, prior)
    ds = ctrl.init_state()
    obs = jnp.array([[3.0, 0.0]])

    sv3, _, costs = svmpc.optimize(sv1, ds, obs, None, jax.random.key(0))
    sv_single, _, _ = svmpc.optimize(sv1, ds, obs, None, jax.random.key(0),
                                     n_steps=1)
    assert np.isfinite(np.asarray(costs)).all()
    # three steps move further than one (distinct updates happened)
    assert not np.allclose(np.asarray(sv3.theta), np.asarray(sv_single.theta))
