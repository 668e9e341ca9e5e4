"""SVMPC secondary paths: roll strategies, message-passing kernel in the
loop, ExpectedCost likelihood, weighted prior."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dust_tpu.controllers import MultiDisco
from dust_tpu.distributions import GMM
from dust_tpu.inference import ExpectedCost, ExponentiatedUtility, SVMPC
from dust_tpu.models import PendulumModel
from dust_tpu.spaces import Box
from tests.test_disco import inst_cost_jnp, term_cost_jnp

M, H, NS = 3, 8, 16


def _make_svmpc(kernel="rbf", likelihood_cls=ExponentiatedUtility,
                weighted_prior=False, roll_strategy="repeat"):
    model = PendulumModel()
    ctrl = MultiDisco(
        observation_space=Box(dim=2),
        action_space=Box(dim=1, low=-2.0, high=2.0),
        hz_len=H, n_policies=M, action_samples=NS,
        a_cov=4.0 * jnp.eye(1),
        inst_cost_fn=inst_cost_jnp, term_cost_fn=term_cost_jnp,
        params_sampling="none",
    )
    lik = likelihood_cls(alpha=1.0, n_samples=NS, controller=ctrl,
                         model=model)
    svmpc = SVMPC(likelihood=lik, kernel=kernel, ctrl_dim=1, n_particles=M,
                  optimizer=optax.sgd(1.0), weighted_prior=weighted_prior,
                  roll_strategy=roll_strategy)
    return ctrl, svmpc


def _roll_reference(theta, strategy, prior_draw=None):
    """The reference roll semantics (`dust/inference/svmpc.py:142-158`)."""
    rolled = np.roll(theta, -1, axis=-2)
    if strategy == "repeat":
        rolled[..., -1, :] = rolled[..., -2, :]
    elif strategy == "mean":
        rolled[..., -1, :] = rolled.mean(axis=-2)
    elif strategy == "resample":
        rolled[..., -1, :] = prior_draw[..., -1, :]
    return rolled


@pytest.mark.parametrize("strategy", ["repeat", "mean", "resample"])
def test_roll_strategies(rng, strategy):
    ctrl, svmpc = _make_svmpc(roll_strategy=strategy)
    theta0 = rng.normal(size=(M, H, 1)).astype(np.float32)
    prior = GMM.from_cov(theta0, jnp.ones(M), 4.0 * jnp.eye(1))
    sv = svmpc.init_state(theta0, prior)
    key = jax.random.key(9)
    sv2 = svmpc.roll(sv, key=key)

    if strategy == "resample":
        draw = np.asarray(prior.sample(key, (M,)))
        expected = _roll_reference(theta0.copy(), strategy, draw)
    else:
        expected = _roll_reference(theta0.copy(), strategy)
    np.testing.assert_allclose(np.asarray(sv2.theta), expected, atol=1e-6)


@pytest.mark.parametrize("kernel", ["rbf", "message_passing"])
@pytest.mark.parametrize("likelihood_cls",
                         [ExpectedCost, ExponentiatedUtility])
def test_svgd_step_runs_all_paths(rng, kernel, likelihood_cls):
    ctrl, svmpc = _make_svmpc(kernel=kernel, likelihood_cls=likelihood_cls,
                              weighted_prior=True)
    theta0 = rng.normal(size=(M, H, 1)).astype(np.float32)
    prior = GMM.from_cov(theta0, jnp.ones(M), 4.0 * jnp.eye(1))
    sv = svmpc.init_state(theta0, prior)
    ds = ctrl.init_state()
    obs = jnp.array([[3.0, 0.0]])

    sv, ds, costs = svmpc.optimize(sv, ds, obs, None, jax.random.key(0))
    assert np.isfinite(np.asarray(sv.theta)).all()
    assert np.isfinite(np.asarray(costs)).all()
    # particles moved
    assert not np.allclose(np.asarray(sv.theta), theta0)

    sv, a_seq, weights = svmpc.forward(sv, costs, key=jax.random.key(1))
    assert a_seq.shape == (H, 1)
    np.testing.assert_allclose(float(weights.sum()), 1.0, rtol=1e-4)
    # weighted prior carries the posterior weights into the mixture
    np.testing.assert_allclose(
        np.asarray(jax.nn.softmax(sv.prior.logits)), np.asarray(weights),
        atol=1e-4,
    )


def test_expected_cost_vs_exponentiated_utility_differ(rng):
    costs = jnp.asarray(rng.uniform(0, 10, size=(NS, M)), jnp.float32)
    ec = ExpectedCost.__new__(ExpectedCost)
    ec.alpha = 1.0
    eu = ExponentiatedUtility.__new__(ExponentiatedUtility)
    eu.alpha = 1.0
    lp_ec = np.asarray(ec.log_prob(costs))
    lp_eu = np.asarray(eu.log_prob(costs))
    assert lp_ec.shape == lp_eu.shape == (M,)
    # EU is a soft-min, EC a mean: EU >= -mean always
    assert (lp_eu >= lp_ec - 1e-5).all()
    assert not np.allclose(lp_ec, lp_eu)
