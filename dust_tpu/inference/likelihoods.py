"""Likelihood models for the dual Stein inference loop.

TPU-native counterpart of `dust/inference/likelihoods.py:12-135`:

* `GaussianLikelihood` — the MPF observation model: predict one step of the
  dynamics from the previous observation under each particle's parameters,
  score the new observation under an isotropic Gaussian. Its mutable state
  (latest obs, previous obs/action) lives in a `LikelihoodState` pytree.
* `CostLikelihood` + `ExpectedCost` / `ExponentiatedUtility` — the control
  pseudo-likelihood: sample action sequences around each policy particle
  (reparameterized), delegate rollout + cost to the controller, map costs
  to a log-likelihood.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class LikelihoodState:
    """Conditioning state of the Gaussian observation likelihood
    (`likelihoods.py:51-64`)."""

    loc: jax.Array          # latest observation [S]
    past_obs: jax.Array     # previous observation [S]
    past_action: jax.Array  # action taken at past_obs [A]


class GaussianLikelihood:
    """Observation model for MPF (`likelihoods.py:12-64`)."""

    def __init__(self, obs_std, model, log_space=False):
        self.sigma = float(obs_std)
        self.model = model
        self.log_space = bool(log_space)

    def init_state(self, initial_obs, dim_a) -> LikelihoodState:
        initial_obs = jnp.asarray(initial_obs, jnp.float32).reshape(-1)
        return LikelihoodState(
            loc=initial_obs,
            past_obs=jnp.zeros_like(initial_obs),
            past_action=jnp.zeros((dim_a,), jnp.float32),
        )

    def condition(self, lik_state: LikelihoodState, action, new_obs):
        """Re-center on the newest observation; the old center becomes the
        rollout start (`likelihoods.py:51-64`)."""
        return LikelihoodState(
            loc=jnp.asarray(new_obs).reshape(-1),
            past_obs=lik_state.loc,
            past_action=jnp.asarray(action).reshape(-1),
        )

    def sample(self, lik_state: LikelihoodState, theta):
        """One-step prediction from past_obs under each particle's
        parameters (`likelihoods.py:30-46`). theta: [n, P] -> states [n, S].
        Differentiable w.r.t. theta (the MPF score function backprops
        through this)."""
        params = jnp.exp(theta) if self.log_space else theta
        params_dict = self.model.params_to_dict(params)
        n = theta.shape[0]
        states = jnp.broadcast_to(
            lik_state.past_obs, (n, lik_state.past_obs.shape[0])
        )
        return self.model.step(states, lik_state.past_action, params_dict)

    def log_prob(self, lik_state: LikelihoodState, samples):
        """log N(samples | loc, sigma^2 I) -> [n]."""
        d = lik_state.loc.shape[0]
        z = (samples - lik_state.loc) / self.sigma
        return -0.5 * (
            jnp.sum(z * z, axis=-1) + d * jnp.log(2 * jnp.pi * self.sigma**2)
        )


class CostLikelihood:
    """Control pseudo-likelihood (`likelihoods.py:67-105`): rollout + cost
    via the controller, for `n_samples` action sequences drawn around each
    policy particle from N(theta, a_cov)."""

    def __init__(self, n_samples, controller, model):
        self.n_samples = int(n_samples)
        self.controller = controller
        self.model = model

    def sample(self, dstate, theta, state, params_dist, key, noise=None):
        """Returns (new_dstate, costs [n_samples, m], actions
        [n_samples, m, H, A], states). The action draw is the
        reparameterized `pi.rsample` of `likelihoods.py:85-90`; `noise`
        optionally injects the standard-normal draw (equivalence tests)."""
        k_act, k_fwd = jax.random.split(key)
        m, h, a = theta.shape
        if noise is None:
            noise = jax.random.normal(k_act, (self.n_samples, m, h, a))
        actions = theta + noise @ self.controller.a_scale_tril.T
        new_dstate, costs, states, actions, _, params_log_p = (
            self.controller.forward(
                dstate, state, self.model, params_dist, k_fwd,
                ext_actions=actions,
            )
        )
        return new_dstate, costs, actions, states, params_log_p

    def log_prob(self, costs):
        raise NotImplementedError


class ExpectedCost(CostLikelihood):
    """log p ~ -alpha * mean(costs) (`likelihoods.py:108-119`)."""

    def __init__(self, alpha, **kwargs):
        super().__init__(**kwargs)
        self.alpha = float(alpha)

    def log_prob(self, costs):
        return -self.alpha * costs.mean(axis=0)


class ExponentiatedUtility(CostLikelihood):
    """log p ~ logsumexp(-alpha * costs) - log N (`likelihoods.py:122-135`)."""

    def __init__(self, alpha, **kwargs):
        super().__init__(**kwargs)
        self.alpha = float(alpha)

    def log_prob(self, costs):
        return jax.nn.logsumexp(-self.alpha * costs, axis=0) - jnp.log(
            float(costs.shape[0])
        )
