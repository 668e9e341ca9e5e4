"""AMPPI: single-policy MPPI controller.

TPU-native counterpart of `dust/controllers/amppi.py:6-260` (unused by the
reference demos — MultiDisco with n_pol=1 supersedes it — but part of the
API surface). Pure functions over an `AMPPIState` pytree; horizon rollouts
share `MultiDisco.rollout`'s scan pattern.

Note the reference's cost indexing differs from DISCO's on purpose: inst
costs run over states[1:] (excluding the initial state, including the
final one, `amppi.py:205-207`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..utils.utf import MerweScaledUTF


@struct.dataclass
class AMPPIState:
    a_seq: jax.Array  # [H, A]


class AMPPI:
    def __init__(
        self,
        observation_space,
        action_space,
        hz_len,
        n_samples,
        lambda_=1.0,
        a_cov=None,
        inst_cost_fn=None,
        term_cost_fn=None,
        params_sampling="extended",
    ):
        self.hz_len = int(hz_len)
        self.dim_s = observation_space.dim
        self.dim_a = action_space.dim
        self.min_a = jnp.asarray(action_space.low)
        self.max_a = jnp.asarray(action_space.high)
        self.n_samples = int(n_samples)
        self.lambda_ = float(lambda_)

        if inst_cost_fn is None and term_cost_fn is None:
            raise ValueError("Specify at least one cost function")
        _null = lambda s, *a, **k: jnp.zeros(s.shape[:-1], s.dtype)
        self.inst_cost_fn = inst_cost_fn or _null
        self.term_cost_fn = term_cost_fn or _null

        a_cov = jnp.eye(self.dim_a) if a_cov is None else jnp.asarray(a_cov)
        self.a_scale_tril = jnp.linalg.cholesky(a_cov.astype(jnp.float32))
        self.a_pre = jnp.linalg.inv(a_cov.astype(jnp.float32))

        self._tf = None
        if not params_sampling or params_sampling == "none":
            self._params_shape = None
        elif params_sampling == "single":
            self._params_shape = 1
        elif params_sampling == "extended":
            self._params_shape = self.n_samples
        elif isinstance(params_sampling, MerweScaledUTF):
            self._params_shape = None
            self._tf = params_sampling
        else:
            raise ValueError(
                f"Invalid value for 'params_sampling': {params_sampling}"
            )
        self.params_sampling = params_sampling

    def init_state(self, init_actions=None) -> AMPPIState:
        a_seq = (
            jnp.zeros((self.hz_len, self.dim_a))
            if init_actions is None
            else jnp.asarray(init_actions, jnp.float32)
        )
        return AMPPIState(a_seq=a_seq)

    def _rollout(self, state, model, acts, params, key):
        s0 = jnp.broadcast_to(state, (*acts.shape[:-2], self.dim_s))
        acts_t = jnp.moveaxis(acts, -2, 0)
        use_keys = key is not None
        keys = (
            jax.random.split(key, self.hz_len)
            if use_keys
            else jnp.zeros((self.hz_len,), dtype=jnp.uint32)
        )

        def step_fn(s, inp):
            a_t, k_t = inp
            s2 = model.step(s, a_t, params, key=k_t if use_keys else None)
            return s2, s2

        _, traj = jax.lax.scan(step_fn, s0, (acts_t, keys))
        traj = jnp.moveaxis(traj, 0, -2)
        return jnp.concatenate([s0[..., None, :], traj], axis=-2)

    def update_actions(self, astate: AMPPIState, state, model, params_dist=None,
                       key=None, ext_actions=None, eps_noise=None):
        """One MPPI update (`amppi.py:227-260`). Returns
        (new_astate, costs, states, acts, omega)."""
        k_eps, k_par, k_roll = (
            jax.random.split(key, 3) if key is not None else (None, None, None)
        )
        if ext_actions is None:
            eps = (
                eps_noise
                if eps_noise is not None
                else jax.random.normal(
                    k_eps, (self.n_samples, self.hz_len, self.dim_a)
                )
                @ self.a_scale_tril.T
            )
            acts = eps + astate.a_seq
        else:
            acts = ext_actions
            eps = acts - astate.a_seq

        utf_weights = None
        if self._tf is not None:
            from .disco import _dist_moments

            mean, cov = _dist_moments(params_dist)
            sp = self._tf.compute_sigma_points(mean, cov)
            params = {
                k: sp[i].reshape(self._tf.pts, 1, 1)
                for i, k in enumerate(model.uncertain_params)
            }
            utf_weights = self._tf.loc_weights
            batched = acts[None]  # [1, n_samples, H, A] -> broadcast over pts
            batched = jnp.broadcast_to(
                batched, (self._tf.pts, self.n_samples, self.hz_len, self.dim_a)
            )
            states = self._rollout(state, model, batched, params, k_roll)
        elif self._params_shape is not None and params_dist is not None:
            draws = params_dist.sample(k_par, (self._params_shape,))
            draws = draws.reshape(self._params_shape, -1)
            # [n, 1] columns broadcast against the [n_samples, S] rollout
            # batch ('single': n=1 shared; 'extended': one per rollout)
            params = {
                k: draws[:, i].reshape(-1, 1)
                for i, k in enumerate(model.uncertain_params)
            }
            # 'single': one draw shared by all rollouts; 'extended': one per
            # rollout — both broadcast against the [n_samples, ...] batch.
            states = self._rollout(state, model, acts, params, k_roll)
        else:
            states = self._rollout(state, model, acts, None, k_roll)

        inst = self.inst_cost_fn(
            states[..., 1:, :],
            jnp.broadcast_to(acts, states[..., 1:, :].shape[:-1] + (self.dim_a,)),
        ).sum(axis=-1)
        term = self.term_cost_fn(states[..., -1, :])
        if utf_weights is not None:
            inst = jnp.tensordot(utf_weights, inst, axes=([0], [0]))
            term = jnp.tensordot(utf_weights, term, axes=([0], [0]))
        ctrl = self.lambda_ * jnp.einsum(
            "ta,ita->i", astate.a_seq @ self.a_pre, eps
        )
        costs = term + inst + ctrl

        beta = costs.min()
        omega = jax.nn.softmax(-(costs - beta) / self.lambda_)
        a_seq = astate.a_seq + jnp.tensordot(omega, eps, axes=1)
        a_seq = jnp.clip(a_seq, self.min_a, self.max_a)
        return astate.replace(a_seq=a_seq), costs, states, acts, omega

    def roll(self, astate: AMPPIState, steps=1):
        """Shift the plan forward, zero-filling (`dust/controllers/base.py:68-80`)."""
        a_seq = jnp.roll(astate.a_seq, -steps, axis=0).at[-steps:].set(0.0)
        return astate.replace(a_seq=a_seq)
