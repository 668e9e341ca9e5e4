"""Multi-policy DISCO / MPPI controller (information-theoretic MPC).

TPU-native redesign of `dust/controllers/disco.py:8-417` (Williams et al.
2017 variant). The reference mutates `a_seq`/`a_mat`/`a_mix` in place and
loops `model.step` over the horizon in Python; here the controller is a
*static* object whose methods are pure functions over an explicit
`DiscoState` pytree, and the rollout is a `lax.scan` over a shaped
[n_params, n_actions, n_pol] batch — one jitted device program, no
host-side flatten/repeat (`disco.py:177-190`) needed: a single sampled
parameter set broadcasts over its whole block of rollouts.

Three parameter-handling modes mirror `disco.py:110-135`:
  * none     — nominal model parameters
  * sampled  — `n_params` draws from the dynamics distribution per call
  * utf      — Merwe sigma points of the dynamics distribution
               (deterministic uncertainty propagation)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..utils.utf import MerweScaledUTF


@struct.dataclass
class DiscoState:
    """Controller state: planned sequence, per-policy plans and weights
    (`disco.py:100-108`)."""

    a_seq: jax.Array  # [H, A]
    a_mat: jax.Array  # [P, H, A]
    a_mix: jax.Array  # [P]


class MultiDisco:
    def __init__(
        self,
        observation_space,
        action_space,
        hz_len,
        n_policies,
        action_samples,
        temperature=1.0,
        ctrl_penalty=1.0,
        a_cov=None,
        inst_cost_fn=None,
        term_cost_fn=None,
        params_sampling=True,
        params_samples=4,
        params_log_space=False,
        scan_unroll=1,
        fused_state_costs=None,
    ):
        self.hz_len = int(hz_len)
        self.dim_s = observation_space.dim
        self.dim_a = action_space.dim
        self.min_a = jnp.asarray(action_space.low)
        self.max_a = jnp.asarray(action_space.high)
        self.n_pol = int(n_policies)
        self.n_actions = int(action_samples)
        self.temp = float(temperature)
        self.a_reg = float(temperature) * (1.0 - float(ctrl_penalty))

        if inst_cost_fn is None and term_cost_fn is None:
            raise ValueError("Specify at least one cost function")
        _null = lambda s, *a, **k: jnp.zeros(s.shape[:-1], s.dtype)
        self.inst_cost_fn = inst_cost_fn or _null
        self.term_cost_fn = term_cost_fn or _null

        a_cov = jnp.eye(self.dim_a) if a_cov is None else jnp.asarray(a_cov)
        self.a_cov = a_cov.astype(jnp.float32)
        self.a_scale_tril = jnp.linalg.cholesky(self.a_cov)
        self.a_pre = jnp.linalg.inv(self.a_cov)

        self._params_log_space = bool(params_log_space)
        self._tf = None
        if params_sampling in (False, None, "none"):
            self.n_params = 1
            self._params_mode = "none"
        elif params_sampling is True:
            self.n_params = int(params_samples)
            self._params_mode = "sampled"
        elif isinstance(params_sampling, MerweScaledUTF):
            if self._params_log_space:
                raise ValueError(
                    "Distribution must not be on log space if using UTF."
                )
            self.n_params = 1
            self._params_mode = "utf"
            self._tf = params_sampling
        else:
            raise ValueError(
                f"Invalid value for 'params_sampling': {params_sampling}"
            )
        self.n_rollouts = self.n_params * self.n_actions * self.n_pol
        # horizon-scan unroll factor: the per-step body is a handful of
        # tiny VPU ops, so unrolling trades code size for scan overhead
        self.scan_unroll = int(scan_unroll)
        # optional fused rollout+state-cost path (e.g. the pendulum Pallas
        # kernel, `ops/pallas_rollout.py`): (state, actions [I, P, H, A],
        # params dict|None) -> state costs [I, P]. Replaces rollout +
        # inst/term evaluation in `forward` for deterministic models; the
        # trajectory tensor is then never materialized.
        self.fused_state_costs = fused_state_costs

    # -- state ------------------------------------------------------------

    def init_state(self, init_actions=None) -> DiscoState:
        a_seq = jnp.zeros((self.hz_len, self.dim_a))
        if init_actions is None:
            a_mat = jnp.zeros((self.n_pol, self.hz_len, self.dim_a))
        else:
            init_actions = jnp.asarray(init_actions, jnp.float32)
            if init_actions.shape != (self.n_pol, self.hz_len, self.dim_a):
                raise ValueError("Initial actions shape mismatch.")
            a_mat = init_actions
        return DiscoState(a_seq=a_seq, a_mat=a_mat, a_mix=jnp.ones(self.n_pol))

    # -- sampling helpers -------------------------------------------------

    def sample_eps(self, key, shape=None):
        """Action-noise draws from N(0, a_cov) with the given leading shape
        (default [n_actions, n_pol, hz_len]) -> [..., dim_a]."""
        if shape is None:
            shape = (self.n_actions, self.n_pol, self.hz_len)
        z = jax.random.normal(key, (*shape, self.dim_a))
        return z @ self.a_scale_tril.T

    def _sample_params(self, key, model, params_dist):
        """n_params draws -> (params dict broadcast to
        [n_params, 1, 1, 1]-style columns, log_probs [n_params])."""
        draws = params_dist.sample(key, (self.n_params,))
        params_log_p = params_dist.log_prob(draws)
        if self._params_log_space:
            draws = jnp.exp(draws)
        draws = draws.reshape(self.n_params, -1)
        params = {
            k: draws[:, i].reshape(self.n_params, 1, 1, 1)
            for i, k in enumerate(model.uncertain_params)
        }
        return params, params_log_p

    # -- rollout (the hot loop, `disco.py:139-209`) -----------------------

    def rollout(self, state, model, actions, params=None, key=None):
        """Scan `model.step` over the horizon for a shaped batch of action
        sequences.

        actions: [..., H, A]; state broadcastable to [..., S].
        Returns states [..., H+1, S] (initial state included, as in
        `disco.py:190-200`).
        """
        batch_shape = actions.shape[:-2]
        s0 = jnp.broadcast_to(state, (*batch_shape, self.dim_s))
        acts_t = jnp.moveaxis(actions, -2, 0)  # [H, ..., A]
        if key is None:
            keys = jnp.zeros((self.hz_len,), dtype=jnp.uint32)  # unused
            use_keys = False
        else:
            keys = jax.random.split(key, self.hz_len)
            use_keys = True

        def step_fn(s, inp):
            a_t, k_t = inp
            s_next = model.step(s, a_t, params, key=k_t if use_keys else None)
            return s_next, s_next

        _, traj = jax.lax.scan(step_fn, s0, (acts_t, keys),
                               unroll=self.scan_unroll)
        traj = jnp.moveaxis(traj, 0, -2)  # [..., H, S]
        return jnp.concatenate([s0[..., None, :], traj], axis=-2)

    # -- cost (`disco.py:294-346`) ----------------------------------------

    def compute_cost(self, dstate: DiscoState, states, actions,
                     utf_weights=None):
        """states [n_params|pts, n_actions, n_pol, H+1, S],
        actions [n_actions, n_pol, H, A] -> costs [n_actions, n_pol].

        The control-penalty term derives its eps from the *planned
        sequence* (actions - a_seq), exactly as the reference recomputes
        it inside `_compute_cost` (`disco.py:338-340`) regardless of how
        the actions were sampled."""
        inst = self.inst_cost_fn(states[..., :-1, :],
                                 jnp.broadcast_to(actions, states[..., :-1, :].shape[:-1] + (self.dim_a,)))
        term = self.term_cost_fn(states[..., -1, :])
        if utf_weights is not None:
            # sigma-weighted expectation over the leading sigma-point axis
            inst = jnp.tensordot(utf_weights, inst, axes=([0], [0]))
            term = jnp.tensordot(utf_weights, term, axes=([0], [0]))
            state_cost = inst.sum(axis=-1) + term
        else:
            state_cost = (inst.sum(axis=-1) + term).mean(axis=0)

        return state_cost + self._ctrl_penalty(dstate, actions)

    def _ctrl_penalty(self, dstate: DiscoState, actions):
        """Control penalty: a_reg * sum_{t,a} -eps_ctrl * (a_mat @ a_pre),
        the tensordot-trace trick of `disco.py:332-346` without the
        n_pol x n_pol cross product."""
        eps_ctrl = actions - dstate.a_seq
        m = dstate.a_mat @ self.a_pre  # [P, H, A]
        return self.a_reg * jnp.einsum("ipta,pta->ip", -eps_ctrl, m)

    # -- forward (`disco.py:348-394`) -------------------------------------

    def forward(self, dstate: DiscoState, state, model, params_dist=None,
                key=None, ext_actions=None, eps_noise=None,
                params_override=None):
        """One controller update. Returns
        (new_dstate, costs, states, actions, omega, params_log_p).

        `eps_noise` lets callers/tests inject the exact action noise
        (replaces the internal N(0, a_cov) draw). `params_override` (a
        dict of traced scalars/columns, nominal-params mode only) rolls
        out under those dynamics parameters — how the harness runs the
        "exact model" baselines without baking per-episode constants into
        the compiled program.
        """
        k_eps, k_par, k_roll = (
            jax.random.split(key, 3) if key is not None else (None, None, None)
        )

        if ext_actions is None:
            eps = eps_noise if eps_noise is not None else self.sample_eps(k_eps)
            actions = eps + dstate.a_mat  # [n_actions, n_pol, H, A]
        else:
            actions = ext_actions
            eps = actions - dstate.a_seq

        utf_weights = None
        if self._params_mode == "sampled":
            params, params_log_p = self._sample_params(k_par, model, params_dist)
            batched = jnp.broadcast_to(
                actions[None], (self.n_params, *actions.shape)
            )
        elif self._params_mode == "utf":
            mean, cov = _dist_moments(params_dist)
            sp = self._tf.compute_sigma_points(mean, cov)  # [d, pts]
            params = {
                k: sp[i].reshape(self._tf.pts, 1, 1, 1)
                for i, k in enumerate(model.uncertain_params)
            }
            # log-prob of each sigma point, averaged with location weights
            # (`disco.py:285-292`)
            params_log_p = params_dist.log_prob(sp.T) @ self._tf.loc_weights
            utf_weights = self._tf.loc_weights
            batched = jnp.broadcast_to(
                actions[None], (self._tf.pts, *actions.shape)
            )
        else:
            params, params_log_p = params_override, None
            batched = actions[None]

        if self.fused_state_costs is not None and utf_weights is None:
            # fused rollout+cost kernel: trajectories never materialize
            # (deterministic-model path; the kernel ignores k_roll)
            state_cost = self.fused_state_costs(state, actions, params)
            costs = state_cost + self._ctrl_penalty(dstate, actions)
            states = None
        else:
            states = self.rollout(state, model, batched, params, key=k_roll)
            costs = self.compute_cost(dstate, states, actions, utf_weights)

        # softmax weighting (`disco.py:380-393`): per-policy normalizer over
        # the action-sample axis, exact max-subtraction order preserved.
        beta = costs.min()
        log_costs = -(costs - beta) / self.temp
        eta = jax.nn.logsumexp(log_costs, axis=0)          # [P]
        omega = jnp.exp(log_costs - eta)                   # [n_actions, P]
        delta = jnp.einsum("ip,ipta->pta", omega, eps)
        new_state = dstate.replace(
            a_mat=dstate.a_mat + delta,
            a_mix=jnp.exp(eta - jax.nn.logsumexp(eta)),
        )
        return new_state, costs, states, actions, omega, params_log_p

    # -- step (`disco.py:396-417`) ----------------------------------------

    def step(self, dstate: DiscoState, strategy="argmax", steps=1,
             ext_actions=None):
        """Pick the executed sequence, clip, and roll the plan. Returns
        (new_dstate, next_actions [steps, A]).

        Deviation from the reference: `disco.py:401` takes `a_mat[argmax]`
        as a torch *view* and then clamps it in place, accidentally
        clipping that policy's row of `a_mat` too. We keep `a_mat`
        untouched (the mathematically intended behavior)."""
        if strategy == "argmax":
            a_seq = dstate.a_mat[jnp.argmax(dstate.a_mix)]
        elif strategy == "average":
            a_seq = jnp.einsum("p,pta->ta", dstate.a_mix, dstate.a_mat)
        elif strategy == "external" and ext_actions is not None:
            a_seq = jnp.asarray(ext_actions)
        else:
            raise ValueError("Invalid value for strategy.")
        a_seq = jnp.clip(a_seq, self.min_a, self.max_a)
        next_actions = a_seq[:steps]
        a_seq = jnp.roll(a_seq, -steps, axis=0).at[-steps:].set(0.0)
        a_mat = jnp.roll(dstate.a_mat, -steps, axis=1).at[:, -steps:].set(0.0)
        return dstate.replace(a_seq=a_seq, a_mat=a_mat), next_actions


def _dist_moments(params_dist):
    """(mean, covariance) of a distribution for sigma-point construction
    (`disco.py:240-250` duck typing)."""
    mean = params_dist.mean
    cov = getattr(params_dist, "covariance", None)
    if cov is None:
        # fall back to a diagonal of per-dim variances
        var = getattr(params_dist, "variance", None)
        if var is None:
            if hasattr(params_dist, "scale"):
                var = jnp.square(params_dist.scale)
            elif hasattr(params_dist, "low"):
                var = jnp.square(params_dist.high - params_dist.low) / 12.0
            else:
                raise AttributeError(
                    "params_dist exposes neither covariance nor variance"
                )
        cov = jnp.diag(jnp.atleast_1d(var))
    elif callable(cov):
        cov = cov()
    return jnp.atleast_1d(mean), cov
