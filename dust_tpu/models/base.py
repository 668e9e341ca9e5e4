"""Base dynamics-model protocol.

TPU-native redesign of `dust/models/base.py:6-183`. A model here is a
*static* Python object (closed over by jit) exposing one pure, batched
transition function:

    step(states [..., S], actions [..., A], params=None, key=None) -> [..., S]

`params` is a dict of arrays keyed by `uncertain_params` that broadcast
against the batch axes (the reference passes [R, 1] columns; our rollout
passes [n_params, 1, 1, 1] so one sampled parameter set applies to a whole
block of rollouts without materialising repeats). `key` threads explicit
PRNG randomness for stochastic models (the reference hides this in
`torch.randn_like`, `dust/models/particle.py:147`).

Models are deliberately *not* environments: they hold no state
(`dust/models/base.py:9-17`), which is what makes `vmap`/`scan`/`shard_map`
composition over thousands of rollouts possible.
"""

from __future__ import annotations

from abc import ABC, abstractmethod

import jax.numpy as jnp
import numpy as np


class BaseModel(ABC):
    def __init__(self, dt=0.05, params_dict=None, uncertain_params=None):
        if dt <= 0:
            raise ValueError("Delta t must be greater than zero.")
        self._dt = float(dt)
        self._params_dict = dict(params_dict or {})
        self._params_keys = tuple(uncertain_params) if uncertain_params else None

    @property
    def dt(self):
        return self._dt

    @property
    def params_dict(self):
        """Default (nominal) parameter values."""
        return self._params_dict

    @params_dict.setter
    def params_dict(self, params_dict):
        self._params_dict = dict(params_dict)

    @property
    def uncertain_params(self):
        return self._params_keys

    @property
    @abstractmethod
    def observation_space(self):
        ...

    @property
    @abstractmethod
    def action_space(self):
        ...

    @abstractmethod
    def step(self, states, actions, params=None, key=None):
        """Batched transition function; see module docstring."""
        ...

    # -- parameter plumbing (`dust/models/base.py:149-183`) ----------------

    def resolve_params(self, params):
        """Merge a sampled-params dict over the defaults, returning the
        model's full ordered parameter tuple (values broadcastable against
        the batch)."""
        merged = dict(self._params_dict)
        if params is not None:
            for key, value in params.items():
                merged[key] = value
        return tuple(merged.values())

    def params_to_dict(self, params):
        """[n, P] array of sampled uncertain params -> dict of [n, 1]
        columns keyed by `uncertain_params`."""
        params = jnp.asarray(params)
        if params.ndim == 1:
            params = params[:, None]
        return {
            key: params[:, idx].reshape(-1, 1)
            for idx, key in enumerate(self._params_keys)
        }

    def dict_to_params(self, params_dict):
        return jnp.concatenate(
            [jnp.reshape(params_dict[key], (-1, 1)) for key in self._params_keys],
            axis=1,
        )

    def set_params_from_dist(self, params_dist):
        mean = np.asarray(params_dist.mean)
        for idx, key in enumerate(self._params_keys):
            self._params_dict[key] = float(np.atleast_1d(mean)[idx])

    def sample_params(self, key, params_dist, num_samples, x_min=-np.inf,
                      x_max=np.inf, max_rounds=16):
        """Bounded parameter samples as a dict (the reference's rejection
        sampling, `dust/models/base.py:102-171`), jit-safe: a fixed number
        of masked resampling rounds replaces the data-dependent while loop."""
        import jax

        dim = len(self._params_keys)
        keys = jax.random.split(key, max_rounds)
        samples = params_dist.sample(keys[0], (num_samples,)).reshape(
            num_samples, dim
        )
        for k in keys[1:]:
            fresh = params_dist.sample(k, (num_samples,)).reshape(num_samples, dim)
            bad = jnp.any((samples <= x_min) | (samples >= x_max), axis=1)
            samples = jnp.where(bad[:, None], fresh, samples)
        return {
            key: samples[:, idx].reshape(-1, 1)
            for idx, key in enumerate(self._params_keys)
        }
