"""Hand-rolled pytree probability distributions.

The reference delegates to `torch.distributions` (MultivariateNormal,
MixtureSameFamily, Independent, Uniform, Normal, Categorical). A TPU-native
engine needs explicit-PRNG, jit-compatible equivalents that live in pytrees
so they can be carried through `lax.scan` loops and sharded — this module
provides exactly the family the reference uses:

* `MVN`          — full-covariance Gaussian on the last axis
* `Normal`       — elementwise Gaussian with `event_ndims` reinterpretation
                   (covers `Independent(Normal(...), k)`)
* `Uniform`      — box uniform with `event_ndims` reinterpretation
* `GMM`          — mixture of Gaussians whose components share one covariance
                   applied to the last axis, independent over middle axes;
                   covers both the reference's policy prior
                   (`Independent(MultivariateNormal(x, cov), 1)` over
                   particles [m, H, A], `dust/inference/svgd.py:84-89`) and
                   the MPF prior (`dust/inference/mpf.py:26-38`).

All distributions are `flax.struct` dataclasses: immutable pytrees whose
array leaves trace through jit, with static metadata as aux data.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import struct

_LOG_2PI = math.log(2.0 * math.pi)


def _tril_solve(scale_tril, x):
    """Solve L z = x for z along the last axis (x: [..., d]).

    `scale_tril` is either a shared [d, d] factor (flatten-and-solve, one
    MXU-friendly triangular solve over the whole batch) or batched with
    matching leading dims.
    """
    if scale_tril.ndim == 2:
        d = x.shape[-1]
        flat = x.reshape(-1, d)
        z = jax.scipy.linalg.solve_triangular(scale_tril, flat.T, lower=True)
        return z.T.reshape(x.shape)
    return jax.scipy.linalg.solve_triangular(
        scale_tril, x[..., None], lower=True
    )[..., 0]


def _tril_solve_t(scale_tril, x):
    """Solve L^T z = x along the last axis (the second half of applying
    Sigma^-1 = L^-T L^-1); same batching contract as _tril_solve."""
    if scale_tril.ndim == 2:
        d = x.shape[-1]
        flat = x.reshape(-1, d)
        z = jax.scipy.linalg.solve_triangular(scale_tril.T, flat.T,
                                              lower=False)
        return z.T.reshape(x.shape)
    return jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(scale_tril, -1, -2), x[..., None], lower=False
    )[..., 0]


def _tril_log_det(scale_tril):
    return jnp.sum(jnp.log(jnp.diagonal(scale_tril, axis1=-2, axis2=-1)), axis=-1)


@struct.dataclass
class MVN:
    """Multivariate normal over the last axis; `scale_tril` is a Cholesky
    factor of the covariance, shared across (or broadcast over) batch dims.
    """

    loc: jax.Array          # [..., d]
    scale_tril: jax.Array   # [..., d, d]

    @classmethod
    def from_cov(cls, loc, cov):
        loc = jnp.asarray(loc, dtype=jnp.float32)
        cov = jnp.asarray(cov, dtype=jnp.float32)
        return cls(loc=loc, scale_tril=jnp.linalg.cholesky(cov))

    @property
    def event_shape(self):
        return self.loc.shape[-1:]

    @property
    def mean(self):
        return self.loc

    @property
    def covariance(self):
        return self.scale_tril @ jnp.swapaxes(self.scale_tril, -1, -2)

    def log_prob(self, x):
        d = self.loc.shape[-1]
        z = _tril_solve(self.scale_tril, x - self.loc)
        maha = jnp.sum(z * z, axis=-1)
        return -0.5 * (maha + d * _LOG_2PI) - _tril_log_det(self.scale_tril)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.loc.shape
        eps = jax.random.normal(key, shape, dtype=self.loc.dtype)
        return self.loc + jnp.einsum("...ij,...j->...i", self.scale_tril, eps)


@struct.dataclass
class Normal:
    """Elementwise Gaussian. With `event_ndims=k`, `log_prob` sums over the
    trailing k axes (the reference's `Independent(Normal, k)`)."""

    loc: jax.Array
    scale: jax.Array
    event_ndims: int = struct.field(pytree_node=False, default=0)

    @property
    def mean(self):
        return self.loc

    @property
    def event_shape(self):
        loc = jnp.broadcast_shapes(jnp.shape(self.loc), jnp.shape(self.scale))
        return loc[len(loc) - self.event_ndims:]

    def log_prob(self, x):
        z = (x - self.loc) / self.scale
        lp = -0.5 * (z * z + _LOG_2PI) - jnp.log(self.scale)
        if self.event_ndims:
            lp = jnp.sum(lp, axis=tuple(range(-self.event_ndims, 0)))
        return lp

    def sample(self, key, sample_shape=()):
        base = jnp.broadcast_shapes(jnp.shape(self.loc), jnp.shape(self.scale))
        shape = tuple(sample_shape) + base
        eps = jax.random.normal(key, shape, dtype=jnp.result_type(self.loc))
        return self.loc + self.scale * eps


@struct.dataclass
class Uniform:
    """Box uniform on [low, high). With `event_ndims=k`, log_prob sums over
    the trailing k axes (`Independent(Uniform(lo, hi), k)` in the demo,
    `demo/pendulum_example.py:81-83`)."""

    low: jax.Array
    high: jax.Array
    event_ndims: int = struct.field(pytree_node=False, default=0)

    @property
    def mean(self):
        return (self.low + self.high) / 2.0

    def log_prob(self, x):
        inside = (x >= self.low) & (x < self.high)
        lp = jnp.where(inside, -jnp.log(self.high - self.low), -jnp.inf)
        if self.event_ndims:
            lp = jnp.sum(lp, axis=tuple(range(-self.event_ndims, 0)))
        return lp

    def sample(self, key, sample_shape=()):
        base = jnp.broadcast_shapes(jnp.shape(self.low), jnp.shape(self.high))
        shape = tuple(sample_shape) + base
        u = jax.random.uniform(key, shape, dtype=jnp.result_type(self.low, 1.0))
        return self.low + (self.high - self.low) * u


@struct.dataclass
class GMM:
    """Mixture of Gaussians with one shared covariance on the last axis.

    `locs` has shape [k, *event]; a Gaussian with Cholesky factor
    `scale_tril` ([d, d], d = event[-1]) sits at each component mean, and the
    middle event axes are treated as independent (log-probs summed). This is
    exactly `MixtureSameFamily(Categorical(w),
    Independent(MultivariateNormal(x, cov), x.ndim - 2))` from the reference
    (`dust/inference/svgd.py:84-89`, `dust/inference/mpf.py:30-38`).
    """

    locs: jax.Array        # [k, *event]
    scale_tril: jax.Array  # [d, d]
    logits: jax.Array      # [k]

    @classmethod
    def from_cov(cls, locs, weights, cov):
        locs = jnp.asarray(locs, dtype=jnp.float32)
        cov = jnp.asarray(cov, dtype=jnp.float32)
        weights = jnp.asarray(weights, dtype=jnp.float32)
        logits = jnp.log(weights) - jax.nn.logsumexp(jnp.log(weights))
        return cls(locs=locs, scale_tril=jnp.linalg.cholesky(cov), logits=logits)

    @property
    def n_components(self):
        return self.locs.shape[0]

    @property
    def event_shape(self):
        return self.locs.shape[1:]

    @property
    def mean(self):
        w = jax.nn.softmax(self.logits)
        return jnp.tensordot(w, self.locs, axes=1)

    def _component_log_prob(self, x):
        """log N(x | locs_k, Sigma) summed over all event axes.

        x: [..., *event] -> [..., k]
        """
        d = self.locs.shape[-1]
        n_event = self.locs.ndim - 1
        # x[..., None, *event] - locs[k, *event] -> [..., k, *event]
        diff = jnp.expand_dims(x, axis=-n_event - 1) - self.locs
        z = _tril_solve(self.scale_tril, diff)
        maha = jnp.sum(z * z, axis=-1)
        lp = -0.5 * (maha + d * _LOG_2PI) - _tril_log_det(self.scale_tril)
        # sum independent middle axes, keeping the component axis
        if n_event > 1:
            lp = jnp.sum(lp, axis=tuple(range(-(n_event - 1), 0)))
        return lp

    def log_prob(self, x):
        log_w = jax.nn.log_softmax(self.logits)
        return jax.nn.logsumexp(self._component_log_prob(x) + log_w, axis=-1)

    def score(self, x):
        """grad_x log p(x), closed form: sum_k r_k(x) Sigma^-1 (c_k - x)
        with responsibilities r = softmax(component log-probs + log w).
        Identical to jax.grad(log_prob) (tested) with a much shorter op
        chain — the hot path of every SVGD prior gradient."""
        log_w = jax.nn.log_softmax(self.logits)
        r = jax.nn.softmax(self._component_log_prob(x) + log_w, axis=-1)
        # responsibility-weighted mean of component centers: [..., *event]
        mean_c = jnp.tensordot(r, self.locs, axes=[[-1], [0]])
        diff = mean_c - x
        # apply Sigma^-1 on the last axis: solve L L^T z = diff
        return _tril_solve_t(self.scale_tril, _tril_solve(self.scale_tril,
                                                          diff))

    def sample(self, key, sample_shape=()):
        k_cat, k_norm = jax.random.split(key)
        shape = tuple(sample_shape)
        idx = jax.random.categorical(k_cat, self.logits, shape=shape)
        means = self.locs[idx]  # [*shape, *event]
        eps = jax.random.normal(key=k_norm, shape=means.shape, dtype=means.dtype)
        return means + jnp.einsum("ij,...j->...i", self.scale_tril, eps)
