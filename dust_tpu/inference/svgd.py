"""Generic Stein variational gradient descent.

TPU-native counterpart of `dust/inference/svgd.py:102-187`. The reference
injects -phi into a torch optimizer per step in a Python loop with autograd
score functions; here the whole optimize loop is a `lax.scan` over optax
updates with `jax.grad` score functions — one jitted device program.

Sign conventions, for the record (they matter downstream): with
K_ij = k(x_i, x_j) and G_i = grad_{x_i} sum_j k(x_i, x_j) (gradient through
the *first* kernel argument), the standard SVGD repulsion term is -G (push
particles apart). The reference's base class uses -G (`svgd.py:131`), but
its SVMPC-rbf and MPF paths use +G with no 1/n (`svmpc.py:82-83`,
`mpf.py:54-56`) — an attraction quirk those classes expose behind a
`reference_compat` flag.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..ops.bandwidth import bw_median
from ..ops.kernels import rbf_gram, rbf_gram_and_grad


class SVGD:
    """Functional SVGD: all methods are pure; particle state is the array
    you pass in."""

    def __init__(self, bw_scale=1.0, n_particles=None, n_steps=100,
                 optimizer=None, lr=1e-2):
        self.bw_scale = float(bw_scale)
        self.n_particles = n_particles
        self.n_steps = int(n_steps)
        self.optimizer = optimizer if optimizer is not None else optax.adam(lr)

    def phi(self, x, log_p_fn, bw):
        """Stein direction (`svgd.py:127-135`): ((K @ score) - G) / n with
        the repulsion sign of the reference base class."""
        score = jax.grad(lambda xs: jnp.sum(log_p_fn(xs)))(x)
        flat = x.reshape(x.shape[0], -1)
        k, grad_first = rbf_gram_and_grad(flat, flat, bw)
        grad_k = -grad_first.reshape(x.shape)
        return (jnp.tensordot(k, score, axes=1) + grad_k) / x.shape[0]

    def step(self, x, opt_state, log_p_fn, bw):
        updates, opt_state = self.optimizer.update(
            -self.phi(x, log_p_fn, bw), opt_state, x
        )
        return optax.apply_updates(x, updates), opt_state

    def optimize(self, log_p_fn, initial_particles=None, prior=None, key=None,
                 bw=None, n_steps=None):
        """Fixed-point loop (`svgd.py:155-187`): by default the bandwidth
        comes from the median trick once up front, then n_steps
        optimizer-mediated updates. Returns the final particles.

        Note: the reference applies the median trick *unconditionally*
        whenever its default kernel is active, making its `bw` argument
        dead (`svgd.py:174-175`; PARITY.md #17). Here an explicitly passed
        `bw` is honored; `bw=None` (default) reproduces the reference's
        effective behavior."""
        if initial_particles is not None:
            x = jnp.asarray(initial_particles)
        elif prior is not None:
            if key is None:
                raise ValueError("prior sampling requires a PRNG key")
            x = prior.sample(key, (self.n_particles,))
        else:
            raise RuntimeError(
                "Either initial_particles or prior must be specified for SVGD"
            )
        if bw is None:
            flat = x.reshape(x.shape[0], -1)
            bw = bw_median(flat, flat, self.bw_scale)

        opt_state = self.optimizer.init(x)
        n = self.n_steps if n_steps is None else n_steps

        def body(carry, _):
            xi, osi = carry
            xi, osi = self.step(xi, osi, log_p_fn, bw)
            return (xi, osi), None

        (x, _), _ = jax.lax.scan(body, (x, opt_state), None, length=n)
        return x

    def score_matrix(self, x, log_p_fn):
        return jax.grad(lambda xs: jnp.sum(log_p_fn(xs)))(x)

    def discrepancy(self, x, log_p_fn):
        """Kernelized Stein discrepancy estimate (`svgd.py:147-153`)."""
        s = self.score_matrix(x, log_p_fn)
        flat = x.reshape(x.shape[0], -1)
        s = s.reshape(s.shape[0], -1)
        bw = bw_median(flat, flat)
        k = rbf_gram(flat, flat, bw)
        sst = s @ s.T
        d = flat.shape[1]
        return jnp.sqrt(jnp.mean(k * (sst + d / bw**2)))
