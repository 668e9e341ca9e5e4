"""Particle-axis sharded SVGD: the tensor-parallel analogue.

The SVGD Gram matrix [m, m] is the one quadratic object in the framework
(SURVEY.md §5.7 — the "attention matrix" of this workload). For large
particle counts it shards by rows: each device owns m/p particles,
`all_gather`s the (small, [m, d]) particle and score tensors over ICI,
and computes only its row-block of K and the fused contractions —
blockwise-Gram compute, O(m^2/p) per device, with a single gather as the
only collective (`dust/kernels/base_kernels.py:91-108` is the reference
op being sharded).

`ShardedMPF` applies this to the dynamics posterior: the GMM prior around
the particles is the second O(m^2) object, handled the same way (local
particles scored against all gathered component centers).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from ..inference.mpf import MPF, MPFState


def make_sharded_svgd_phi(mesh, axis="particle"):
    """Returns phi(x [m, d], score [m, d], bw) with x/score sharded on
    `axis`; output sharded the same way. Standard SVGD sign/scale."""

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P()),
        out_specs=P(axis),
    )
    def phi(x_local, score_local, bw):
        x_all = jax.lax.all_gather(x_local, axis, tiled=True)       # [m, d]
        s_all = jax.lax.all_gather(score_local, axis, tiled=True)   # [m, d]
        m = x_all.shape[0]
        inv = 1.0 / (bw * bw)
        # center by the (replicated) global mean: the Gram identity's
        # cancellation error grows with ||x||^2 while bw tracks only
        # the spread — see ops/distance.py for the failure mode. K and
        # the repulsion term are translation invariant, so this is
        # exact. Same shift on every device (x_all is replicated).
        mu = jax.lax.stop_gradient(jnp.mean(x_all, axis=0,
                                            keepdims=True))
        x_local = x_local - mu
        x_all = x_all - mu
        # local row-block of K: [ml, m]
        d2 = (
            jnp.sum(x_local**2, axis=1, keepdims=True)
            + jnp.sum(x_all**2, axis=1)[None, :]
            - 2.0 * jnp.dot(x_local, x_all.T,
                            preferred_element_type=jnp.float32)
        )
        k = jnp.exp(-jnp.maximum(d2, 0.0) * 0.5 * inv)
        drive = jnp.dot(k, s_all, preferred_element_type=jnp.float32)
        kx = jnp.dot(k, x_all, preferred_element_type=jnp.float32)
        rows = jnp.sum(k, axis=1, keepdims=True)
        repel = (rows * x_local - kx) * inv
        return (drive + repel) / m

    return phi


def make_sharded_gmm_score(mesh, axis="particle"):
    """Row-blocked GMM prior score: grad_x log p(x) for the
    particle-centered mixture, with x AND the component centers
    sharded on `axis`.

    The responsibilities matrix [m, m] is the framework's second
    quadratic object (module docstring); left to GSPMD it was the
    bottleneck of cross-process ShardedMPF (r4 gloo proxy: 60%/31%
    strong-scaling efficiency at P=2/4 with only the kernel Gram
    hand-sharded; the prior's [m, m] component log-probs were being
    assembled through unpartitioned intermediates). Here each device
    gathers the (small, [m, d]) centers once and computes only its
    row block — the same one-gather blockwise-Gram contract as
    `make_sharded_svgd_phi`. Math is `distributions.GMM.score`
    verbatim (shared [d, d] scale_tril, 1-D event), row-blocked.
    """
    from ..distributions import (
        _LOG_2PI,
        _tril_log_det,
        _tril_solve,
        _tril_solve_t,
    )

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P()),
        out_specs=P(axis),
    )
    def gmm_score(x_local, locs_local, logits_local, scale_tril):
        locs_all = jax.lax.all_gather(locs_local, axis, tiled=True)
        logits_all = jax.lax.all_gather(logits_local, axis, tiled=True)
        d = locs_all.shape[-1]
        log_w = jax.nn.log_softmax(logits_all)
        diff = x_local[:, None, :] - locs_all[None, :, :]  # [ml, m, d]
        z = _tril_solve(scale_tril, diff)
        maha = jnp.sum(z * z, axis=-1)                     # [ml, m]
        lp = -0.5 * (maha + d * _LOG_2PI) - _tril_log_det(scale_tril)
        r = jax.nn.softmax(lp + log_w, axis=-1)
        mean_c = jnp.dot(r, locs_all,
                         preferred_element_type=jnp.float32)
        diff2 = mean_c - x_local
        return _tril_solve_t(scale_tril,
                             _tril_solve(scale_tril, diff2))

    return gmm_score


class ShardedMPF(MPF):
    """MPF whose SVGD update shards the particle axis over a mesh.

    Semantically identical to `MPF(reference_compat=False)` — verified
    shard-vs-single-device in tests/test_sharding.py — but every [m, m]
    object (kernel Gram, GMM-prior scoring) is computed blockwise per
    device. Intended for the 'large particle counts' configuration
    (BASELINE.json #4) where m reaches thousands.
    """

    def __init__(self, likelihood, mesh, axis="particle", **kwargs):
        kwargs.pop("reference_compat", None)
        super().__init__(likelihood, reference_compat=False, **kwargs)
        self.mesh = mesh
        self.axis = axis
        self._sharding = NamedSharding(mesh, P(axis))
        self._phi_rows = make_sharded_svgd_phi(mesh, axis)
        self._gmm_score = make_sharded_gmm_score(mesh, axis)

    def shard_state(self, mstate: MPFState) -> MPFState:
        """Place the particle-axis leaves on the mesh."""
        x = jax.device_put(mstate.x, self._sharding)
        opt_state = jax.tree_util.tree_map(
            lambda leaf: (
                jax.device_put(leaf, self._sharding)
                if hasattr(leaf, "shape") and leaf.shape[:1] == x.shape[:1]
                else leaf
            ),
            mstate.opt_state,
        )
        return mstate.replace(x=x, opt_state=opt_state)

    def phi(self, mstate: MPFState, bw):
        x = mstate.x
        prior = mstate.prior
        if prior.scale_tril.ndim == 2 and x.ndim == 2 \
                and prior.locs.shape == x.shape:
            # the particle-centered mixture: row-blocked [m, m] score
            # with a single centers gather (see make_sharded_gmm_score)
            grad_prior = self._gmm_score(x, prior.locs, prior.logits,
                                         prior.scale_tril)
        else:   # batched scale_tril / exotic priors: exact GSPMD path
            grad_prior = prior.score(x)

        def log_lik(t):
            pred = self.likelihood.sample(mstate.lik, t)
            return jnp.sum(self.likelihood.log_prob(mstate.lik, pred))

        grad_lik = jax.grad(log_lik)(x)
        score = grad_lik + grad_prior
        return self._phi_rows(x, score, jnp.asarray(bw, jnp.float32))
