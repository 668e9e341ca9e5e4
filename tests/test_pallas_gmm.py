"""Streaming GMM-prior score kernel vs jnp oracle + FusedMPF vs plain MPF
(interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dust_tpu.inference import GaussianLikelihood, MPF
from dust_tpu.inference.mpf import FusedMPF
from dust_tpu.models import PendulumModel
from dust_tpu.ops.pallas_gmm import (
    gmm_prior_score_pallas,
    gmm_prior_score_reference,
)
from dust_tpu.distributions import GMM


@pytest.mark.parametrize("m,k,d", [(64, 64, 2), (200, 130, 3), (300, 300, 5)])
def test_streaming_gmm_score_matches_oracle(rng, m, k, d):
    x = jnp.asarray(rng.normal(size=(m, d)).astype(np.float32))
    centers = jnp.asarray(rng.normal(size=(k, d)).astype(np.float32))
    bw = 0.4
    oracle = gmm_prior_score_reference(x, centers, bw)
    fused = gmm_prior_score_pallas(x, centers, bw, block_i=128, block_k=128,
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(oracle),
                               rtol=1e-4, atol=1e-4)


def test_oracle_matches_gmm_autograd(rng):
    """The streaming formula == jax.grad through GMM.log_prob."""
    m, d = 40, 2
    x = jnp.asarray(rng.normal(size=(m, d)).astype(np.float32))
    centers = jnp.asarray(rng.normal(size=(m, d)).astype(np.float32))
    bw = 0.5
    gmm = GMM.from_cov(centers, jnp.ones(m), bw**2 * jnp.eye(d))
    auto = jax.grad(lambda t: jnp.sum(gmm.log_prob(t)))(x)
    closed = gmm_prior_score_reference(x, centers, bw)
    np.testing.assert_allclose(np.asarray(closed), np.asarray(auto),
                               rtol=1e-4, atol=1e-4)


def test_fused_mpf_matches_plain_mpf(rng):
    model = PendulumModel(uncertain_params=("length", "mass"))
    lik = GaussianLikelihood(obs_std=0.1, model=model)
    init = rng.uniform(0.6, 1.3, size=(64, 2)).astype(np.float32)
    obs = np.array([2.8, -0.2], dtype=np.float32)
    action = jnp.array([0.8])
    new_obs = jnp.array([2.7, -0.5])

    plain = MPF(likelihood=lik, optimizer=optax.sgd(1e-3))
    fused = FusedMPF(likelihood=lik, optimizer=optax.sgd(1e-3),
                     interpret=True)

    ms_p = plain.init_state(init, obs, dim_a=1, bw=0.2)
    ms_f = fused.init_state(init, obs, dim_a=1, bw=0.2)
    ms_p, g_p, _ = plain.optimize(ms_p, action, new_obs, bw=0.3, n_steps=4)
    ms_f, g_f, _ = fused.optimize(ms_f, action, new_obs, bw=0.3, n_steps=4)

    np.testing.assert_allclose(np.asarray(ms_f.x), np.asarray(ms_p.x),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_p), rtol=1e-3)


def test_streaming_gmm_score_far_from_origin(rng):
    """The GMM score is invariant under a common shift of particles
    and centers; the wrapper centers both so the streaming kernel's
    MXU Gram identity stays spread-scale far from the origin."""
    m, k, d = 192, 192, 2
    x = jnp.asarray(rng.normal(size=(m, d)).astype(np.float32)) * 0.3
    c = jnp.asarray(rng.normal(size=(k, d)).astype(np.float32)) * 0.3
    bw = 0.4
    near = gmm_prior_score_pallas(x, c, bw, block_i=128, block_k=128,
                                  interpret=True)
    far = gmm_prior_score_pallas(x + 3000.0, c + 3000.0, bw,
                                 block_i=128, block_k=128,
                                 interpret=True)
    # tolerance reflects f32 input quantization of the offset data
    # (~3000 * 2^-23 per coordinate); uncentered this diverges by O(1)
    np.testing.assert_allclose(np.asarray(far), np.asarray(near),
                               atol=5e-3)


@pytest.mark.parametrize("m,k,d", [(64, 64, 2), (200, 130, 3),
                                   (300, 300, 1)])
def test_streaming_gmm_score_packed_matches_oracle(rng, m, k, d):
    """Packed layout (r3: explicit-diff logits + one [centers | ones]
    matmul per tile) == oracle, incl. ragged padding."""
    from dust_tpu.ops.pallas_gmm import gmm_prior_score_pallas_packed

    x = jnp.asarray(rng.normal(size=(m, d)).astype(np.float32)) + 0.8
    centers = jnp.asarray(rng.normal(size=(k, d)).astype(np.float32))
    oracle = gmm_prior_score_reference(x, centers, 0.4)
    fused = gmm_prior_score_pallas_packed(x, centers, 0.4, block_i=128,
                                          block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(oracle),
                               rtol=1e-4, atol=1e-4)


def test_fused_mpf_gram_layout_matches_packed(rng):
    """Both FusedMPF kernel layouts produce the same optimize
    trajectory (packed=True is the r3 default; packed=False keeps the
    r2 gram-identity tiles)."""
    model = PendulumModel(uncertain_params=("length", "mass"))
    lik = GaussianLikelihood(obs_std=0.1, model=model)
    init = rng.uniform(0.6, 1.3, size=(64, 2)).astype(np.float32)
    obs = np.array([2.8, -0.2], dtype=np.float32)

    outs = []
    for packed in (False, True):
        mpf = FusedMPF(likelihood=lik, optimizer=optax.sgd(1e-3),
                       interpret=True, packed=packed)
        ms = mpf.init_state(init, obs, dim_a=1, bw=0.2)
        ms, g, _ = mpf.optimize(ms, jnp.array([0.8]),
                                jnp.array([2.7, -0.5]), bw=0.3,
                                n_steps=4)
        outs.append((ms.x, g))
    np.testing.assert_allclose(np.asarray(outs[0][0]),
                               np.asarray(outs[1][0]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(outs[0][1]),
                               np.asarray(outs[1][1]), rtol=1e-3)


def test_fused_mpf_stream_fusion_matches_plain_mpf(rng):
    """fuse_streams (r5, VERDICT r4 #2): each SVGD iteration as ONE
    Pallas program (phi_t + the next iteration's GMM prior score,
    row-pipelined with a shared packed j-stream operand,
    ops/pallas_mpf_stream.py) must reproduce the plain MPF optimize
    trajectory. Small block sizes force a multi-block grid so the row
    pipeline's scratch handoff and the gp online-softmax both cross
    block boundaries."""
    model = PendulumModel(uncertain_params=("length", "mass"))
    lik = GaussianLikelihood(obs_std=0.1, model=model)
    init = rng.uniform(0.6, 1.3, size=(200, 2)).astype(np.float32)
    obs = np.array([2.8, -0.2], dtype=np.float32)
    action = jnp.array([0.8])
    new_obs = jnp.array([2.7, -0.5])

    plain = MPF(likelihood=lik, optimizer=optax.sgd(1e-3))
    ms_p = plain.init_state(init, obs, dim_a=1, bw=0.2)
    ms_p, g_p, _ = plain.optimize(ms_p, action, new_obs, bw=0.3,
                                  n_steps=4)

    from dust_tpu.ops import pallas_mpf_stream as pms
    import functools as ft

    fused = FusedMPF(likelihood=lik, optimizer=optax.sgd(1e-3),
                     interpret=True, fuse_streams=True, fused_lr=1e-3)
    orig = pms.fused_mpf_stream_step
    # shrink blocks (the wrapper pins block_i=256/block_j>=1024):
    # m=200 then pads to 256 with a (2+1) x 2 grid
    small = ft.partial(orig, block_i=128, block_j=128)
    pms.fused_mpf_stream_step = small
    try:
        ms_f = fused.init_state(init, obs, dim_a=1, bw=0.2)
        ms_f, g_f, _ = fused.optimize(ms_f, action, new_obs, bw=0.3,
                                      n_steps=4)
    finally:
        pms.fused_mpf_stream_step = orig

    np.testing.assert_allclose(np.asarray(ms_f.x), np.asarray(ms_p.x),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_p),
                               rtol=1e-3, atol=1e-4)


def test_fused_mpf_stream_fusion_requires_lr():
    model = PendulumModel(uncertain_params=("length", "mass"))
    lik = GaussianLikelihood(obs_std=0.1, model=model)
    with pytest.raises(ValueError, match="fused_lr"):
        FusedMPF(likelihood=lik, optimizer=optax.sgd(1e-3),
                 fuse_streams=True)


@pytest.mark.parametrize("m,block_i,block_j", [
    (200, 128, 128),      # ragged padding + 2x2-block grid
    (512, 128, 256),      # multi-j online softmax in the gp stream
    (64, 128, 128),       # single-block degenerate grid
])
def test_fused_mpf_stream_step_matches_oracles(rng, m, block_i,
                                               block_j):
    """The raw fused step == (svgd phi oracle -> SGD -> gmm score
    oracle) composed, across grid shapes (the row-pipelined scratch
    handoff and the gp stream's cross-j online softmax)."""
    from dust_tpu.ops.pallas_gmm import gmm_prior_score_reference
    from dust_tpu.ops.pallas_mpf_stream import fused_mpf_stream_step
    from dust_tpu.ops.pallas_svgd import svgd_phi_reference

    d = 2
    x = jnp.asarray(rng.normal(size=(m, d)).astype(np.float32)) * 0.5
    score = jnp.asarray(rng.normal(size=(m, d)).astype(np.float32))
    centers = jnp.asarray(
        rng.normal(size=(m, d)).astype(np.float32)) * 0.5
    bw, pbw, lr = 0.4, 0.3, 0.05

    x_new, gp_new = fused_mpf_stream_step(
        x, score, centers, bw, pbw, lr, block_i=block_i,
        block_j=block_j, interpret=True,
    )
    x_exp = x + lr * svgd_phi_reference(x, score, jnp.float32(bw))
    gp_exp = gmm_prior_score_reference(x_exp, centers, pbw)
    np.testing.assert_allclose(np.asarray(x_new), np.asarray(x_exp),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp_new), np.asarray(gp_exp),
                               rtol=1e-4, atol=1e-4)
