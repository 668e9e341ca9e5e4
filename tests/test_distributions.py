"""Distribution log-probs and samplers vs torch.distributions (the
reference's numerics source) and closed forms."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.distributions as tdist

from dust_tpu.distributions import GMM, MVN, Normal, Uniform


def test_mvn_log_prob_matches_torch(rng):
    d = 3
    a = rng.normal(size=(d, d))
    cov = a @ a.T + d * np.eye(d)
    loc = rng.normal(size=d)
    x = rng.normal(size=(7, d))

    ours = MVN.from_cov(loc, cov)
    theirs = tdist.MultivariateNormal(
        torch.tensor(loc, dtype=torch.float64),
        covariance_matrix=torch.tensor(cov, dtype=torch.float64),
    )
    np.testing.assert_allclose(
        np.asarray(ours.log_prob(jnp.asarray(x))),
        theirs.log_prob(torch.tensor(x, dtype=torch.float64)).numpy(),
        rtol=2e-5,
    )


def test_mvn_sample_moments():
    cov = np.array([[2.0, 0.5], [0.5, 1.0]])
    dist = MVN.from_cov(np.array([1.0, -1.0]), cov)
    samples = dist.sample(jax.random.key(0), (200_000,))
    np.testing.assert_allclose(np.mean(samples, axis=0), [1.0, -1.0], atol=0.02)
    np.testing.assert_allclose(np.cov(np.asarray(samples).T), cov, atol=0.03)


def test_normal_independent_matches_torch(rng):
    loc = rng.normal(size=(4, 2))
    scale = rng.uniform(0.5, 2.0, size=(4, 2))
    x = rng.normal(size=(5, 4, 2))
    ours = Normal(jnp.asarray(loc), jnp.asarray(scale), event_ndims=1)
    theirs = tdist.Independent(
        tdist.Normal(torch.tensor(loc), torch.tensor(scale)), 1
    )
    np.testing.assert_allclose(
        np.asarray(ours.log_prob(jnp.asarray(x, jnp.float32))),
        theirs.log_prob(torch.tensor(x, dtype=torch.float64)).numpy(),
        rtol=1e-5,
    )


def test_uniform_matches_torch():
    low = np.array([0.6, 0.6])
    high = np.array([1.3, 1.3])
    ours = Uniform(jnp.asarray(low), jnp.asarray(high), event_ndims=1)
    theirs = tdist.Independent(
        tdist.Uniform(torch.tensor(low), torch.tensor(high)), 1
    )
    x = np.array([[0.7, 1.0], [1.0, 1.2]])
    np.testing.assert_allclose(
        np.asarray(ours.log_prob(jnp.asarray(x, jnp.float32))),
        theirs.log_prob(torch.tensor(x)).numpy(),
        rtol=1e-5,
    )
    assert np.isneginf(np.asarray(ours.log_prob(jnp.array([0.5, 1.0]))))
    np.testing.assert_allclose(np.asarray(ours.mean), (low + high) / 2)


@pytest.mark.parametrize("event_rank", [1, 2])
def test_gmm_log_prob_matches_torch_mixture(rng, event_rank):
    """GMM == MixtureSameFamily(Categorical, Independent(MVN, rank-1)) —
    the reference's `get_gmm` (`dust/inference/svgd.py:84-89`) and MPF prior
    (`dust/inference/mpf.py:30-38`)."""
    k, h, a = 3, 5, 2
    if event_rank == 1:
        locs = rng.normal(size=(k, a))
    else:
        locs = rng.normal(size=(k, h, a))
    weights = rng.uniform(1, 2, size=k)
    cov = np.diag(rng.uniform(0.5, 1.5, size=a))

    ours = GMM.from_cov(locs, weights, cov)

    mix = tdist.Categorical(torch.tensor(weights))
    comp = tdist.Independent(
        tdist.MultivariateNormal(
            torch.tensor(locs, dtype=torch.float64),
            covariance_matrix=torch.tensor(cov, dtype=torch.float64),
        ),
        event_rank - 1,
    )
    theirs = tdist.MixtureSameFamily(mix, comp)

    x = rng.normal(size=(7,) + locs.shape[1:])
    np.testing.assert_allclose(
        np.asarray(ours.log_prob(jnp.asarray(x, jnp.float32))),
        theirs.log_prob(torch.tensor(x, dtype=torch.float64)).numpy(),
        rtol=1e-4,
    )


def test_gmm_sample_shape_and_mean():
    locs = np.array([[0.0, 0.0], [4.0, 4.0]])
    gmm = GMM.from_cov(locs, np.array([1.0, 1.0]), 0.01 * np.eye(2))
    s = gmm.sample(jax.random.key(1), (50_000,))
    assert s.shape == (50_000, 2)
    np.testing.assert_allclose(np.mean(s, axis=0), [2.0, 2.0], atol=0.05)
    np.testing.assert_allclose(np.asarray(gmm.mean), [2.0, 2.0], atol=1e-6)


@pytest.mark.parametrize("event_rank", [1, 2])
def test_gmm_score_matches_autograd(rng, event_rank):
    """Closed-form mixture score == jax.grad through log_prob (the hot
    SVGD prior-gradient path)."""
    k, h, a = 4, 6, 2
    locs = rng.normal(size=(k, a) if event_rank == 1 else (k, h, a))
    # non-trivial full covariance on the last axis
    m = rng.normal(size=(a, a))
    cov = m @ m.T + 2 * np.eye(a)
    gmm = GMM.from_cov(locs, rng.uniform(0.5, 2.0, size=k), cov)
    x = jnp.asarray(rng.normal(size=(5,) + locs.shape[1:]), jnp.float32)

    auto = jax.grad(lambda t: jnp.sum(gmm.log_prob(t)))(x)
    closed = gmm.score(x)
    np.testing.assert_allclose(np.asarray(closed), np.asarray(auto),
                               rtol=2e-4, atol=2e-5)
