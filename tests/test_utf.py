"""Merwe sigma points vs the torch reference (`dust/utils/utf.py`)."""

import jax.numpy as jnp
import numpy as np
import torch

from dust_tpu.utils.utf import MerweScaledUTF


def test_weights_match_reference(reference):
    ref_utf = reference("dust.utils.utf")
    for n, alpha in [(2, 0.5), (3, 1e-3)]:
        ours = MerweScaledUTF(n=n, alpha=alpha)
        theirs = ref_utf.MerweScaledUTF(n=n, alpha=alpha)
        np.testing.assert_allclose(
            np.asarray(ours.loc_weights), theirs.loc_weights.numpy(), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(ours.cov_weights), theirs.cov_weights.numpy(), rtol=1e-5
        )


def test_sigma_points_match_reference(reference, rng):
    ref_utf = reference("dust.utils.utf")
    n = 2
    mu = rng.normal(size=n).astype(np.float32)
    a = rng.normal(size=(n, n)).astype(np.float32)
    cov = a @ a.T + np.eye(n, dtype=np.float32)

    ours = MerweScaledUTF(n=n, alpha=0.5)
    theirs = ref_utf.MerweScaledUTF(n=n, alpha=0.5)
    sp_ours = ours.compute_sigma_points(jnp.asarray(mu), jnp.asarray(cov))
    sp_ref = theirs.compute_sigma_points(torch.tensor(mu), torch.tensor(cov))
    np.testing.assert_allclose(np.asarray(sp_ours), sp_ref.numpy(), atol=1e-4)


def test_unscented_transform_roundtrip(reference, rng):
    ref_utf = reference("dust.utils.utf")
    n = 3
    mu = rng.normal(size=n).astype(np.float32)
    a = rng.normal(size=(n, n)).astype(np.float32)
    cov = a @ a.T + np.eye(n, dtype=np.float32)

    ours = MerweScaledUTF(n=n, alpha=0.5)
    theirs = ref_utf.MerweScaledUTF(n=n, alpha=0.5)
    sp = ours.compute_sigma_points(jnp.asarray(mu), jnp.asarray(cov))
    mu_out, cov_out = ours.unscented_transform(sp)
    mu_ref, cov_ref = theirs.unscented_transform(
        torch.tensor(np.asarray(sp))
    )
    np.testing.assert_allclose(np.asarray(mu_out), mu_ref.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(cov_out), cov_ref.numpy(), atol=1e-3)
    # The mean roundtrips exactly. (The covariance does NOT: the reference
    # uses *columns* of the upper Cholesky factor as sigma offsets,
    # `dust/utils/utf.py:121-122`, so the reconstruction is U U^T rather
    # than U^T U = cov — a reference quirk we mirror for parity.)
    np.testing.assert_allclose(np.asarray(mu_out), mu, atol=1e-4)


def test_correct_sqrt_mode_reconstructs_covariance(rng):
    """correct_sqrt=True (the fixed mode, PARITY.md #7): sigma points
    round-trip (mu, cov) through unscented_transform — the property the
    reference's column-of-upper-Cholesky offsets break."""
    n = 3
    mu = rng.normal(size=n).astype(np.float32)
    a = rng.normal(size=(n, n)).astype(np.float32)
    cov = a @ a.T + np.eye(n, dtype=np.float32)

    fixed = MerweScaledUTF(n=n, alpha=0.5, correct_sqrt=True)
    sp = fixed.compute_sigma_points(jnp.asarray(mu), jnp.asarray(cov))
    mu_out, cov_out = fixed.unscented_transform(sp)
    np.testing.assert_allclose(np.asarray(mu_out), mu, atol=1e-4)
    np.testing.assert_allclose(np.asarray(cov_out), cov, rtol=1e-3,
                               atol=1e-3)

    # the parity-default mode does NOT reconstruct (documents the quirk)
    quirky = MerweScaledUTF(n=n, alpha=0.5)
    sq = quirky.compute_sigma_points(jnp.asarray(mu), jnp.asarray(cov))
    _, cov_q = quirky.unscented_transform(sq)
    assert not np.allclose(np.asarray(cov_q), cov, rtol=1e-3, atol=1e-3)
