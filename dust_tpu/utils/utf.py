"""Merwe scaled unscented-transform sigma points.

TPU-native counterpart of `dust/utils/utf.py:6-141`: weights are computed
once at construction (host, numpy); `compute_sigma_points` /
`unscented_transform` are pure jnp (Cholesky on device) so they can sit
inside the jitted rollout program (`MultiDisco` sigma-rollout mode).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


class MerweScaledUTF:
    """Sigma-point transformer: 2n+1 points for an n-dim distribution.

    `correct_sqrt` selects the matrix-square-root convention:

    * False (default — reference parity, PARITY.md #7): sigma offsets are
      the *columns* of the upper Cholesky factor U of (lambda + n) K, as in
      `dust/utils/utf.py:121-122`. Since U^T U = (lambda+n) K but the
      offsets reconstruct U U^T, the sigma points do NOT reproduce the
      covariance under `unscented_transform`.
    * True: offsets are the columns of the *lower* Cholesky factor L
      (L L^T = (lambda+n) K), the mathematically intended Merwe
      construction — `unscented_transform(compute_sigma_points(mu, K))`
      round-trips (mu, K) exactly (up to float error).
    """

    def __init__(self, n, alpha=1e-3, beta=2.0, kappa=0.0,
                 correct_sqrt=False):
        self.n = int(n)
        self.correct_sqrt = bool(correct_sqrt)
        self.pts = 2 * self.n + 1
        self.alpha = float(alpha)
        self.beta = float(beta)
        self.kappa = float(kappa)

        lambda_ = self.alpha**2 * (self.n + self.kappa) - self.n
        c = 0.5 / (self.n + lambda_)
        cov_w = np.full((self.pts,), c, dtype=np.float32)
        loc_w = np.full((self.pts,), c, dtype=np.float32)
        cov_w[0] = lambda_ / (self.n + lambda_) + (1 - self.alpha**2 + self.beta)
        loc_w[0] = lambda_ / (self.n + lambda_)
        self._lambda = lambda_
        self.cov_weights = jnp.asarray(cov_w)
        self.loc_weights = jnp.asarray(loc_w)

    def compute_sigma_points(self, mu, cov):
        """Sigma points [n, 2n+1] for mean `mu` [n] and covariance [n, n].

        Matches `dust/utils/utf.py:93-123`: column 0 is the mean, columns
        1..n are mu + rows of U, columns n+1..2n are mu - rows of U, with
        U the upper-Cholesky factor of (lambda + n) K.
        """
        mu = jnp.asarray(mu, dtype=jnp.float32).reshape(self.n)
        cov = jnp.asarray(cov, dtype=jnp.float32)
        if self.correct_sqrt:
            # lower Cholesky factor: columns c_i satisfy sum c_i c_i^T =
            # L L^T = (lambda + n) K, so the sigma points reconstruct K
            u = jnp.linalg.cholesky((self._lambda + self.n) * cov)
        else:
            # upper-triangular square root: chol(A^T)^T — columns used as
            # offsets reproduce the reference quirk (PARITY.md #7)
            u = jnp.linalg.cholesky((self._lambda + self.n) * cov.T).T
        plus = u + mu[:, None]
        minus = -u + mu[:, None]
        return jnp.concatenate([mu[:, None], plus, minus], axis=1)

    def unscented_transform(self, sigmas):
        """(mean, cov) of transformed sigma points [n, 2n+1]
        (`dust/utils/utf.py:125-141`)."""
        mu = sigmas @ self.loc_weights
        y = sigmas - mu[:, None]
        cov = (y * self.cov_weights) @ y.T
        return mu, cov
