"""Kernel bandwidth heuristics, all jit-safe (no host sync).

The reference mixes three conventions (SURVEY.md §7.4):

* `bw_median`   — median trick, `dust/inference/svgd.py:42-52`
* `bw_silverman` — statsmodels-style 0.9 * A * n^(-1/5),
  `dust/inference/svgd.py:55-81`
* KDEpy `silvermans_rule` on particles flattened to 1-D — used per SVGD
  `optimize` call (`dust/inference/svmpc.py:105`, `dust/inference/mpf.py:72`).
  The reference pays a host round-trip (torch -> numpy -> KDEpy) every call;
  here the same rule runs inside the jitted device program.

All functions return float32 scalars (or vectors where the reference does).
"""

from __future__ import annotations

import jax.numpy as jnp

from .distance import squared_distance

# norm.ppf(0.75) - norm.ppf(0.25); the reference uses the rounded 1.349
# (`svgd.py:19`), KDEpy uses the exact value. We keep both callers faithful.
_IQR_NORMALIZE_REF = 1.349
_IQR_NORMALIZE_EXACT = 1.3489795003921634


def median_lower(x):
    """torch.median convention: the lower of the two middle order statistics
    for even-length inputs (jnp.median averages them). One device sort."""
    flat = jnp.ravel(x)
    n = flat.shape[0]
    return jnp.sort(flat)[(n - 1) // 2]


def select_sigma(x, percentile: int = 25):
    """Smaller of std (over axis 0) and normalized IQR of the flattened input.

    Mirrors `dust/inference/svgd.py:10-25`: the IQR is computed over the
    flattened array (scipy `scoreatpercentile` semantics), the std per
    column with ddof=1 (torch default). Returns a scalar if the IQR wins,
    else the per-column std vector.
    """
    x = jnp.asarray(x)
    flat = x.reshape(-1)
    iqr = (
        jnp.percentile(flat, 100 - percentile) - jnp.percentile(flat, percentile)
    ) / _IQR_NORMALIZE_REF
    std_dev = jnp.std(x, axis=0, ddof=1)
    use_iqr = (iqr > 0) & (iqr < std_dev.min())
    return jnp.where(use_iqr, iqr, std_dev)


def bw_median(x, y=None, bw_scale: float = 1.0, tol: float = 1.0e-5):
    """Median-trick bandwidth, `dust/inference/svgd.py:42-52`:
    bw = sqrt(0.5 * median(d^2)) / log(m + 1), clamped at `tol`."""
    if y is None:
        y = x
    pairwise = squared_distance(x, y)
    h = median_lower(pairwise)
    h = jnp.sqrt(0.5 * h) / jnp.log(x.shape[0] + 1.0)
    return bw_scale * jnp.maximum(h, tol)


def bw_silverman(x, bw_scale: float = 1.0):
    """Statsmodels-style Silverman rule, `dust/inference/svgd.py:55-81`:
    0.9 * min(std, IQR/1.349) * n^(-1/5). `n` is the number of rows."""
    a = select_sigma(x)
    n = x.shape[0]
    return bw_scale * 0.9 * a * n ** (-0.2)


def silvermans_rule(x):
    """KDEpy-convention Silverman rule on 1-D data (the reference calls
    `KDEpy.bw_selection.silvermans_rule(theta.view(-1, 1))`,
    `dust/inference/svmpc.py:105`): sigma = min(std_ddof1, IQR/1.34898),
    bw = sigma * (3n/4)^(-1/5), with n the number of observations."""
    flat = jnp.asarray(x).reshape(-1)
    n = flat.shape[0]
    sigma = jnp.std(flat, ddof=1)
    iqr = (jnp.percentile(flat, 75) - jnp.percentile(flat, 25)) / _IQR_NORMALIZE_EXACT
    sigma = jnp.where(iqr > 0, jnp.minimum(sigma, iqr), sigma)
    # floor for degenerate (collapsed) particle sets: a zero bandwidth
    # would poison the kernel with division by zero (KDEpy falls back to
    # a machine-epsilon-based value in this case too)
    return jnp.maximum(sigma * (n * 3.0 / 4.0) ** (-0.2), 1e-6)
