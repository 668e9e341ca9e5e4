"""Pairwise squared distances.

TPU-native counterpart of `dust/inference/svgd.py:28-39` (torch `addmm`
gram-identity trick). On TPU the [m, d] x [d, m] product maps onto the MXU;
the clamp guards the same negative-distance numerics the reference guards.
"""

from __future__ import annotations

import jax.numpy as jnp


def squared_distance(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Squared Euclidean distance matrix between rows of x1 [m, d] and
    x2 [n, d] -> [m, n], clamped at zero."""
    x1_norm = jnp.sum(x1 * x1, axis=-1, keepdims=True)          # [m, 1]
    x2_norm = jnp.sum(x2 * x2, axis=-1, keepdims=True)          # [n, 1]
    cross = jnp.dot(x1, x2.T, preferred_element_type=jnp.float32)
    res = x1_norm + x2_norm.T - 2.0 * cross
    return jnp.clip(res, min=0.0)
