"""Pairwise squared distances.

TPU-native counterpart of `dust/inference/svgd.py:28-39` (torch `addmm`
gram-identity trick). On TPU the [m, d] x [d, m] product maps onto the MXU;
the clamp guards the same negative-distance numerics the reference guards.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def squared_distance(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Squared Euclidean distance matrix between rows of x1 [m, d] and
    x2 [n, d] -> [m, n], clamped at zero.

    Both operands are shifted by a common (stop-gradient) center first:
    pairwise distances are translation invariant, but the Gram identity
    is not — on the TPU MXU the cross product runs reduced-precision
    passes whose cancellation error grows with ||x||^2 while kernel
    bandwidths track only the SPREAD, so far-from-origin particles
    corrupt exp(-d2/h) long before f32 runs out (measured as an SVGD
    blow-up in the sweep megakernel before the same centering was
    applied there — ops/pallas_sweep_episode.py Stein block)."""
    mu = jax.lax.stop_gradient(jnp.mean(x1, axis=-2, keepdims=True))
    x1 = x1 - mu
    x2 = x2 - mu
    x1_norm = jnp.sum(x1 * x1, axis=-1, keepdims=True)          # [m, 1]
    x2_norm = jnp.sum(x2 * x2, axis=-1, keepdims=True)          # [n, 1]
    cross = jnp.dot(x1, x2.T, preferred_element_type=jnp.float32)
    res = x1_norm + x2_norm.T - 2.0 * cross
    return jnp.clip(res, min=0.0)
