"""Pallas fused SVGD kernel vs the jnp oracle (interpreter mode on CPU;
the same code compiles on TPU — exercised by bench_svgd.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dust_tpu.ops.pallas_svgd import svgd_phi_pallas, svgd_phi_reference


@pytest.mark.parametrize("m,d", [(64, 2), (200, 3), (512, 2), (300, 60)])
def test_pallas_phi_matches_reference(rng, m, d):
    x = jnp.asarray(rng.normal(size=(m, d)).astype(np.float32))
    score = jnp.asarray(rng.normal(size=(m, d)).astype(np.float32)) * 5.0
    bw = 0.7

    oracle = svgd_phi_reference(x, score, bw)
    fused = svgd_phi_pallas(x, score, bw, block_i=128, block_j=128,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(oracle),
                               rtol=2e-4, atol=2e-5)


def test_pallas_phi_odd_sizes(rng):
    """Non-multiple-of-block sizes exercise the padding masks."""
    m, d = 137, 5
    x = jnp.asarray(rng.normal(size=(m, d)).astype(np.float32))
    score = jnp.asarray(rng.normal(size=(m, d)).astype(np.float32))
    oracle = svgd_phi_reference(x, score, 1.3)
    fused = svgd_phi_pallas(x, score, 1.3, block_i=128, block_j=128,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(oracle),
                               rtol=2e-4, atol=2e-5)
