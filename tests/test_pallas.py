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


def test_pallas_phi_far_from_origin(rng):
    """phi is translation invariant given the scores; the wrapper
    centers x so the in-kernel MXU Gram identity stays spread-scale
    even when the particle cloud sits far from the origin."""
    m, d = 256, 3
    x = jnp.asarray(rng.normal(size=(m, d)).astype(np.float32)) * 0.2
    score = jnp.asarray(rng.normal(size=(m, d)).astype(np.float32))
    bw = 0.5
    near = svgd_phi_pallas(x, score, bw, block_i=128, block_j=128,
                           interpret=True)
    far = svgd_phi_pallas(x + 2000.0, score, bw, block_i=128,
                          block_j=128, interpret=True)
    # tolerance reflects f32 input quantization of the offset data
    # (~2000 * 2^-23 per coordinate); uncentered this diverges by O(1)
    np.testing.assert_allclose(np.asarray(far), np.asarray(near),
                               atol=2e-3)


@pytest.mark.parametrize("m,d", [(64, 2), (137, 5), (512, 2), (300, 1)])
def test_pallas_phi_packed_matches_reference(rng, m, d):
    """Packed layout (r3: explicit-diff distances + one
    [score | x | ones] matmul per tile) == oracle, incl. padding via
    the ones-column mask."""
    from dust_tpu.ops.pallas_svgd import svgd_phi_pallas_packed

    x = jnp.asarray(rng.normal(size=(m, d)).astype(np.float32)) + 1.5
    score = jnp.asarray(rng.normal(size=(m, d)).astype(np.float32)) * 5.0
    oracle = svgd_phi_reference(x, score, 0.7)
    fused = svgd_phi_pallas_packed(x, score, 0.7, block_i=128,
                                   block_j=128, interpret=True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(oracle),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("m,d", [(64, 2), (137, 5), (300, 1), (700, 2)])
def test_pallas_phi_symm_matches_reference(rng, m, d):
    """Symmetric packed layout (r4: j >= i blocks only, each
    off-diagonal tile mirrored into the j-rows via a second
    contraction, full-residence accumulator) == oracle, incl. the
    multi-block triangle and padded final block. Kept parity-tested as
    a MEASURED REJECTION on hardware — no e2e win over block-tuned
    packed streaming and a VMEM ceiling at m=32768 (BASELINE.md "r4
    Gram-symmetry verdict")."""
    from dust_tpu.ops.pallas_svgd import svgd_phi_pallas_symm

    x = jnp.asarray(rng.normal(size=(m, d)).astype(np.float32)) + 1.5
    score = jnp.asarray(rng.normal(size=(m, d)).astype(np.float32)) * 5.0
    oracle = svgd_phi_reference(x, score, 0.7)
    fused = svgd_phi_pallas_symm(x, score, 0.7, block=128,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(oracle),
                               rtol=2e-4, atol=2e-5)


def test_pallas_phi_packed_bf16_demo_tolerance(rng):
    """bf16 K streaming (f32 accumulate) stays within ~0.5% of the
    oracle — the opt-in fast path's accuracy contract."""
    from dust_tpu.ops.pallas_svgd import svgd_phi_pallas_packed

    m, d = 512, 2
    x = jnp.asarray(rng.normal(size=(m, d)).astype(np.float32))
    score = jnp.asarray(rng.normal(size=(m, d)).astype(np.float32)) * 5.0
    oracle = svgd_phi_reference(x, score, 0.7)
    fused = svgd_phi_pallas_packed(x, score, 0.7, block_i=128,
                                   block_j=128, use_bf16=True,
                                   interpret=True)
    scale = float(jnp.abs(oracle).max())
    np.testing.assert_allclose(np.asarray(fused), np.asarray(oracle),
                               atol=5e-3 * scale)
