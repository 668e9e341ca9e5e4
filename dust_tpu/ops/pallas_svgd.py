"""Fused Pallas TPU kernel for the SVGD update direction.

The SVGD hot loop (SURVEY.md §3.6 #2) is: RBF Gram matrix K [m, m] over
particles, its gradient, and two [m, m] x [m, d] contractions:

    K_ij    = exp(-||x_i - x_j||^2 / (2 bw^2))
    drive_i = sum_j K_ij * score_j                      (K @ score)
    repel_i = -grad_{x_i} sum_j K_ij
            = (rowsum(K)_i * x_i - (K @ x)_i) / bw^2
    phi     = (drive + repel) / m                        (standard SVGD)

For large particle counts the naive path materializes K (m^2 floats in
HBM) three times over (distance matrix, exp, matmuls). This kernel
streams j-blocks through VMEM flash-attention style: each grid step owns
an i-block of particles, loops over j-blocks computing the K tile on the
MXU (distance via the gram identity -> one [bm, d] x [d, bn] matmul),
and accumulates K @ score, K @ x and rowsum(K) in VMEM scratch — K never
touches HBM.

`fused_svgd_phi` is the public entry: Pallas on TPU for m >= threshold,
identical-math jnp fallback elsewhere (parity-tested in
tests/test_pallas.py via interpreter mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _phi_kernel(bw_ref, xi_ref, xj_ref, sj_ref, phi_ref,
                drive_ref, kx_ref, rows_ref, *, block_j, m_total,
                num_j):
    """Grid (i-blocks, j-blocks), j innermost: each step folds ONE
    (x, score) block into the i-block's VMEM accumulators (which
    persist across grid steps); the output block is written on the
    last j step. VMEM holds one x_i block + one (x_j, s_j) block pair
    at a time — O(block) regardless of m (the r1 version held the full
    padded particle/score arrays in VMEM, the m = 32768 compile-OOM
    ceiling the scale probe mapped).

    xi_ref:    [bm, d]   this block's particles (VMEM)
    xj_ref:    [bn, d]   this step's particle block (VMEM, streamed)
    sj_ref:    [bn, d]   this step's score block (VMEM, streamed)
    phi_ref:   [bm, d]   output block
    drive/kx/rows_ref: [bm, d] VMEM accumulators (rows holds rowsum(K)
    broadcast across columns).
    """
    j = pl.program_id(1)
    bw = bw_ref[0, 0]
    inv2 = 0.5 / (bw * bw)
    xi = xi_ref[:]                                       # [bm, d]
    xi_norm = jnp.sum(xi * xi, axis=1, keepdims=True)    # [bm, 1]

    @pl.when(j == 0)
    def _init():
        drive_ref[:] = jnp.zeros_like(drive_ref)
        kx_ref[:] = jnp.zeros_like(kx_ref)
        rows_ref[:] = jnp.zeros_like(rows_ref)

    xj = xj_ref[:]                                       # [bn, d]
    sj = sj_ref[:]                                       # [bn, d]
    xj_norm = jnp.sum(xj * xj, axis=1)[None, :]          # [1, bn]
    cross = jnp.dot(xi, xj.T, preferred_element_type=jnp.float32)
    d2 = jnp.maximum(xi_norm + xj_norm - 2.0 * cross, 0.0)
    k = jnp.exp(-d2 * inv2)                              # [bm, bn]
    # mask padded j lanes out of every reduction
    j_ids = jax.lax.broadcasted_iota(
        jnp.int32, k.shape, dimension=1
    ) + j * block_j
    k = jnp.where(j_ids < m_total, k, 0.0)
    drive_ref[:] += jnp.dot(k, sj, preferred_element_type=jnp.float32)
    kx_ref[:] += jnp.dot(k, xj, preferred_element_type=jnp.float32)
    rows_ref[:] += jnp.sum(k, axis=1, keepdims=True)     # broadcast cols

    @pl.when(j == num_j - 1)
    def _finish():
        repel = (rows_ref[:] * xi - kx_ref[:]) / (bw * bw)
        phi_ref[:] = (drive_ref[:] + repel) / jnp.float32(m_total)


def svgd_phi_reference(x, score, bw):
    """Identical-math jnp path (and the correctness oracle)."""
    from .kernels import rbf_gram_and_grad

    k, grad_first = rbf_gram_and_grad(x, x, bw)
    return (jnp.tensordot(k, score, axes=1) - grad_first) / x.shape[0]


@functools.partial(jax.jit, static_argnames=("block_i", "block_j",
                                             "interpret"))
def svgd_phi_pallas(x, score, bw, block_i=256, block_j=1024, interpret=False):
    """Fused phi via Pallas. x, score: [m, d]; bw scalar. Pads m to the
    block sizes and d to the 128-lane width; padding is masked out."""
    m, d = x.shape
    mp = _round_up(max(m, max(block_i, block_j)), block_i)
    mp = _round_up(mp, block_j)
    dp = max(_round_up(d, 128), 128)

    # phi is translation invariant in x given the scores (K and the
    # repulsion term depend only on differences): center so the MXU
    # Gram identity in the kernel stays spread-scale (see
    # ops/distance.py for the failure mode)
    x = x - jax.lax.stop_gradient(jnp.mean(x, axis=0, keepdims=True))
    xp = jnp.zeros((mp, dp), jnp.float32).at[:m, :d].set(x)
    sp = jnp.zeros((mp, dp), jnp.float32).at[:m, :d].set(score)
    bw_arr = jnp.asarray(bw, jnp.float32).reshape(1, 1)

    num_j = mp // block_j
    grid = (mp // block_i, num_j)
    kernel = functools.partial(
        _phi_kernel, block_j=block_j, m_total=m, num_j=num_j
    )
    phi = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),           # bw [1,1]
            pl.BlockSpec((block_i, dp), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),           # x_i block
            pl.BlockSpec((block_j, dp), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),           # x_j block
            pl.BlockSpec((block_j, dp), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),           # s_j block
        ],
        out_specs=pl.BlockSpec((block_i, dp), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, dp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((block_i, dp), jnp.float32),
            pltpu.VMEM((block_i, dp), jnp.float32),
            pltpu.VMEM((block_i, dp), jnp.float32),
        ],
        interpret=interpret,
    )(bw_arr, xp, xp, sp)
    return phi[:m, :d]


def fused_svgd_phi(x, score, bw, min_particles_for_pallas=512):
    """Dispatch: Pallas on TPU for large m, jnp path otherwise."""
    m = x.shape[0]
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu and m >= min_particles_for_pallas:
        return svgd_phi_pallas(x, score, bw)
    return svgd_phi_reference(x, score, bw)
