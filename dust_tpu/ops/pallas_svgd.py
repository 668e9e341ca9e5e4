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


def _phi_kernel_packed(bw_ref, xi_ref, xjt_ref, pk_ref, phi_ref,
                       acc_ref, *, num_j, d, use_bf16):
    """Packed-layout phi tile (r3, VERDICT-r2 #6): the MPF state dim is
    tiny (d = 1-2), so the gram-identity layout of `_phi_kernel` burns
    three 128-lane MXU dispatches per tile on 2 useful lanes — measured
    1.7% useful-MXU at m=8192 (`BASELINE.md` roofline). This layout
    does the same tile with ONE matmul:

    * distances come from explicit per-dimension broadcast diffs
      against a pre-transposed [8, bn] particle block (`xjt_ref`) —
      VPU work linear in d, no [bm, 128] x [128, bn] contraction;
    * drive (K @ score), kx (K @ x) and rowsum(K) ride ONE
      [bm, bn] x [bn, 128] matmul against a packed operand
      `pk = [score | x | ones]` (columns 0:d, d:2d, 2d) — the ones
      column doubles as the padded-row mask, so no iota masking.

    acc_ref: [bm, 128] f32 accumulator persisting across j steps.
    `use_bf16` casts K and streams pk in bf16 (one MXU pass instead of
    the f32 split-bf16 multi-pass) with f32 accumulation.
    """
    j = pl.program_id(1)
    bw = bw_ref[0, 0]
    inv2 = 0.5 / (bw * bw)
    xi = xi_ref[:]                                       # [bm, 128]

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    d2 = None
    for dd in range(d):
        diff = xi[:, dd:dd + 1] - xjt_ref[dd:dd + 1, :]  # [bm, bn]
        d2 = diff * diff if d2 is None else d2 + diff * diff
    k = jnp.exp(-d2 * inv2)
    if use_bf16:
        k = k.astype(jnp.bfloat16)
    acc_ref[:] += jnp.dot(k, pk_ref[:],
                          preferred_element_type=jnp.float32)

    @pl.when(j == num_j - 1)
    def _finish():
        acc = acc_ref[:]
        rows = acc[:, 2 * d:2 * d + 1]                   # rowsum(K)
        repel = (rows * xi[:, 0:d] - acc[:, d:2 * d]) * (2.0 * inv2)
        phi_ref[:] = jnp.zeros_like(phi_ref)
        phi_ref[:, 0:d] = acc[:, 0:d] + repel            # /m by caller


@functools.partial(jax.jit, static_argnames=("block_i", "block_j",
                                             "use_bf16", "interpret"))
def svgd_phi_pallas_packed(x, score, bw, block_i=256, block_j=1024,
                           use_bf16=False, interpret=False):
    """Packed-layout fused phi (see `_phi_kernel_packed`). Identical
    math to `svgd_phi_pallas` (parity-tested); requires d <= 8."""
    m, d = x.shape
    if d > 8 or 2 * d + 1 > 128:
        raise ValueError("packed phi layout requires d <= 8")
    mp = _round_up(max(m, max(block_i, block_j)), block_i)
    mp = _round_up(mp, block_j)
    dp = 128

    x = x - jax.lax.stop_gradient(jnp.mean(x, axis=0, keepdims=True))
    xp = jnp.zeros((mp, dp), jnp.float32).at[:m, :d].set(x)
    xjt = jnp.zeros((8, mp), jnp.float32).at[:d, :m].set(x.T)
    pk_dtype = jnp.bfloat16 if use_bf16 else jnp.float32
    pk = (jnp.zeros((mp, dp), jnp.float32)
          .at[:m, 0:d].set(score)
          .at[:m, d:2 * d].set(x)
          .at[:m, 2 * d].set(1.0)).astype(pk_dtype)
    bw_arr = jnp.asarray(bw, jnp.float32).reshape(1, 1)

    num_j = mp // block_j
    grid = (mp // block_i, num_j)
    kernel = functools.partial(_phi_kernel_packed, num_j=num_j, d=d,
                               use_bf16=use_bf16)
    phi = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),            # bw
            pl.BlockSpec((block_i, dp), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),            # x_i
            pl.BlockSpec((8, block_j), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),            # x_j^T
            pl.BlockSpec((block_j, dp), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),            # packed
        ],
        out_specs=pl.BlockSpec((block_i, dp), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, dp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_i, dp), jnp.float32)],
        interpret=interpret,
    )(bw_arr, xp, xjt, pk)
    return phi[:m, :d] / jnp.float32(m)


def _phi_kernel_packed_symm(bw_ref, xi_ref, xjt_ref, pki_ref, pkj_ref,
                            phi_ref, acc_ref, *, num_j, d, block):
    """Symmetric packed phi tile (r4, VERDICT r3 #2): K(i,j) = K(j,i),
    so only j >= i blocks are evaluated — the [b, b] VPU exp/d2
    elementwise stream, the kernels' measured BINDING resource
    (BASELINE.md roofline), nearly halves. Each off-diagonal tile
    contributes twice: directly into the i-rows (K @ pk_j) and mirrored
    into the j-rows (K^T @ pk_i, one extra contraction on the
    mostly-idle MXU — no explicit transpose, the dot contracts dim 0).

    Needs a FULL-residence [mp, 128] f32 accumulator: mirror
    contributions for block j arrive across every earlier grid row, so
    per-i-block streaming accumulators no longer suffice. The TPU grid
    executes sequentially on one core, making the read-modify-write
    dynamic-slice accumulation well-defined. VMEM cost mp * 512 B —
    the accumulator is what bounds m (see the wrapper guard).

    Row-major traversal guarantees every contribution to block i
    (mirrors from rows i' < i, directs along row i) lands before the
    (i, num_j - 1) finish step writes the output block.

    Padded-row correctness needs no masks: pk rows beyond m are zero,
    so mirrored contractions over padded i-rows contribute exact
    zeros, and direct contributions into padded rows are dropped by
    the caller's [:m] slice."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(j >= i)
    def _work():
        bw = bw_ref[0, 0]
        inv2 = 0.5 / (bw * bw)
        xi = xi_ref[:]                                   # [b, 128]
        d2 = None
        for dd in range(d):
            diff = xi[:, dd:dd + 1] - xjt_ref[dd:dd + 1, :]
            d2 = diff * diff if d2 is None else d2 + diff * diff
        k = jnp.exp(-d2 * inv2)                          # [b, b]
        acc_ref[pl.ds(i * block, block), :] += jnp.dot(
            k, pkj_ref[:], preferred_element_type=jnp.float32
        )
        # mirror (gated multiplicatively: on the diagonal the direct
        # pass already covered these pairs, so the contribution is
        # zeroed rather than branching inside the traced body)
        gate = (j > i).astype(jnp.float32)
        acc_ref[pl.ds(j * block, block), :] += gate * jax.lax.dot_general(
            k, pki_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(j == num_j - 1)
    def _finish():
        acc = acc_ref[pl.ds(i * block, block), :]
        xi = xi_ref[:]
        bw = bw_ref[0, 0]
        inv2 = 0.5 / (bw * bw)
        rows = acc[:, 2 * d:2 * d + 1]
        repel = (rows * xi[:, 0:d] - acc[:, d:2 * d]) * (2.0 * inv2)
        phi_ref[:] = jnp.zeros_like(phi_ref)
        phi_ref[:, 0:d] = acc[:, 0:d] + repel            # /m by caller


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def svgd_phi_pallas_symm(x, score, bw, block=512, interpret=False):
    """Symmetric packed-layout fused phi (see `_phi_kernel_packed_symm`).
    Identical math to `svgd_phi_pallas` (parity-tested); d <= 8."""
    m, d = x.shape
    if d > 8 or 2 * d + 1 > 128:
        raise ValueError("packed phi layout requires d <= 8")
    mp = _round_up(max(m, block), block)
    dp = 128

    x = x - jax.lax.stop_gradient(jnp.mean(x, axis=0, keepdims=True))
    xp = jnp.zeros((mp, dp), jnp.float32).at[:m, :d].set(x)
    xjt = jnp.zeros((8, mp), jnp.float32).at[:d, :m].set(x.T)
    pk = (jnp.zeros((mp, dp), jnp.float32)
          .at[:m, 0:d].set(score)
          .at[:m, d:2 * d].set(x)
          .at[:m, 2 * d].set(1.0))
    bw_arr = jnp.asarray(bw, jnp.float32).reshape(1, 1)

    num_j = mp // block
    grid = (num_j, num_j)
    kernel = functools.partial(_phi_kernel_packed_symm, num_j=num_j,
                               d=d, block=block)
    phi = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),            # bw
            pl.BlockSpec((block, dp), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),            # x_i
            pl.BlockSpec((8, block), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),            # x_j^T
            pl.BlockSpec((block, dp), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),            # packed_i
            pl.BlockSpec((block, dp), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),            # packed_j
        ],
        out_specs=pl.BlockSpec((block, dp), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, dp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((mp, dp), jnp.float32)],
        interpret=interpret,
    )(bw_arr, xp, xjt, pk, pk)
    return phi[:m, :d] / jnp.float32(m)


def fused_svgd_phi(x, score, bw, min_particles_for_pallas=512):
    """Dispatch: Pallas on TPU for large m, jnp path otherwise."""
    m = x.shape[0]
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu and m >= min_particles_for_pallas:
        return svgd_phi_pallas(x, score, bw)
    return svgd_phi_reference(x, score, bw)
