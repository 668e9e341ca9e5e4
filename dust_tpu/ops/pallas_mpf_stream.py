"""ONE streaming Pallas program per FusedMPF SVGD iteration.

VERDICT r4 #2: `FusedMPF.optimize` ran TWO m^2 streams per iteration —
`gmm_prior_score_pallas_packed` (prior score at the current particles)
then `svgd_phi_pallas_packed` (kernel phi) — two launches, two grid
traversals, two sets of per-grid-step fixed costs, which the r4
block-scaling verdict measured as the binding cost at practical block
sizes (BASELINE.md "r4 Gram-symmetry verdict").

The two streams cannot fuse within one iteration directly: phi_t's
drive K @ score_t needs score_j = glik_j + gp_j for EVERY streamed
j-block, and gp_t (all rows) is itself an m^2 product — a genuine
sequential dependency. The fusion here restructures ACROSS iterations
instead (software pipelining by one grid ROW):

    kernel_t: computes phi_t (from x_t, score_t — both inputs) AND
              gp_{t+1} (the prior score at x_{t+1} = x_t + lr * phi_t),
              with the gp stream for row block i-1 running during row
              block i's phi stream — row i-1's x_{t+1} block is
              finished exactly one grid row earlier and rides a VMEM
              scratch. Grid (num_i + 1, num_j): ~HALF the grid steps
              of the two-kernel path at the same block shape.

    between kernels (XLA, O(m d)): glik_{t+1} = grad log-lik(x_{t+1}),
              score_{t+1} = glik_{t+1} + gp_{t+1}, operand repack.

Further sharing: the j-stream operand packs [score | x | centers |
ones] in ONE [bn, 128] block (columns 0:d, d:2d, 2d:3d, 3d), so BOTH
matmuls — K @ pk (drive, kx, rowsum) and resp @ pk (weighted centers,
normalizer) — contract against the SAME streamed block: one input
stream where the two kernels streamed two. The don't-care output
columns ride the MXU's padded lanes for free. The transposed
distance operands pack the same way ([16, bn]: rows 0:d = x^T, rows
8:8+d = centers^T).

The in-kernel update is plain SGD (x + lr * phi) — the row pipeline
needs x_{t+1} inside the program, so `FusedMPF(fuse_streams=...)`
requires an explicit lr (see inference/mpf.py). Distances use explicit
per-dimension diffs (the packed layout), so no centering pass is
needed — exact at any offset, unlike the Gram-identity layout.

Reference ops this serves: `/root/reference/dust/inference/mpf.py:40-57`
(prior grad + kernel term), `/root/reference/dust/kernels/
base_kernels.py:91-108`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_svgd import _round_up


def _stream_step_kernel(scal_ref, xi_ref, xct_ref, pk_ref,
                        xnew_ref, gp_ref,
                        acc_p, acc_g, gmax, xprev, *,
                        block_i, block_j, m_total, num_i, num_j, d):
    """Grid (num_i + 1, num_j), j innermost.

    Step (i, j):
      * gp-fold for row block i-1 (gated i > 0): responsibilities of
        xprev (the x_{t+1} block stashed one grid row ago) against
        center columns 2d:3d of pk, online-softmax accumulated; on the
        last j step writes gp out block i-1. Runs FIRST so it reads
        xprev before this row's phi finish overwrites it.
      * phi-fold for row block i (gated i < num_i): K tile of x_t row
        block i against the streamed x_j (rows 0:d of xct), one matmul
        against pk accumulating (drive | kx | rowsum); on the last j
        step writes xnew out block i = xi + lr * phi and stashes it in
        xprev for the next row's gp stream.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    bw = scal_ref[0, 0]
    pbw = scal_ref[0, 1]
    lr = scal_ref[0, 2]
    inv2 = 0.5 / (bw * bw)
    pinv2 = 0.5 / (pbw * pbw)

    # ---- gp stream for row block i-1 (prior score at x_{t+1}) ----
    @pl.when(i > 0)
    def _gp_fold():
        @pl.when(j == 0)
        def _init():
            acc_g[:] = jnp.zeros_like(acc_g)
            gmax[:] = jnp.full_like(gmax, -jnp.inf)

        xp = xprev[:]
        d2 = None
        for dd in range(d):
            diff = xp[:, dd:dd + 1] - xct_ref[8 + dd:8 + dd + 1, :]
            d2 = diff * diff if d2 is None else d2 + diff * diff
        logits = -d2 * pinv2
        # padded center columns masked: their logit can exceed the true
        # max and underflow the normalizer (see pallas_gmm.py)
        k_ids = jax.lax.broadcasted_iota(
            jnp.int32, logits.shape, dimension=1
        ) + j * block_j
        logits = jnp.where(k_ids < m_total, logits, -jnp.inf)
        m_old = gmax[:]
        m_new = jnp.maximum(m_old,
                            jnp.max(logits, axis=1, keepdims=True))
        scale = jnp.exp(m_old - m_new)
        p = jnp.exp(logits - m_new[:, :1])
        acc_g[:] = acc_g[:] * scale + jnp.dot(
            p, pk_ref[:], preferred_element_type=jnp.float32
        )
        gmax[:] = m_new

        @pl.when(j == num_j - 1)
        def _finish_gp():
            acc = acc_g[:]
            mean_c = acc[:, 2 * d:3 * d] / acc[:, 3 * d:3 * d + 1]
            gp_ref[:] = jnp.zeros_like(gp_ref)
            gp_ref[:, 0:d] = (mean_c - xp[:, 0:d]) * (2.0 * pinv2)

    # ---- phi stream for row block i (then the SGD commit) ----
    @pl.when(i < num_i)
    def _phi_fold():
        @pl.when(j == 0)
        def _init():
            acc_p[:] = jnp.zeros_like(acc_p)

        xi = xi_ref[:]
        d2 = None
        for dd in range(d):
            diff = xi[:, dd:dd + 1] - xct_ref[dd:dd + 1, :]
            d2 = diff * diff if d2 is None else d2 + diff * diff
        k = jnp.exp(-d2 * inv2)
        # padded j rows: pk rows beyond m are zero (incl. the ones
        # column), so every accumulated column gets exact zeros
        acc_p[:] += jnp.dot(k, pk_ref[:],
                            preferred_element_type=jnp.float32)

        @pl.when(j == num_j - 1)
        def _finish_phi():
            acc = acc_p[:]
            xi_f = xi_ref[:]
            rows = acc[:, 3 * d:3 * d + 1]
            repel = (rows * xi_f[:, 0:d] - acc[:, d:2 * d]) \
                * (2.0 * inv2)
            phi = (acc[:, 0:d] + repel) * (1.0 / m_total)
            xnew_ref[:] = jnp.zeros_like(xi_f)
            xnew_ref[:, 0:d] = xi_f[:, 0:d] + lr * phi
            xprev[:] = xnew_ref[:]


@functools.partial(jax.jit, static_argnames=("block_i", "block_j",
                                             "interpret"))
def fused_mpf_stream_step(x, score, centers, bw, pbw, lr,
                          block_i=256, block_j=8192, interpret=False):
    """One SVGD iteration + the NEXT iteration's GMM prior score in one
    Pallas program. x, score [m, d]; centers [k==m, d]; bw (kernel),
    pbw (prior), lr scalars. Returns (x_new [m, d], gp_new [m, d]) with
    x_new = x + lr * phi(x, score) and gp_new = gmm_score(x_new,
    centers, pbw). Requires 3 * d + 1 <= 128 lanes and d <= 8."""
    m, d = x.shape
    if d > 8:
        raise ValueError("fused MPF stream layout requires d <= 8")
    if centers.shape[0] != m:
        raise ValueError("fused MPF stream expects k == m (MPF priors "
                         "are centered on the particles)")
    mp = _round_up(max(m, max(block_i, block_j)), block_i)
    mp = _round_up(mp, block_j)
    dp = 128
    num_i = mp // block_i
    num_j = mp // block_j

    xp = jnp.zeros((mp, dp), jnp.float32).at[:m, :d].set(x)
    xct = (jnp.zeros((16, mp), jnp.float32)
           .at[:d, :m].set(x.T)
           .at[8:8 + d, :m].set(centers.T))
    pk = (jnp.zeros((mp, dp), jnp.float32)
          .at[:m, 0:d].set(score)
          .at[:m, d:2 * d].set(x)
          .at[:m, 2 * d:3 * d].set(centers)
          .at[:m, 3 * d].set(1.0))
    scal = jnp.stack([
        jnp.asarray(bw, jnp.float32).reshape(()),
        jnp.asarray(pbw, jnp.float32).reshape(()),
        jnp.asarray(lr, jnp.float32).reshape(()),
        jnp.float32(0.0),
    ]).reshape(1, 4)

    kernel = functools.partial(
        _stream_step_kernel, block_i=block_i, block_j=block_j,
        m_total=m, num_i=num_i, num_j=num_j, d=d,
    )
    xnew, gp = pl.pallas_call(
        kernel,
        grid=(num_i + 1, num_j),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_i, dp),
                         lambda i, j: (jnp.minimum(i, num_i - 1), 0),
                         memory_space=pltpu.VMEM),             # x_i
            pl.BlockSpec((16, block_j), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),             # x^T/c^T
            pl.BlockSpec((block_j, dp), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),             # packed
        ],
        out_specs=[
            pl.BlockSpec((block_i, dp),
                         lambda i, j: (jnp.minimum(i, num_i - 1), 0),
                         memory_space=pltpu.VMEM),             # x_new
            pl.BlockSpec((block_i, dp),
                         lambda i, j: (jnp.maximum(i - 1, 0), 0),
                         memory_space=pltpu.VMEM),             # gp_new
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mp, dp), jnp.float32),
            jax.ShapeDtypeStruct((mp, dp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_i, dp), jnp.float32),            # acc_p
            pltpu.VMEM((block_i, dp), jnp.float32),            # acc_g
            pltpu.VMEM((block_i, dp), jnp.float32),            # gmax
            pltpu.VMEM((block_i, dp), jnp.float32),            # xprev
        ],
        interpret=interpret,
    )(scal, xp, xct, pk)
    return xnew[:m, :d], gp[:m, :d]
