"""Streaming Pallas kernel for the GMM-prior score function.

MPF's other O(m^2) object (besides the SVGD Gram): the gradient of the
uniform-mixture GMM prior around the particles,

    grad_i = sum_k r_ik (c_k - x_i) / bw^2,
    r_ik   = softmax_k( -||x_i - c_k||^2 / (2 bw^2) )

(`dust/inference/mpf.py:26-45` — the reference materializes the [m, m]
component log-prob matrix through autograd). Here each i-block streams
center blocks with the *online softmax* rescaling trick (flash-attention
pattern): running max, running normalizer, running weighted center sum —
the [m, m] responsibility matrix never exists, and (r2) the center set
streams through VMEM block-by-block on the SECOND grid axis, so VMEM
holds one [block_i, d] x-block + one [block_k, d] center block at a
time. (The r1 version held the whole padded center set in VMEM, which
failed to compile at m = 32768 — a 16.8 MB f32[32768, 128] operand —
the scale ceiling bench/probes/scale_limits_probe.py mapped.)

With `gmm_prior_score_pallas` + `svgd_phi_pallas` the entire large-m MPF
Stein update runs in two streaming kernels with no quadratic HBM traffic
and O(block) VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_svgd import _round_up


def gmm_prior_score_reference(x, centers, bw):
    """jnp oracle: grad log sum_k N(x | c_k, bw^2 I) w.r.t. x."""
    from .distance import squared_distance

    logits = -squared_distance(x, centers) / (2.0 * bw**2)
    r = jax.nn.softmax(logits, axis=1)                     # [m, k]
    return (r @ centers - x) / (bw**2)


def _score_kernel(bw_ref, xi_ref, ck_ref, out_ref,
                  vsum_ref, norm_ref, max_ref, *, block_k, k_total,
                  num_k):
    """Grid (i-blocks, k-blocks), k innermost: each step folds ONE
    center block into the i-block's running online-softmax state
    (running max / normalizer / weighted center sum live in scratch,
    which persists across grid steps); the output block is written on
    the last k step."""
    kb = pl.program_id(1)
    bw = bw_ref[0, 0]
    inv2 = 0.5 / (bw * bw)
    xi = xi_ref[:]
    xi_norm = jnp.sum(xi * xi, axis=1, keepdims=True)

    @pl.when(kb == 0)
    def _init():
        vsum_ref[:] = jnp.zeros_like(vsum_ref)
        norm_ref[:] = jnp.zeros_like(norm_ref)
        max_ref[:] = jnp.full_like(max_ref, -jnp.inf)

    ck = ck_ref[:]                                         # [bk, d]
    ck_norm = jnp.sum(ck * ck, axis=1)[None, :]
    cross = jnp.dot(xi, ck.T, preferred_element_type=jnp.float32)
    logits = -jnp.maximum(xi_norm + ck_norm - 2.0 * cross, 0.0) * inv2
    k_ids = jax.lax.broadcasted_iota(
        jnp.int32, logits.shape, dimension=1
    ) + kb * block_k
    logits = jnp.where(k_ids < k_total, logits, -jnp.inf)

    m_old = max_ref[:]                                     # [bm, d] bcast
    m_new = jnp.maximum(
        m_old, jnp.max(logits, axis=1, keepdims=True)
    )
    scale = jnp.exp(m_old - m_new)
    p = jnp.exp(logits - m_new[:, :1])                     # [bm, bk]
    vsum_ref[:] = vsum_ref[:] * scale + jnp.dot(
        p, ck, preferred_element_type=jnp.float32
    )
    norm_ref[:] = norm_ref[:] * scale + jnp.sum(
        p, axis=1, keepdims=True
    )
    max_ref[:] = m_new

    @pl.when(kb == num_k - 1)
    def _finish():
        mean_c = vsum_ref[:] / norm_ref[:]
        out_ref[:] = (mean_c - xi) / (bw * bw)


@functools.partial(jax.jit, static_argnames=("block_i", "block_k",
                                             "interpret"))
def gmm_prior_score_pallas(x, centers, bw, block_i=256, block_k=1024,
                           interpret=False):
    """Streaming GMM score. x [m, d], centers [k, d], bw scalar."""
    m, d = x.shape
    k = centers.shape[0]
    mp = _round_up(max(m, block_i), block_i)
    kp = _round_up(max(k, block_k), block_k)
    dp = max(_round_up(d, 128), 128)
    num_k = kp // block_k

    # the score is invariant under a common shift of x and centers
    # (responsibilities depend on distances; r rows sum to 1, so
    # r @ (c - mu) - (x - mu) = r @ c - x): center so the in-kernel MXU
    # Gram identity stays spread-scale (see ops/distance.py)
    mu = jax.lax.stop_gradient(jnp.mean(centers, axis=0, keepdims=True))
    x = x - mu
    centers = centers - mu
    xp = jnp.zeros((mp, dp), jnp.float32).at[:m, :d].set(x)
    cp = jnp.zeros((kp, dp), jnp.float32).at[:k, :d].set(centers)
    bw_arr = jnp.asarray(bw, jnp.float32).reshape(1, 1)

    kernel = functools.partial(
        _score_kernel, block_k=block_k, k_total=k, num_k=num_k
    )
    out = pl.pallas_call(
        kernel,
        grid=(mp // block_i, num_k),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_i, dp), lambda i, kb: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, dp), lambda i, kb: (kb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_i, dp), lambda i, kb: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, dp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((block_i, dp), jnp.float32),
            pltpu.VMEM((block_i, dp), jnp.float32),
            pltpu.VMEM((block_i, dp), jnp.float32),
        ],
        interpret=interpret,
    )(bw_arr, xp, cp)
    return out[:m, :d]


def _score_kernel_packed(bw_ref, xi_ref, ckt_ref, pk_ref, out_ref,
                         acc_ref, max_ref, *, block_k, k_total, num_k,
                         d, use_bf16):
    """Packed-layout GMM score tile (r3, VERDICT-r2 #6 — same move as
    `pallas_svgd._phi_kernel_packed`): explicit per-dimension broadcast
    diffs against a pre-transposed [8, bk] center block replace the
    128-lane Gram matmul, and the weighted-center sum plus the softmax
    normalizer ride ONE [bm, bk] x [bk, 128] matmul against
    `pk = [centers | ones]` (columns 0:d, d). The online-softmax
    rescale applies to the packed accumulator as a whole (numerator
    and denominator scale identically). The padded-col -inf mask is
    kept: vsum/norm are insensitive to a max shift, but a padded
    column's logit (-||x_i||^2 / 2bw^2) can exceed the true max and
    underflow the normalizer when x_i sits far from every center."""
    kb = pl.program_id(1)
    bw = bw_ref[0, 0]
    inv2 = 0.5 / (bw * bw)
    xi = xi_ref[:]

    @pl.when(kb == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        max_ref[:] = jnp.full_like(max_ref, -jnp.inf)

    d2 = None
    for dd in range(d):
        diff = xi[:, dd:dd + 1] - ckt_ref[dd:dd + 1, :]   # [bm, bk]
        d2 = diff * diff if d2 is None else d2 + diff * diff
    logits = -d2 * inv2
    k_ids = jax.lax.broadcasted_iota(
        jnp.int32, logits.shape, dimension=1
    ) + kb * block_k
    logits = jnp.where(k_ids < k_total, logits, -jnp.inf)

    m_old = max_ref[:]
    m_new = jnp.maximum(
        m_old, jnp.max(logits, axis=1, keepdims=True)
    )
    scale = jnp.exp(m_old - m_new)
    p = jnp.exp(logits - m_new[:, :1])                    # [bm, bk]
    if use_bf16:
        p = p.astype(jnp.bfloat16)
    acc_ref[:] = acc_ref[:] * scale + jnp.dot(
        p, pk_ref[:], preferred_element_type=jnp.float32
    )
    max_ref[:] = m_new

    @pl.when(kb == num_k - 1)
    def _finish():
        acc = acc_ref[:]
        mean_c = acc[:, 0:d] / acc[:, d:d + 1]
        out_ref[:] = jnp.zeros_like(out_ref)
        out_ref[:, 0:d] = (mean_c - xi[:, 0:d]) * (2.0 * inv2)


@functools.partial(jax.jit, static_argnames=("block_i", "block_k",
                                             "use_bf16", "interpret"))
def gmm_prior_score_pallas_packed(x, centers, bw, block_i=256,
                                  block_k=1024, use_bf16=False,
                                  interpret=False):
    """Packed-layout streaming GMM score (see `_score_kernel_packed`).
    Identical math to `gmm_prior_score_pallas`; requires d <= 8."""
    m, d = x.shape
    if d > 8 or d + 1 > 128:
        raise ValueError("packed GMM layout requires d <= 8")
    k = centers.shape[0]
    mp = _round_up(max(m, block_i), block_i)
    kp = _round_up(max(k, block_k), block_k)
    dp = 128
    num_k = kp // block_k

    mu = jax.lax.stop_gradient(jnp.mean(centers, axis=0, keepdims=True))
    x = x - mu
    centers = centers - mu
    xp = jnp.zeros((mp, dp), jnp.float32).at[:m, :d].set(x)
    ckt = jnp.zeros((8, kp), jnp.float32).at[:d, :k].set(centers.T)
    pk_dtype = jnp.bfloat16 if use_bf16 else jnp.float32
    pk = (jnp.zeros((kp, dp), jnp.float32)
          .at[:k, 0:d].set(centers)
          .at[:k, d].set(1.0)).astype(pk_dtype)
    bw_arr = jnp.asarray(bw, jnp.float32).reshape(1, 1)

    kernel = functools.partial(
        _score_kernel_packed, block_k=block_k, k_total=k, num_k=num_k,
        d=d, use_bf16=use_bf16
    )
    out = pl.pallas_call(
        kernel,
        grid=(mp // block_i, num_k),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_i, dp), lambda i, kb: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, block_k), lambda i, kb: (0, kb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, dp), lambda i, kb: (kb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_i, dp), lambda i, kb: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, dp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((block_i, dp), jnp.float32),
            pltpu.VMEM((block_i, dp), jnp.float32),
        ],
        interpret=interpret,
    )(bw_arr, xp, ckt, pk)
    return out[:m, :d]
