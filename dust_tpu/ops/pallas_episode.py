"""Whole-EPISODE Pallas megakernel for the pendulum DuSt-MPC loop.

The whole-solve kernel (`pallas_solve.py`) plus the fused MPF kernel
(`pallas_mpf.py`) left ~60% of the per-solve wall time in XLA glue
measured on TPU v5e (bench/exp_glue_probe.py: 17 us solve kernel +
23 us MPF kernel vs ~102 us for the full production step): threefry
action noise (n_act*m*hz normals/step), the rollout/matmul layout
transforms, GMM dynamics-parameter draws, the two Silverman bandwidth
sorts, the simulator step, and the scan plumbing between them.

This kernel runs the ENTIRE closed-loop episode — `steps` iterations of

  SVMPC solve (action-noise sampling, dynamics-param draws from the
  live MPF prior, all n_params x n_act x m rollouts + costs, DISCO
  update, Stein step, selection, roll, prior refresh;
  `dust/inference/svmpc.py:87-200`, `dust/controllers/disco.py:348-394`)
  -> simulator step (gym `Pendulum-v0` physics == `PendulumModel.step`
  with the episode's true parameters; `dust/utils/simulations.py:129`)
  -> MPF posterior update (Silverman bandwidth, `mpf_steps` SVGD
  iterations, prior refresh; `dust/inference/mpf.py:64-86`)

— as ONE Pallas program. Nothing leaves the chip until the episode
ends; per-step host/XLA work is zero.

RNG: the production path generates all noise in-kernel with the TPU
hardware PRNG (`pltpu.prng_random_bits`, Box-Muller), reseeded
per-step from (seed, step). This is a DIFFERENT stream than the plain
path's threefry — statistically equivalent, not bitwise. For numerical
validation the kernel has a host-noise mode (`host_noise=True`) where
every draw is passed in as an input; tests drive both this kernel and
the independently-tested `fused_pendulum_solve` /
`fused_pendulum_mpf_optimize` composition with identical noise and
compare trajectories exactly (tests/test_pallas_episode.py). TPU
interpret mode zero-stubs `prng_random_bits`, so host-noise mode is
also what CPU tests must use.

Bandwidths: the per-step KDEpy-convention Silverman rule
(`ops/bandwidth.py:silvermans_rule`; `dust/inference/svmpc.py:105`,
`dust/inference/mpf.py:72`) needs two order statistics of the flattened
particles. Sorting is hostile in-kernel; instead exact k-th order
statistics come from a rank-count: broadcast the <=128 values to a
[128, 128] tile, count pairwise v_i <= v_j per column, and take
min(v_j : count_j >= k) — exact for duplicates, three VPU ops.

Layout notes: action noise eps lives in a [hz*8, 128] VMEM scratch
(rows t*8+q hold timestep t / particle q, lanes are the n_act samples);
the rollout tiles it to the [n_params*m, 128] trajectory rows, and the
DISCO/likelihood reductions re-walk it per-timestep (row-masked
lane-reductions) instead of the [m, 128, 128] matmul layout the
whole-solve kernel uses — no transposes, no layout materialization.

Semantics = `FusedPendulumSVMPC` + `FusedPendulumMPF` +
`PendulumSimulation.episode_fn` at warm_up-gated steps (pendulum demo:
`demo/pendulum_config.yaml`, unweighted isotropic policy prior,
ExpectedCost/ExponentiatedUtility, SGD, roll strategy "repeat").
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MAX_SPEED = 8.0
_MAX_TORQUE = 2.0
_SWINGUP_W = 50.0
_NEG_BIG = -1e30
_POS_BIG = 1e30
# KDEpy's exact IQR normalizer (ops/bandwidth.py:_IQR_NORMALIZE_EXACT)
_IQR_NORM = 1.3489795003921634


def _uniform01(shape):
    """u ~ U[0, 1) from the hardware PRNG: 23 random mantissa bits OR'd
    onto the exponent of 1.0 give [1, 2), minus 1. (prng_random_bits
    yields int32 — bitcast before shifting, or >> is arithmetic.)"""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    fb = (bits >> jnp.uint32(9)) | jnp.uint32(0x3F800000)
    return pltpu.bitcast(fb, jnp.float32) - 1.0


def _normals(shape):
    """z ~ N(0, 1) via Box-Muller on hardware PRNG draws. When the row
    count allows, both branches (r cos, r sin) are used — half the PRNG
    draws and transcendentals per normal."""
    rows, cols = shape
    if rows % 16 == 0:
        half = rows // 2
        u1 = _uniform01((half, cols)) + (2.0 ** -24)   # (0, 1]
        u2 = _uniform01((half, cols))
        r = jnp.sqrt(-2.0 * jnp.log(u1))
        a = (2.0 * math.pi) * u2
        return jnp.concatenate([r * jnp.cos(a), r * jnp.sin(a)], axis=0)
    u1 = _uniform01(shape) + (2.0 ** -24)
    u2 = _uniform01(shape)
    return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos((2.0 * math.pi) * u2)


def _row_of_column(col, n_rows):
    """[n_rows, 1] column -> [1, 128] row (lane j = col[j], j < n_rows)
    without a transpose: broadcast and take the diagonal."""
    mat = jnp.broadcast_to(col, (n_rows, 128))
    rowi = jax.lax.broadcasted_iota(jnp.int32, (n_rows, 128), 0)
    lanei = jax.lax.broadcasted_iota(jnp.int32, (n_rows, 128), 1)
    return jnp.sum(jnp.where(rowi == lanei, mat, 0.0), axis=0,
                   keepdims=True)


def _order_stats(v_tile, n, ks):
    """Exact k-th order statistics (1-indexed ks, static) of the first
    `n` elements (row-major) of v_tile [R, 128]. Pad elements must hold
    +_POS_BIG. Rank-count trick: cnt_e = #{e' valid : v_e' <= v_e}; the
    k-th smallest is min{v_e : cnt_e >= k} (exact under duplicates).
    Cross-row counting costs R^2 [128, 128] compare+reduce passes —
    R is 1 (pendulum, 90 values) or 4 (particle task, 480 values)."""
    nrows = v_tile.shape[0]
    rowi = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    lanei = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)

    # per-source-row value columns: vcol_r[i] = v[r, i]
    vcols = []
    valid_counts = []
    for r in range(nrows):
        mat = jnp.broadcast_to(v_tile[r:r + 1, :], (128, 128))
        vcols.append(
            jnp.sum(jnp.where(rowi == lanei, mat, 0.0), axis=1,
                    keepdims=True)
        )
        lo = r * 128
        valid_counts.append(max(0, min(128, n - lo)))

    cnts = []                                            # per row: [1, 128]
    for r in range(nrows):
        row = jnp.broadcast_to(v_tile[r:r + 1, :], (128, 128))
        cnt = jnp.zeros((1, 128), jnp.float32)
        for rp in range(nrows):
            nv = valid_counts[rp]
            if nv == 0:
                continue
            cnt = cnt + jnp.sum(
                jnp.where((vcols[rp] <= row) & (rowi < nv), 1.0, 0.0),
                axis=0, keepdims=True,
            )
        cnts.append(cnt)

    outs = []
    for k in ks:
        best = None
        for r in range(nrows):
            sel = jnp.min(
                jnp.where(cnts[r] >= float(k), v_tile[r:r + 1, :],
                          _POS_BIG)
            )
            best = sel if best is None else jnp.minimum(best, sel)
        outs.append(best)
    return outs


def _percentile_ks(n, q):
    """jnp.percentile 'linear' interpolation plan: 1-indexed order
    statistics (k_lo, k_hi) and fraction for percentile q of n values."""
    pos = q / 100.0 * (n - 1)
    lo = int(math.floor(pos))
    frac = pos - lo
    return lo + 1, min(lo + 2, n), frac


def _bitonic_sort_rows(v):
    """Ascending bitonic sort of every row of v [R, 128] independently:
    28 lane-wise compare-exchange stages (roll-pair partner exchange) —
    all R rows sort in parallel in the same single-vreg ops, vs the
    rank-count trick's per-row [128, 128] passes. Row-local only (rolls
    move lanes within a row), so a NaN'd row cannot leak sideways."""
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    k = 2
    while k <= 128:
        j = k // 2
        while j >= 1:
            low = lane & j == 0            # lower lane of each pair
            w = jnp.where(low, pltpu.roll(v, shift=128 - j, axis=1),
                          pltpu.roll(v, shift=j, axis=1))
            take_min = (lane & k == 0) == low
            v = jnp.where(take_min, jnp.minimum(v, w),
                          jnp.maximum(v, w))
            j //= 2
        k *= 2
    return v


def _rot_sincos(x, xmax):
    """sin/cos of the per-rollout-step rotation angle x = om * dt.

    The rollout advances theta only by om * dt with |om| clamped to
    _MAX_SPEED, so |x| <= _MAX_SPEED * dt (xmax, static). Tracking
    (cos th, sin th) by plane rotation and evaluating the rotation
    trig with short Taylor polynomials replaces the two full-range
    transcendentals per rollout step (measured: 45% of the whole
    sweep-megakernel group-step) with ~10 fused mul/adds. Truncation
    is below float32 rounding for the production dt (xmax = 0.4:
    sin err <= xmax^9/9! ~ 7e-10, cos err <= xmax^8/8! ~ 1.6e-8);
    larger static dt falls back to exact trig."""
    if xmax > 1.0:
        return jnp.sin(x), jnp.cos(x)
    x2 = x * x
    if xmax <= 0.5:
        s = x * (1.0 + x2 * (-1.0 / 6.0
                             + x2 * (1.0 / 120.0 - x2 * (1.0 / 5040.0))))
        c = 1.0 + x2 * (-0.5 + x2 * (1.0 / 24.0 - x2 * (1.0 / 720.0)))
    else:
        s = x * (1.0 + x2 * (-1.0 / 6.0 + x2 * (
            1.0 / 120.0 + x2 * (-1.0 / 5040.0 + x2 * (1.0 / 362880.0)))))
        c = 1.0 + x2 * (-0.5 + x2 * (1.0 / 24.0 + x2 * (
            -1.0 / 720.0 + x2 * (1.0 / 40320.0))))
    return s, c


def _silverman_rows(v_tile, n):
    """Row-batched `_silverman_row`: one KDEpy-convention Silverman
    bandwidth per ROW of v_tile [R, 128] (first n lanes valid per row,
    pad lanes must hold +_POS_BIG). Row-parallel moments plus ONE
    bitonic sort give exact per-row order statistics for all R rows at
    once. Returns [R, 1]."""
    lanei = jax.lax.broadcasted_iota(jnp.int32, v_tile.shape, 1)
    valid = lanei < n
    v0 = jnp.where(valid, v_tile, 0.0)
    s1 = jnp.sum(v0, axis=1, keepdims=True)
    s2 = jnp.sum(v0 * v0, axis=1, keepdims=True)
    mean = s1 / float(n)
    var = (s2 - float(n) * mean * mean) / float(n - 1)
    std = jnp.sqrt(jnp.maximum(var, 0.0))

    k25lo, k25hi, f25 = _percentile_ks(n, 25.0)
    k75lo, k75hi, f75 = _percentile_ks(n, 75.0)
    srt = _bitonic_sort_rows(v_tile)

    def at(kk):
        return jnp.sum(jnp.where(lanei == kk - 1, srt, 0.0), axis=1,
                       keepdims=True)

    q25 = at(k25lo) * (1.0 - f25) + at(k25hi) * f25
    q75 = at(k75lo) * (1.0 - f75) + at(k75hi) * f75
    iqr = (q75 - q25) * (1.0 / _IQR_NORM)
    sigma = jnp.where(iqr > 0, jnp.minimum(std, iqr), std)
    return jnp.maximum(sigma * (n * 3.0 / 4.0) ** (-0.2), 1e-6)


def _silverman_row(v_tile, n):
    """KDEpy-convention Silverman bandwidth
    (`ops/bandwidth.py:silvermans_rule`) of the first n row-major
    elements of v_tile [R, 128] (pad elements must be +_POS_BIG):
    sigma = min(std_ddof1, IQR/1.34898) (IQR branch only if > 0),
    bw = max(sigma * (3n/4)^(-1/5), 1e-6)."""
    nrows = v_tile.shape[0]
    rowi = jax.lax.broadcasted_iota(jnp.int32, (nrows, 128), 0)
    lanei = jax.lax.broadcasted_iota(jnp.int32, (nrows, 128), 1)
    valid = rowi * 128 + lanei < n
    v0 = jnp.where(valid, v_tile, 0.0)
    s1 = jnp.sum(v0)
    s2 = jnp.sum(v0 * v0)
    mean = s1 / float(n)
    var = (s2 - float(n) * mean * mean) / float(n - 1)
    std = jnp.sqrt(jnp.maximum(var, 0.0))

    k25lo, k25hi, f25 = _percentile_ks(n, 25.0)
    k75lo, k75hi, f75 = _percentile_ks(n, 75.0)
    q25lo, q25hi, q75lo, q75hi = _order_stats(
        v_tile, n, (k25lo, k25hi, k75lo, k75hi)
    )
    q25 = q25lo * (1.0 - f25) + q25hi * f25
    q75 = q75lo * (1.0 - f75) + q75hi * f75
    iqr = (q75 - q25) * (1.0 / _IQR_NORM)
    sigma = jnp.where(iqr > 0, jnp.minimum(std, iqr), std)
    return jnp.maximum(sigma * (n * 3.0 / 4.0) ** (-0.2), 1e-6)


def _pendulum_episode_kernel(
        seed_ref, scal_ref, theta0_ref, locs0_ref, amat0_ref, aseq0_ref,
        mpfx0_ref, *rest,
        steps, warm_up, hz, m, n_params, n_act, m_mpf, mpf_steps,
        dt, g_model, g_sim, exp_util, mpf_log_space, mpf_fixed_bw,
        mpf_bw_scale, host_noise, unroll):
    """One whole pendulum DuSt episode.

    seed (SMEM int32 [1, 2]); scal (SMEM f32 [1, 16]):
    [th0, om0, ctrl_sigma, lr, alpha, inv_temp, inv_s2, inv_ps2,
    il_true, im_true, mpf_lr, mpf_sigma, prior_bw0, log_mix, 0, 0].
    theta0/locs0/amat0/aseq0 [8, 128] (lanes 0:hz); mpfx0 [mp, 128]
    (lanes 0:2 = length, mass).

    host_noise mode appends inputs eps_in [steps*hz*8, 128],
    pdz_in [steps*8, 128] (param-draw normals, lanes 0:2),
    pdu_in [steps*8, 128] (component-choice uniforms, lane 0).

    Outputs: log [steps_p, 128] (lanes: th, om, action, cost, bw_sv,
    bw_mpf), theta_out/locs_out/amat_out [8, 128], mpfx_out [mp, 128].
    Scratch: eps [hz*8, 128], sstate SMEM (th_sim, om_sim, prior_bw).
    """
    if host_noise:
        (eps_in_ref, pdz_in_ref, pdu_in_ref,
         log_ref, theta_out_ref, locs_out_ref, amat_out_ref,
         mpfx_out_ref,
         eps_ref, theta_ref, locs_ref, amat_ref,
         mpfx_ref, sstate_ref) = rest
    else:
        (log_ref, theta_out_ref, locs_out_ref, amat_out_ref,
         mpfx_out_ref,
         eps_ref, theta_ref, locs_ref, amat_ref,
         mpfx_ref, sstate_ref) = rest

    rows = n_params * m
    mp = mpfx0_ref.shape[0]
    ev = hz  # dim_a == 1

    sigma_c = scal_ref[0, 2]
    lr = scal_ref[0, 3]
    alpha = scal_ref[0, 4]
    inv_temp = scal_ref[0, 5]
    inv_s2 = scal_ref[0, 6]
    inv_ps2 = scal_ref[0, 7]
    il_true = scal_ref[0, 8]
    im_true = scal_ref[0, 9]
    mpf_lr = scal_ref[0, 10]
    mpf_sigma = scal_ref[0, 11]
    log_mix = scal_ref[0, 13]

    theta_ref[:] = theta0_ref[:]
    locs_ref[:] = locs0_ref[:]
    amat_ref[:] = amat0_ref[:]
    mpfx_ref[:] = mpfx0_ref[:]
    sstate_ref[0, 0] = scal_ref[0, 0]
    sstate_ref[0, 1] = scal_ref[0, 1]
    sstate_ref[0, 2] = scal_ref[0, 12]

    aseq_row = aseq0_ref[0:1, :]                         # [1, 128] const

    lane8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    row8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    lane_m = jax.lax.broadcasted_iota(jnp.int32, (m, 128), 1)
    row24 = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 0)
    q_of_row = row24 - (row24 // m) * m                  # row p*m+q -> q
    p_of_row = row24 // m

    def step(t, _):
        if not host_noise:
            # hardware seed takes at most 2 scalars: fold the step index
            # into the second word (unique per (episode, step) for any
            # episode count and steps < 100003)
            pltpu.prng_seed(seed_ref[0, 0], seed_ref[0, 1] * 100003 + t)
            # fixed draw order: action eps, param normals, param uniforms
            eps_ref[:] = _normals((hz * 8, 128))
            pdz = _normals((8, 128))
            pdu = _uniform01((8, 128))
        else:
            eps_ref[:] = eps_in_ref[pl.ds(t * hz * 8, hz * 8), :]
            pdz = pdz_in_ref[pl.ds(t * 8, 8), :]
            pdu = pdu_in_ref[pl.ds(t * 8, 8), :]

        theta8 = theta_ref[:]                            # [8, 128]
        theta = theta8[0:m, :]                           # [m, 128]
        locs = locs_ref[0:m, :]
        mpfx = mpfx_ref[:]                               # [mp, 128]
        prior_bw = sstate_ref[0, 2]

        # ---- SVMPC Silverman bandwidth over the m*hz flattened
        # particles (`svmpc.py:105` convention) ----
        sv_row = jnp.full((1, 128), _POS_BIG, jnp.float32)
        for q in range(m):
            chunk = pltpu.roll(theta8[q:q + 1, :], shift=q * hz, axis=1)
            lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            in_chunk = (lane1 >= q * hz) & (lane1 < (q + 1) * hz)
            sv_row = jnp.where(in_chunk, chunk, sv_row)
        bw_sv = _silverman_row(sv_row, m * hz)
        inv_bw2 = 1.0 / (bw_sv * bw_sv)
        inv_2bw2 = 0.5 * inv_bw2

        # ---- dynamics-parameter draws from the live MPF prior
        # (GMM: uniform mixture on the m_mpf particles, isotropic
        # prior_bw; `simulation.py` passes mstate.prior each step) ----
        x0col = mpfx[:, 0:1]
        x1col = mpfx[:, 1:2]
        len_row = _row_of_column(x0col, mp)              # [1, 128]
        mass_row = _row_of_column(x1col, mp)
        lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        l8 = jnp.zeros((8, 1), jnp.float32)
        m8 = jnp.zeros((8, 1), jnp.float32)
        row8c = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
        for p in range(n_params):
            u = pdu[p:p + 1, 0:1]                        # [1, 1]
            idx = jnp.minimum(
                jnp.floor(u * float(m_mpf)), float(m_mpf - 1)
            )
            sel = lane1.astype(jnp.float32) == idx
            lp = jnp.sum(jnp.where(sel, len_row, 0.0))
            mq = jnp.sum(jnp.where(sel, mass_row, 0.0))
            l8 = jnp.where(row8c == p, lp, l8)
            m8 = jnp.where(row8c == p, mq, m8)
        l8 = l8 + prior_bw * pdz[:, 0:1]
        m8 = m8 + prior_bw * pdz[:, 1:2]
        if mpf_log_space:
            # params_log_space: draws are log-params (`experiments.py`)
            l8 = jnp.exp(l8)
            m8 = jnp.exp(m8)

        il24 = jnp.zeros((rows, 128), jnp.float32)
        im24 = jnp.zeros((rows, 128), jnp.float32)
        for p in range(n_params):
            # rank-0 scalars: Mosaic cannot broadcast [1,1] into both
            # sublanes and lanes, but splats a scalar fine
            il24 = jnp.where(
                p_of_row == p, 1.0 / jnp.sum(l8[p:p + 1, 0:1]), il24
            )
            im24 = jnp.where(
                p_of_row == p, 1.0 / jnp.sum(m8[p:p + 1, 0:1]), im24
            )

        # ---- rollouts + costs, all trajectories in VMEM
        # (`PendulumModel.step` physics + swing-up cost) ----
        c_grav = -3.0 * g_model * 0.5 * dt * il24
        c_act = 3.0 * dt * im24 * il24 * il24
        # Rollout state is (cos th, sin th, om) advanced by bounded-angle
        # plane rotation (_rot_sincos): the cost needs cos th, the torque
        # balance needs sin(th + pi) = -sin th, and th only moves by
        # om * dt per step — two full-tile transcendentals at init
        # replace 2 * hz of them. Vector trig on the splatted angle
        # (Mosaic has no scalar-core transcendentals).
        zs24 = jnp.zeros((rows, 128), jnp.float32)
        th0_full = zs24 + sstate_ref[0, 0]

        def roll_body(tt, carry):
            cost, cth, sth, om = carry
            cost = cost + _SWINGUP_W * (cth - 1.0) ** 2 + om * om
            e8 = eps_ref[pl.ds(tt * 8, 8), :]            # [8, 128]
            th_t = jnp.sum(
                jnp.where(lane8 == tt, theta8, 0.0), axis=1, keepdims=True
            )                                            # [8, 1]
            a8 = th_t + sigma_c * e8
            a24 = jnp.zeros((rows, 128), jnp.float32)
            for q in range(m):
                a24 = jnp.where(q_of_row == q, a8[q:q + 1, :], a24)
            a24 = jnp.clip(a24, -_MAX_TORQUE, _MAX_TORQUE)
            om = om + c_grav * (-sth) + c_act * a24
            om = jnp.clip(om, -_MAX_SPEED, _MAX_SPEED)
            sd, cd = _rot_sincos(om * dt, _MAX_SPEED * dt)
            return cost, cth * cd - sth * sd, sth * cd + cth * sd, om

        cost, cth, _, om = jax.lax.fori_loop(
            0, hz, roll_body,
            (zs24, jnp.cos(th0_full), jnp.sin(th0_full),
             zs24 + sstate_ref[0, 1]),
            unroll=hz if unroll else 1,
        )
        cost = cost + _SWINGUP_W * (cth - 1.0) ** 2 + om * om

        # ---- param-averaged costs + DISCO softmax update
        # (`disco.py:348-394`) ----
        mcost = cost[0:m, :]
        for p in range(1, n_params):
            mcost = mcost + cost[p * m:(p + 1) * m, :]
        mcost = mcost * (1.0 / n_params)
        valid = lane_m < n_act
        mcost_v = jnp.where(valid, mcost, _POS_BIG)

        beta = jnp.min(mcost_v)
        lc = jnp.where(valid, -(mcost - beta) * inv_temp, _NEG_BIG)
        row_max = jnp.max(lc, axis=1, keepdims=True)
        e = jnp.where(valid, jnp.exp(lc - row_max), 0.0)
        sum_e = jnp.sum(e, axis=1, keepdims=True)
        eta = row_max + jnp.log(sum_e)
        omega = e / sum_e                                # [m, 128]

        wl = jnp.where(valid, -mcost * alpha, _NEG_BIG)
        wl_max = jnp.max(wl, axis=1, keepdims=True)
        we = jnp.where(valid, jnp.exp(wl - wl_max), 0.0)
        we_sum = jnp.sum(we, axis=1, keepdims=True)
        w_lik = we / we_sum
        if exp_util:
            log_l = wl_max + jnp.log(we_sum) - math.log(float(n_act))
        else:
            log_l = -alpha * jnp.sum(
                jnp.where(valid, mcost, 0.0), axis=1, keepdims=True
            ) * (1.0 / n_act)

        # DISCO delta and analytic likelihood gradient, accumulated by
        # re-walking the eps scratch per timestep. The weights are
        # normalized (sum_l omega = sum_l w_lik = 1), so
        # sum_l w*(theta_t + sigma*eps - aseq_t) = theta_t - aseq_t +
        # sigma*sum_l w*eps — the per-iteration theta/aseq broadcasts
        # drop out of the loop and theta cancels exactly in the
        # likelihood gradient (see pallas_sweep_episode.py).
        def acc_body(tt, carry):
            de, we_acc = carry
            e8 = eps_ref[pl.ds(tt * 8, 8), :]
            dq = jnp.sum(omega * e8[0:m, :], axis=1, keepdims=True)
            wq = jnp.sum(w_lik * e8[0:m, :], axis=1, keepdims=True)
            de = de + jnp.where(lane_m == tt, dq, 0.0)
            we_acc = we_acc + jnp.where(lane_m == tt, wq, 0.0)
            return de, we_acc

        d_eps, w_eps = jax.lax.fori_loop(
            0, hz, acc_body,
            (jnp.zeros((m, 128), jnp.float32),
             jnp.zeros((m, 128), jnp.float32)),
            unroll=hz if unroll else 1,
        )
        delta = jnp.where(
            lane_m < hz, theta + sigma_c * d_eps - aseq_row, 0.0
        )
        glik = sigma_c * w_eps * inv_s2

        eta_max = jnp.max(eta, axis=0, keepdims=True)
        eta_e = jnp.exp(eta - eta_max)
        a_mix = eta_e / jnp.sum(eta_e, axis=0, keepdims=True)

        # ---- Stein direction + SGD step (`svmpc.py:32-95`) ----
        colm = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
        lp_pri = jnp.zeros((m, m), jnp.float32)
        for c in range(m):
            diff_c = theta - locs[c:c + 1, :]
            lp_c = (
                -0.5 * inv_ps2 * jnp.sum(diff_c * diff_c, axis=1,
                                         keepdims=True)
                + log_mix
            )
            lp_pri = jnp.where(colm == c, lp_c, lp_pri)
        r_max = jnp.max(lp_pri, axis=1, keepdims=True)
        r_e = jnp.exp(lp_pri - r_max)
        r = r_e / jnp.sum(r_e, axis=1, keepdims=True)
        score = glik
        for c in range(m):
            score = score + r[:, c:c + 1] * (locs[c:c + 1, :] - theta) \
                * inv_ps2

        kmat = jnp.zeros((m, m), jnp.float32)
        for c in range(m):
            diff_c = theta - theta[c:c + 1, :]
            k_c = jnp.exp(
                -inv_2bw2 * jnp.sum(diff_c * diff_c, axis=1, keepdims=True)
            )
            kmat = jnp.where(colm == c, k_c, kmat)
        k_score = jnp.zeros((m, 128), jnp.float32)
        k_theta = jnp.zeros((m, 128), jnp.float32)
        for c in range(m):
            k_score = k_score + kmat[:, c:c + 1] * score[c:c + 1, :]
            k_theta = k_theta + kmat[:, c:c + 1] * theta[c:c + 1, :]
        rowsum_k = jnp.sum(kmat, axis=1, keepdims=True)
        grad_k = -(k_theta - rowsum_k * theta) * inv_bw2
        phi = (k_score + grad_k) * (1.0 / m)
        ev_mask = lane_m < ev
        theta_new = jnp.where(ev_mask, theta + lr * phi, 0.0)

        # ---- forward: weights / select / roll (`svmpc.py:128-208`) ----
        lp_new = jnp.zeros((m, m), jnp.float32)
        for c in range(m):
            diff_c = theta_new - locs[c:c + 1, :]
            lp_c = (
                -0.5 * inv_ps2 * jnp.sum(diff_c * diff_c, axis=1,
                                         keepdims=True)
                + log_mix
            )
            lp_new = jnp.where(colm == c, lp_c, lp_new)
        n_max = jnp.max(lp_new, axis=1, keepdims=True)
        log_p = n_max + jnp.log(
            jnp.sum(jnp.exp(lp_new - n_max), axis=1, keepdims=True)
        )
        log_w = log_l + log_p
        w_max = jnp.max(log_w, axis=0, keepdims=True)
        w_e = jnp.exp(log_w - w_max)
        weights = w_e / jnp.sum(w_e, axis=0, keepdims=True)

        rowm1 = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
        is_max = log_w >= w_max
        i_star = jnp.min(jnp.where(is_max, rowm1, m))
        onehot = (rowm1 == i_star).astype(jnp.float32)
        a_seq_sel = jnp.sum(onehot * theta_new, axis=0, keepdims=True)

        rolled = pltpu.roll(theta_new, shift=128 - 1, axis=1)
        theta_fwd = jnp.where(
            lane_m < (hz - 1), rolled,
            jnp.where(lane_m < ev, theta_new, 0.0),
        )

        # ---- warm-up gate + state commits ----
        lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        act_sel = jnp.sum(jnp.where(lane1 == 0, a_seq_sel, 0.0))
        if warm_up > 0:
            active = t >= warm_up
            action = jnp.where(active, act_sel, 0.0)
            theta_next = jnp.where(active, theta_fwd, theta_new)
            locs_next = jnp.where(active, theta_fwd, locs)
        else:
            action = act_sel
            theta_next = theta_fwd
            locs_next = theta_fwd
        theta_ref[0:m, :] = theta_next
        locs_ref[0:m, :] = locs_next
        amat_ref[0:m, :] = amat_ref[0:m, :] + delta

        # ---- simulator step: gym Pendulum-v0 physics with the
        # episode's TRUE parameters (`simulations.py:129`) ----
        th_s = sstate_ref[0, 0]
        om_s = sstate_ref[0, 1]
        a_cl = jnp.clip(action, -_MAX_TORQUE, _MAX_TORQUE)
        om2 = om_s + (
            -3.0 * g_sim * 0.5 * il_true * jnp.sin(th_s + math.pi)
            + 3.0 * im_true * il_true * il_true * a_cl
        ) * dt
        om2 = jnp.clip(om2, -_MAX_SPEED, _MAX_SPEED)
        th2 = th_s + om2 * dt
        cost_t = _SWINGUP_W * (jnp.cos(th2) - 1.0) ** 2 + om2 * om2

        # ---- MPF posterior update (`mpf.py:64-86`): condition on the
        # new observation, Silverman bandwidth, mpf_steps SVGD
        # iterations, prior refresh ----
        if mpf_fixed_bw is not None:
            bw_mpf = jnp.float32(mpf_fixed_bw)
        else:
            r0 = _row_of_column(x0col, mp)
            r1 = _row_of_column(x1col, mp)
            lane1b = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            mrow = jnp.where(
                lane1b < m_mpf, r0,
                jnp.where(
                    lane1b < 2 * m_mpf,
                    pltpu.roll(r1, shift=m_mpf, axis=1),
                    _POS_BIG,
                ),
            )
            bw_mpf = _silverman_row(mrow, 2 * m_mpf) * mpf_bw_scale

        # NOTE: prior bandwidth here is the PREVIOUS step's Silverman bw
        # (the prior was refreshed with it at the end of the last
        # optimize, `mpf.py:85`); this step's bw_mpf becomes the new
        # prior bandwidth below.
        centers = mpfx                                   # fixed in loop
        prior_pbw2 = 1.0 / (prior_bw * prior_bw)
        inv_mbw2 = 1.0 / (bw_mpf * bw_mpf)
        inv_os2 = 1.0 / (mpf_sigma * mpf_sigma)
        sin_t = jnp.sin(th_s + math.pi)

        mrow_ids = jax.lax.broadcasted_iota(jnp.int32, (mp, 1), 0)
        valid_row = mrow_ids < m_mpf
        mlane = jax.lax.broadcasted_iota(jnp.int32, (mp, 128), 1)
        lane_mp1 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        valid_lane1 = lane_mp1 < m_mpf
        c0col = centers[:, 0:1]
        c1col = centers[:, 1:2]
        # colfull: [1, mp] row -> [mp, 128] column broadcast via one
        # diagonal select + one MXU matmul (no sublane<->lane relayout;
        # ones128 sums the single nonzero diagonal entry per row and
        # broadcasts it across all lanes). Single scenario: no NaN
        # isolation concern (a NaN already poisons the whole episode).
        mdiag_mp = (mlane == mrow_ids)
        ones128 = jnp.ones((128, 128), jnp.float32)

        def colfull(row_t):
            d = jnp.where(mdiag_mp, jnp.broadcast_to(row_t, (mp, 128)),
                          0.0)
            return jax.lax.dot_general(
                d, ones128, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        def mpf_body(i, carry):
            # TRANSPOSED body (see pallas_sweep_episode.py): the state
            # rides the carry in ROW layout [1, mp]; pairwise matrices
            # put the SUMMED particle index on the sublane axis so all
            # reductions are axis-0 row sums; the column operands are
            # rebuilt with colfull (MXU) instead of the old
            # [mp,1]->[1,mp] reshapes, and the old per-iteration
            # mpfx_ref read-modify-write becomes one commit after the
            # loop.
            x0t, x1t = carry
            length = jnp.where(valid_lane1, x0t, 1.0)
            mass = jnp.where(valid_lane1, x1t, 1.0)
            if mpf_log_space:
                length = jnp.exp(length)
                mass = jnp.exp(mass)
            ilx = 1.0 / length
            imx = 1.0 / mass
            tdd = -3.0 * g_model * 0.5 * ilx * sin_t \
                + 3.0 * imx * ilx * ilx * a_cl
            td_raw = om_s + dt * tdd
            td = jnp.clip(td_raw, -_MAX_SPEED, _MAX_SPEED)
            thp = th_s + td * dt
            gate = jnp.where(
                (td_raw > -_MAX_SPEED) & (td_raw < _MAX_SPEED), 1.0, 0.0
            )
            dtd_dl = gate * dt * (
                3.0 * g_model * 0.5 * ilx * ilx * sin_t
                - 6.0 * imx * ilx * ilx * ilx * a_cl
            )
            dtd_dm = gate * dt * (-3.0 * imx * imx * ilx * ilx * a_cl)
            r0d = thp - th2
            r1d = td - om2
            common = -(r0d * dt + r1d) * inv_os2
            gl_l = common * dtd_dl
            gl_m = common * dtd_dm
            if mpf_log_space:
                gl_l = gl_l * length
                gl_m = gl_m * mass

            # prior responsibilities, transposed: rows = centers q
            # (fixed columns c0col/c1col), lanes = current particles
            d2c = (x0t - c0col) ** 2 + (x1t - c1col) ** 2
            logits = jnp.where(valid_row, -0.5 * d2c * prior_pbw2,
                               -jnp.inf)
            mx = jnp.max(logits, axis=0, keepdims=True)
            pz = jnp.exp(logits - mx)
            psum = jnp.sum(pz, axis=0, keepdims=True)
            pc0 = jnp.sum(pz * c0col, axis=0, keepdims=True) / psum
            pc1 = jnp.sum(pz * c1col, axis=0, keepdims=True) / psum
            gp0 = (pc0 - x0t) * prior_pbw2
            gp1 = (pc1 - x1t) * prior_pbw2

            s0 = jnp.where(valid_lane1, gl_l + gp0, 0.0)
            s1 = jnp.where(valid_lane1, gl_m + gp1, 0.0)

            # repulsion folds into the drive sum (see
            # pallas_sweep_episode.py): phi(l) = sum_q k_ql*(s_q -
            # x_q/bw^2) + (sum_q k_ql)*x_l/bw^2
            x0c = colfull(x0t)
            x1c = colfull(x1t)
            t0c = colfull(s0 - x0t * inv_mbw2)
            t1c = colfull(s1 - x1t * inv_mbw2)
            d2 = (x0c - x0t) ** 2 + (x1c - x1t) ** 2
            k = jnp.where(valid_row, jnp.exp(-0.5 * d2 * inv_mbw2), 0.0)
            rows_k = jnp.sum(k, axis=0, keepdims=True)
            drive0 = jnp.sum(k * t0c, axis=0, keepdims=True)
            drive1 = jnp.sum(k * t1c, axis=0, keepdims=True)
            phi0 = (drive0 + rows_k * x0t * inv_mbw2) \
                / jnp.float32(m_mpf)
            phi1 = (drive1 + rows_k * x1t * inv_mbw2) \
                / jnp.float32(m_mpf)
            return (
                x0t + jnp.where(valid_lane1, mpf_lr * phi0, 0.0),
                x1t + jnp.where(valid_lane1, mpf_lr * phi1, 0.0),
            )

        zlane = jnp.zeros((1, 128 - mp), jnp.float32)
        x0t_f, x1t_f = jax.lax.fori_loop(
            0, mpf_steps, mpf_body,
            (jnp.concatenate([c0col.reshape(1, mp), zlane], axis=1),
             jnp.concatenate([c1col.reshape(1, mp), zlane], axis=1)),
            unroll=mpf_steps if unroll else 1)
        x0f = colfull(x0t_f)
        x1f = colfull(x1t_f)
        mpfx_ref[:] = jnp.where(
            valid_row & (mlane == 0), x0f,
            jnp.where(valid_row & (mlane == 1), x1f, mpfx_ref[:]))

        # ---- per-step log + carried scalars ----
        log_row = (
            jnp.where(lane1 == 0, th2, 0.0)
            + jnp.where(lane1 == 1, om2, 0.0)
            + jnp.where(lane1 == 2, action, 0.0)
            + jnp.where(lane1 == 3, cost_t, 0.0)
            + jnp.where(lane1 == 4, bw_sv, 0.0)
            + jnp.where(lane1 == 5, bw_mpf, 0.0)
        )
        log_ref[pl.ds(t, 1), :] = log_row
        sstate_ref[0, 0] = th2
        sstate_ref[0, 1] = om2
        sstate_ref[0, 2] = bw_mpf
        return 0

    jax.lax.fori_loop(0, steps, step, 0)

    theta_out_ref[:] = theta_ref[:]
    locs_out_ref[:] = locs_ref[:]
    amat_out_ref[:] = amat_ref[:]
    mpfx_out_ref[:] = mpfx_ref[:]


def _pad_tile(x, rows, lanes=128):
    x = jnp.asarray(x, jnp.float32).reshape(-1, x.shape[-1])
    return jnp.zeros((rows, lanes), jnp.float32).at[
        :x.shape[0], :x.shape[1]
    ].set(x)


def _round8(n):
    return -(-n // 8) * 8


@functools.partial(
    jax.jit,
    static_argnames=("steps", "warm_up", "hz", "m", "n_params", "n_act",
                     "m_mpf", "mpf_steps", "dt", "g_model", "g_sim",
                     "exp_util", "mpf_log_space", "mpf_fixed_bw",
                     "mpf_bw_scale", "unroll", "interpret"),
)
def fused_pendulum_episode(
        seed, state0, theta0, locs0, a_mat0, a_seq0, mpfx0, prior_bw0,
        true_length, true_mass, ctrl_sigma, lr, alpha, temp, prior_sigma,
        mpf_lr, mpf_sigma, *, steps, warm_up=0, hz, m, n_params, n_act,
        m_mpf, mpf_steps, dt=0.05, g_model=9.8, g_sim=10.0, exp_util=True,
        mpf_log_space=False, mpf_fixed_bw=None, mpf_bw_scale=1.0,
        unroll=False, host_eps=None, host_pdz=None, host_pdu=None,
        interpret=False):
    """Run one whole pendulum DuSt episode as ONE Pallas program.

    seed: int32 [2] (ignored in host-noise mode); state0 [2] initial
    (theta, theta_dot); theta0/locs0/a_mat0 [m, hz]; a_seq0 [hz];
    mpfx0 [m_mpf, 2]; prior_bw0 scalar (the init MPF prior bandwidth);
    true_length/true_mass: the simulator's episode parameters (traced).

    Host-noise mode (tests): pass host_eps [steps, hz, 8, 128] (action
    noise, rows q < m used), host_pdz [steps, 8, 128] (param-draw
    normals, lanes 0:2), host_pdu [steps, 8, 128] (component uniforms,
    lane 0). Actions are theta[q, t] + ctrl_sigma * eps[t, q, i]; the
    p-th dynamics draw is mpfx[floor(u_p * m_mpf)] + prior_bw * z_p.

    Returns dict: log arrays th/om/action/cost/bw_sv/bw_mpf [steps],
    final theta/locs/a_mat [m, hz], mpf particles [m_mpf, 2].
    """
    if hz > 128 or n_act > 128 or m > 8:
        raise ValueError("episode kernel: hz<=128, n_act<=128, m<=8")
    if m_mpf > 64:
        raise ValueError("episode kernel: m_mpf <= 64 (one lane row)")
    mp = _round8(max(m_mpf, 8))
    steps_p = _round8(steps)
    host_noise = host_eps is not None

    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 2)
    scal = jnp.stack([
        jnp.asarray(state0[0], jnp.float32),
        jnp.asarray(state0[1], jnp.float32),
        jnp.asarray(ctrl_sigma, jnp.float32).reshape(()),
        jnp.asarray(lr, jnp.float32).reshape(()),
        jnp.asarray(alpha, jnp.float32).reshape(()),
        1.0 / jnp.asarray(temp, jnp.float32).reshape(()),
        1.0 / jnp.asarray(ctrl_sigma, jnp.float32).reshape(()) ** 2,
        1.0 / jnp.asarray(prior_sigma, jnp.float32).reshape(()) ** 2,
        1.0 / jnp.asarray(true_length, jnp.float32).reshape(()),
        1.0 / jnp.asarray(true_mass, jnp.float32).reshape(()),
        jnp.asarray(mpf_lr, jnp.float32).reshape(()),
        jnp.asarray(mpf_sigma, jnp.float32).reshape(()),
        jnp.asarray(prior_bw0, jnp.float32).reshape(()),
        jnp.float32(-math.log(m)),
        jnp.float32(0.0), jnp.float32(0.0),
    ]).reshape(1, 16)

    inputs = [
        seed_arr, scal,
        _pad_tile(theta0, 8), _pad_tile(locs0, 8), _pad_tile(a_mat0, 8),
        _pad_tile(jnp.asarray(a_seq0).reshape(1, -1), 8),
        _pad_tile(mpfx0, mp),
    ]
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2 + \
        [pl.BlockSpec(memory_space=pltpu.VMEM)] * 5
    if host_noise:
        eps_flat = jnp.asarray(host_eps, jnp.float32).reshape(
            steps * hz * 8, 128
        )
        pdz_flat = jnp.asarray(host_pdz, jnp.float32).reshape(
            steps * 8, 128
        )
        pdu_flat = jnp.asarray(host_pdu, jnp.float32).reshape(
            steps * 8, 128
        )
        inputs += [eps_flat, pdz_flat, pdu_flat]
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3

    kernel = functools.partial(
        _pendulum_episode_kernel,
        steps=steps, warm_up=warm_up, hz=hz, m=m, n_params=n_params,
        n_act=n_act, m_mpf=m_mpf, mpf_steps=mpf_steps, dt=float(dt),
        g_model=float(g_model), g_sim=float(g_sim),
        exp_util=bool(exp_util), mpf_log_space=bool(mpf_log_space),
        mpf_fixed_bw=mpf_fixed_bw, mpf_bw_scale=float(mpf_bw_scale),
        host_noise=host_noise, unroll=bool(unroll),
    )
    outs = pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_shape=[
            jax.ShapeDtypeStruct((steps_p, 128), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
            jax.ShapeDtypeStruct((mp, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((hz * 8, 128), jnp.float32),        # eps
            pltpu.VMEM((8, 128), jnp.float32),             # theta
            pltpu.VMEM((8, 128), jnp.float32),             # locs
            pltpu.VMEM((8, 128), jnp.float32),             # amat
            pltpu.VMEM((mp, 128), jnp.float32),            # mpf x
            pltpu.SMEM((1, 8), jnp.float32),               # sim state
        ],
        interpret=interpret,
    )(*inputs)
    log, theta_out, locs_out, amat_out, mpfx_out = outs
    return {
        "th": log[:steps, 0],
        "om": log[:steps, 1],
        "action": log[:steps, 2],
        "cost": log[:steps, 3],
        "bw_sv": log[:steps, 4],
        "bw_mpf": log[:steps, 5],
        "theta": theta_out[:m, :hz],
        "locs": locs_out[:m, :hz],
        "a_mat": amat_out[:m, :hz],
        "mpf_x": mpfx_out[:m_mpf, :2],
    }
