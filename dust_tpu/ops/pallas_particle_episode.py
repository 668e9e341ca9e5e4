"""Whole-EPISODE Pallas megakernel for the particle-navigation DuSt loop.

Particle-task counterpart of `pallas_episode.py`: the ENTIRE closed-loop
obstacle-navigation episode — `steps` iterations of

  SVMPC solve (action-noise sampling, log-mass dynamics draws from the
  live MPF prior, all n_params x n_act x m double-integrator rollouts
  with gather-free rectangle collisions, DISCO update, Stein step,
  selection, roll, weighted-prior refresh; `dust/inference/svmpc.py`,
  `dust/controllers/disco.py:348-394`)
  -> simulator step (the model doubles as simulator with the episode's
  true mass, +load at steps//4; `demo/particle_example.py:177-242`)
  -> crash / goal termination masks (branchless done-masking, state
  freezes after termination; `dust/utils/simulations.py:250-257`)
  -> warm-up/done-gated MPF mass-posterior update
  (`dust/inference/mpf.py:64-86`, 1-D log-mass particles)

— runs as ONE Pallas program. See `pallas_episode.py` for the RNG
(hardware PRNG + Box-Muller; host-noise mode for CPU equivalence tests)
and order-statistics bandwidth machinery, both shared.

Semantics = `FusedParticleSVMPC` + `FusedParticleMPF` +
`simulation.particle_episode_fn` (particle demo:
`demo/particle_config.yaml`: weighted prior, log-space mass posterior,
fixed MPF bandwidth, ExponentiatedUtility, SGD, roll "repeat").
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_episode import (
    _NEG_BIG,
    _POS_BIG,
    _normals,
    _pad_tile,
    _round8,
    _row_of_column,
    _silverman_row,
    _uniform01,
)
from .pallas_particle_rollout import occupancy_hit


def _particle_episode_kernel(
        seed_ref, scal_ref, logmix0_ref, theta0_ref, locs0_ref, amat0_ref,
        aseq0_ref, mpfx0_ref, *rest,
        steps, warm_up, hz, m, n_params, n_act, m_mpf, mpf_steps, dt,
        max_acc, max_speed, weights, target, rects, grid, crash,
        success_dist, change_at, exp_util, weighted_prior, mpf_log_space,
        use_fixed_mpf_bw, mpf_bw_scale, host_noise, unroll):
    """One whole particle-navigation DuSt episode.

    seed (SMEM int32 [1, 2]); scal (SMEM f32 [1, 16]):
    [px0, py0, vx0, vy0, ctrl_sigma, lr, alpha, inv_temp, inv_s2,
    inv_ps2, base_mass, load, mpf_lr, mpf_sigma, prior_bw0,
    mpf_fixed_bw]; logmix0 (SMEM f32 [1, 8]): initial normalized prior
    mixture log-weights. theta0/locs0/amat0/aseq0 [8, 128] (lanes
    0:hz*2, flattened (t, ch)); mpfx0 [mp, 128] (lane 0 = log-mass).

    host_noise mode appends eps_in [steps*hz*16, 128] (x rows then y
    rows per step), pdz_in [steps*8, 128] (param-draw normals, lane 0),
    pdu_in [steps*8, 128] (component uniforms, lane 0).

    Outputs: log [steps_p, 128] (lanes: px, py, vx, vy, a_x, a_y, cost,
    done, crashed, cum, bw_sv, bw_mpf), theta/locs/amat [8, 128],
    mpfx [mp, 128]. Scratch: eps [hz*16, 128], px/py/vx/vy [rows, 128],
    theta/locs/amat [8, 128], mpfx [mp, 128], sstate SMEM [1, 16],
    logmix SMEM [1, 8].
    """
    if host_noise:
        (eps_in_ref, pdz_in_ref, pdu_in_ref,
         log_ref, theta_out_ref, locs_out_ref, amat_out_ref,
         mpfx_out_ref,
         eps_ref, px_ref, py_ref, vx_ref, vy_ref, theta_ref, locs_ref,
         amat_ref, mpfx_ref, sstate_ref, logmix_ref) = rest
    else:
        (log_ref, theta_out_ref, locs_out_ref, amat_out_ref,
         mpfx_out_ref,
         eps_ref, px_ref, py_ref, vx_ref, vy_ref, theta_ref, locs_ref,
         amat_ref, mpfx_ref, sstate_ref, logmix_ref) = rest

    rows = n_params * m
    mp = mpfx0_ref.shape[0]
    ev = hz * 2
    (w_px, w_py, w_vx, w_vy, w_cx, w_cy, w_obs,
     wt_px, wt_py, wt_vx, wt_vy) = weights
    tx, ty, tvx, tvy = target

    sigma_c = scal_ref[0, 4]
    lr = scal_ref[0, 5]
    alpha = scal_ref[0, 6]
    inv_temp = scal_ref[0, 7]
    inv_s2 = scal_ref[0, 8]
    inv_ps2 = scal_ref[0, 9]
    base_mass = scal_ref[0, 10]
    load = scal_ref[0, 11]
    mpf_lr = scal_ref[0, 12]
    mpf_sigma = scal_ref[0, 13]

    theta_ref[:] = theta0_ref[:]
    locs_ref[:] = locs0_ref[:]
    amat_ref[:] = amat0_ref[:]
    mpfx_ref[:] = mpfx0_ref[:]
    for i in range(4):
        sstate_ref[0, i] = scal_ref[0, i]            # sim state
    sstate_ref[0, 4] = 0.0                           # done
    sstate_ref[0, 5] = 0.0                           # crashed
    sstate_ref[0, 6] = 0.0                           # cum cost
    for i in range(4):
        sstate_ref[0, 7 + i] = scal_ref[0, i]        # lik.loc = init obs
    sstate_ref[0, 11] = scal_ref[0, 14]              # prior_bw
    for c in range(m):
        logmix_ref[0, c] = logmix0_ref[0, c]

    aseq_row = aseq0_ref[0:1, :]

    lane8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    lane_m = jax.lax.broadcasted_iota(jnp.int32, (m, 128), 1)
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    row24 = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 0)
    q_of_row = row24 - (row24 // m) * m
    p_of_row = row24 // m

    def occ_scalar(px, py):
        """Occupancy at one world point (gather-free rectangle
        membership, `models/obstacle_map.py` decomposition)."""
        if rects is None:
            return jnp.float32(0.0)
        inv_cell, offx, offy, ximax, yimax = grid
        xi = jnp.clip(jnp.floor(px * inv_cell + offx), 0.0, ximax)
        yi = jnp.clip(jnp.floor(py * inv_cell + offy), 0.0, yimax)
        return jnp.where(occupancy_hit(xi, yi, rects, (ximax, yimax)), 1.0, 0.0)

    def occ_tile(px, py):
        if rects is None:
            return None
        inv_cell, offx, offy, ximax, yimax = grid
        xi = jnp.clip(jnp.floor(px * inv_cell + offx), 0.0, ximax)
        yi = jnp.clip(jnp.floor(py * inv_cell + offy), 0.0, yimax)
        return jnp.where(occupancy_hit(xi, yi, rects, (ximax, yimax)), 1.0, 0.0)

    def state_cost_tile(px, py, vx, vy, occ, quad):
        wpx, wpy, wvx, wvy = quad
        c = (wpx * (px - tx) ** 2 + wpy * (py - ty) ** 2
             + wvx * (vx - tvx) ** 2 + wvy * (vy - tvy) ** 2)
        if occ is not None:
            c = c + w_obs * occ
        return c

    def step(t, _):
        if not host_noise:
            # hardware seed takes at most 2 scalars (see pallas_episode)
            pltpu.prng_seed(seed_ref[0, 0], seed_ref[0, 1] * 100003 + t)
            eps_ref[:] = _normals((hz * 16, 128))
            pdz = _normals((8, 128))
            pdu = _uniform01((8, 128))
        else:
            eps_ref[:] = eps_in_ref[pl.ds(t * hz * 16, hz * 16), :]
            pdz = pdz_in_ref[pl.ds(t * 8, 8), :]
            pdu = pdu_in_ref[pl.ds(t * 8, 8), :]

        theta8 = theta_ref[:]
        theta = theta8[0:m, :]
        locs = locs_ref[0:m, :]
        mpfx = mpfx_ref[:]
        prior_bw = sstate_ref[0, 11]
        done0 = sstate_ref[0, 4]
        not_done = 1.0 - done0

        # ---- SVMPC Silverman bandwidth over m*hz*2 flattened values
        # (four 128-lane rows; `svmpc.py:105` convention) ----
        n_flat = m * ev
        n_rows_bw = -(-n_flat // 128)
        sv_rows = []
        pos = 0
        for rr in range(n_rows_bw):
            row = jnp.full((1, 128), _POS_BIG, jnp.float32)
            # fill lanes from theta rows: element index e = q*ev + l
            while pos < min((rr + 1) * 128, n_flat):
                q, l0 = divmod(pos, ev)
                lane_off = pos - rr * 128
                take = min(ev - l0, 128 - lane_off,
                           (rr + 1) * 128 - pos)
                chunk = pltpu.roll(
                    theta8[q:q + 1, :],
                    shift=(lane_off - l0) % 128, axis=1,
                )
                in_seg = (lane1 >= lane_off) & (lane1 < lane_off + take)
                row = jnp.where(in_seg, chunk, row)
                pos += take
            sv_rows.append(row)
        sv_tile = jnp.concatenate(sv_rows, axis=0) if n_rows_bw > 1 \
            else sv_rows[0]
        bw_sv = _silverman_row(sv_tile, n_flat)
        inv_bw2 = 1.0 / (bw_sv * bw_sv)
        inv_2bw2 = 0.5 * inv_bw2

        # ---- dynamics draws from the live MPF prior (1-D log-mass GMM,
        # uniform mixture, isotropic prior_bw; exp() into mass space —
        # `params_log_space`, experiments.py) ----
        mass_row = _row_of_column(mpfx[:, 0:1], mp)      # [1, 128]
        m8 = jnp.zeros((8, 1), jnp.float32)
        row8c = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
        for p in range(n_params):
            u = pdu[p:p + 1, 0:1]
            idx = jnp.minimum(
                jnp.floor(u * float(m_mpf)), float(m_mpf - 1)
            )
            sel = lane1.astype(jnp.float32) == idx
            mq = jnp.sum(jnp.where(sel, mass_row, 0.0))
            m8 = jnp.where(row8c == p, mq, m8)
        m8 = m8 + prior_bw * pdz[:, 0:1]
        if mpf_log_space:
            m8 = jnp.exp(m8)

        im24 = jnp.zeros((rows, 128), jnp.float32)
        for p in range(n_params):
            im24 = jnp.where(
                p_of_row == p, 1.0 / jnp.sum(m8[p:p + 1, 0:1]), im24
            )

        # ---- rollouts + costs (all trajectories in VMEM; physics and
        # rect collisions as `pallas_solve._particle_solve_kernel`) ----
        shape = (rows, 128)
        px_ref[:] = jnp.zeros(shape, jnp.float32) + sstate_ref[0, 0]
        py_ref[:] = jnp.zeros(shape, jnp.float32) + sstate_ref[0, 1]
        vx_ref[:] = jnp.zeros(shape, jnp.float32) + sstate_ref[0, 2]
        vy_ref[:] = jnp.zeros(shape, jnp.float32) + sstate_ref[0, 3]

        def tile_q(a8):
            a24 = jnp.zeros(shape, jnp.float32)
            for q in range(m):
                a24 = jnp.where(q_of_row == q, a8[q:q + 1, :], a24)
            return a24

        def actions_at(tt):
            """(a_x, a_y) [8, 128] at timestep tt: theta + sigma*eps."""
            ex = eps_ref[pl.ds(tt * 8, 8), :]
            ey = eps_ref[pl.ds(hz * 8 + tt * 8, 8), :]
            thx = jnp.sum(
                jnp.where(lane8 == 2 * tt, theta8, 0.0), axis=1,
                keepdims=True,
            )
            thy = jnp.sum(
                jnp.where(lane8 == 2 * tt + 1, theta8, 0.0), axis=1,
                keepdims=True,
            )
            return thx + sigma_c * ex, thy + sigma_c * ey

        def roll_body(tt, cost):
            px = px_ref[:]
            py = py_ref[:]
            vx = vx_ref[:]
            vy = vy_ref[:]
            occ = occ_tile(px, py)
            a8x, a8y = actions_at(tt)
            a_x = tile_q(a8x)
            a_y = tile_q(a8y)
            cost = cost + (
                state_cost_tile(px, py, vx, vy, occ,
                                (w_px, w_py, w_vx, w_vy))
                + w_cx * a_x * a_x + w_cy * a_y * a_y
            )
            acc_x = jnp.clip(a_x * im24, -max_acc, max_acc)
            acc_y = jnp.clip(a_y * im24, -max_acc, max_acc)
            if crash and occ is not None:
                scale = dt * (1.0 - occ)
            else:
                scale = dt
            px_ref[:] = px + vx * scale
            py_ref[:] = py + vy * scale
            vx_ref[:] = jnp.clip(vx + acc_x * scale, -max_speed,
                                 max_speed)
            vy_ref[:] = jnp.clip(vy + acc_y * scale, -max_speed,
                                 max_speed)
            return cost

        cost = jax.lax.fori_loop(
            0, hz, roll_body, jnp.zeros(shape, jnp.float32),
            unroll=hz if unroll else 1,
        )
        cost = cost + state_cost_tile(
            px_ref[:], py_ref[:], vx_ref[:], vy_ref[:],
            occ_tile(px_ref[:], py_ref[:]), (wt_px, wt_py, wt_vx, wt_vy),
        )

        # ---- param-averaged costs + DISCO update + likelihood weights
        # (`disco.py:348-394`, `svmpc.py:46-56`) ----
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
        omega = e / sum_e

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

        def acc_body(tt, carry):
            delta, wa = carry
            a8x, a8y = actions_at(tt)
            ax_m = a8x[0:m, :]
            ay_m = a8y[0:m, :]
            aseq_tx = jnp.sum(
                jnp.where(lane1 == 2 * tt, aseq_row, 0.0)
            )
            aseq_ty = jnp.sum(
                jnp.where(lane1 == 2 * tt + 1, aseq_row, 0.0)
            )
            dqx = jnp.sum(omega * (ax_m - aseq_tx), axis=1, keepdims=True)
            dqy = jnp.sum(omega * (ay_m - aseq_ty), axis=1, keepdims=True)
            wqx = jnp.sum(w_lik * ax_m, axis=1, keepdims=True)
            wqy = jnp.sum(w_lik * ay_m, axis=1, keepdims=True)
            delta = delta + jnp.where(lane_m == 2 * tt, dqx, 0.0) \
                + jnp.where(lane_m == 2 * tt + 1, dqy, 0.0)
            wa = wa + jnp.where(lane_m == 2 * tt, wqx, 0.0) \
                + jnp.where(lane_m == 2 * tt + 1, wqy, 0.0)
            return delta, wa

        delta, wa = jax.lax.fori_loop(
            0, hz, acc_body,
            (jnp.zeros((m, 128), jnp.float32),
             jnp.zeros((m, 128), jnp.float32)),
            unroll=hz if unroll else 1,
        )
        glik = (wa - theta) * inv_s2

        # ---- Stein direction + SGD step (weighted GMM prior:
        # per-component log-weights live in the logmix scratch) ----
        colm = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
        lp_pri = jnp.zeros((m, m), jnp.float32)
        for c in range(m):
            diff_c = theta - locs[c:c + 1, :]
            lp_c = (
                -0.5 * inv_ps2 * jnp.sum(diff_c * diff_c, axis=1,
                                         keepdims=True)
                + logmix_ref[0, c]
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
                -inv_2bw2 * jnp.sum(diff_c * diff_c, axis=1,
                                    keepdims=True)
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
                + logmix_ref[0, c]
            )
            lp_new = jnp.where(colm == c, lp_c, lp_new)
        n_max = jnp.max(lp_new, axis=1, keepdims=True)
        log_p = n_max + jnp.log(
            jnp.sum(jnp.exp(lp_new - n_max), axis=1, keepdims=True)
        )
        log_w = log_l + log_p
        w_max = jnp.max(log_w, axis=0, keepdims=True)
        w_e = jnp.exp(log_w - w_max)
        weights_post = w_e / jnp.sum(w_e, axis=0, keepdims=True)

        rowm1 = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
        is_max = log_w >= w_max
        i_star = jnp.min(jnp.where(is_max, rowm1, m))
        onehot = (rowm1 == i_star).astype(jnp.float32)
        a_seq_sel = jnp.sum(onehot * theta_new, axis=0, keepdims=True)

        rolled = pltpu.roll(theta_new, shift=128 - 2, axis=1)
        theta_fwd = jnp.where(
            lane_m < ev - 2, rolled,
            jnp.where(lane_m < ev, theta_new, 0.0),
        )

        # ---- warm-up gate + particle-state commits ----
        a_x_sel = jnp.sum(jnp.where(lane1 == 0, a_seq_sel, 0.0))
        a_y_sel = jnp.sum(jnp.where(lane1 == 1, a_seq_sel, 0.0))
        if warm_up > 0:
            active = (t >= warm_up).astype(jnp.float32)
        else:
            active = jnp.float32(1.0)
        a_x = active * a_x_sel
        a_y = active * a_y_sel
        act_b = active > 0.5
        theta_next = jnp.where(act_b, theta_fwd, theta_new)
        locs_next = jnp.where(act_b, theta_fwd, locs)
        theta_ref[0:m, :] = theta_next
        locs_ref[0:m, :] = locs_next
        amat_ref[0:m, :] = amat_ref[0:m, :] + delta
        if weighted_prior:
            lw_raw = jnp.log(jnp.maximum(weights_post, 1e-37))  # [m, 1]
            lmax = jnp.max(lw_raw, axis=0, keepdims=True)
            lse = lmax + jnp.log(
                jnp.sum(jnp.exp(lw_raw - lmax), axis=0, keepdims=True)
            )
            lw = lw_raw - lse                    # normalized log-softmax
            for c in range(m):
                lw_c = jnp.sum(lw[c:c + 1, 0:1])
                logmix_ref[0, c] = jnp.where(
                    act_b, lw_c, logmix_ref[0, c]
                )

        # ---- simulator step (the model itself; mass +load at
        # steps//4, crash-freeze, done-mask; `particle_episode_fn`) ----
        spx = sstate_ref[0, 0]
        spy = sstate_ref[0, 1]
        svx = sstate_ref[0, 2]
        svy = sstate_ref[0, 3]
        sim_mass = jnp.where(t >= change_at, base_mass + load, base_mass)
        occ_s = occ_scalar(spx, spy)
        s_scale = dt * (1.0 - occ_s) if crash else dt
        acc_x = jnp.clip(a_x / sim_mass, -max_acc, max_acc)
        acc_y = jnp.clip(a_y / sim_mass, -max_acc, max_acc)
        npx = spx + svx * s_scale
        npy = spy + svy * s_scale
        nvx = jnp.clip(svx + acc_x * s_scale, -max_speed, max_speed)
        nvy = jnp.clip(svy + acc_y * s_scale, -max_speed, max_speed)
        npx = jnp.where(done0 > 0.5, spx, npx)
        npy = jnp.where(done0 > 0.5, spy, npy)
        nvx = jnp.where(done0 > 0.5, svx, nvx)
        nvy = jnp.where(done0 > 0.5, svy, nvy)

        # ---- MPF mass-posterior update, gated on (t >= warm_up) and
        # not-done (`particle_episode_fn`; `mpf.py:64-86`) ----
        gate = (active * not_done) > 0.5
        lik_px = sstate_ref[0, 7]
        lik_py = sstate_ref[0, 8]
        lik_vx = sstate_ref[0, 9]
        lik_vy = sstate_ref[0, 10]
        if use_fixed_mpf_bw:
            bw_mpf = scal_ref[0, 15]
        else:
            mrow = _row_of_column(mpfx[:, 0:1], mp)
            mrow = jnp.where(lane1 < m_mpf, mrow, _POS_BIG)
            bw_mpf = _silverman_row(mrow, m_mpf) * mpf_bw_scale

        c0t = mpfx[:, 0:1].reshape(1, mp)
        prior_pbw2 = 1.0 / (prior_bw * prior_bw)
        inv_mbw2 = 1.0 / (bw_mpf * bw_mpf)
        inv_os2 = 1.0 / (mpf_sigma * mpf_sigma)
        mscale = dt * (1.0 - occ_scalar(lik_px, lik_py)) if crash else dt

        mrow_ids = jax.lax.broadcasted_iota(jnp.int32, (mp, 1), 0)
        valid_row = mrow_ids < m_mpf
        mlane = jax.lax.broadcasted_iota(jnp.int32, (mp, 128), 1)
        mcol_ids = jax.lax.broadcasted_iota(jnp.int32, (mp, mp), 1)
        valid_col = mcol_ids < m_mpf

        def vel_grad_term(a_j, v0_j, loc_j, invm):
            acc_raw = a_j * invm
            acc = jnp.clip(acc_raw, -max_acc, max_acc)
            g_a = jnp.where(
                (acc_raw > -max_acc) & (acc_raw < max_acc), 1.0, 0.0
            )
            v_raw = v0_j + acc * mscale
            pred = jnp.clip(v_raw, -max_speed, max_speed)
            g_v = jnp.where(
                (v_raw > -max_speed) & (v_raw < max_speed), 1.0, 0.0
            )
            dpred = g_v * g_a * (-a_j * invm * invm) * mscale
            return -(pred - loc_j) * inv_os2 * dpred

        def mpf_body(i, _):
            x = mpfx_ref[:]
            mass = jnp.where(valid_row, x[:, 0:1], 1.0)
            if mpf_log_space:
                mass = jnp.exp(mass)
            invm = 1.0 / mass
            gl = (vel_grad_term(a_x, lik_vx, nvx, invm)
                  + vel_grad_term(a_y, lik_vy, nvy, invm))
            if mpf_log_space:
                gl = gl * mass

            x0 = x[:, 0:1]
            x0t = x0.reshape(1, mp)
            d2c = (x0 - c0t) ** 2
            logits = jnp.where(valid_col, -0.5 * d2c * prior_pbw2,
                               -jnp.inf)
            mx = jnp.max(logits, axis=1, keepdims=True)
            pz = jnp.exp(logits - mx)
            psum = jnp.sum(pz, axis=1, keepdims=True)
            pc0 = jnp.sum(pz * c0t, axis=1, keepdims=True) / psum
            gp0 = (pc0 - x0) * prior_pbw2
            s0 = jnp.where(valid_row, gl + gp0, 0.0)

            # repulsion folds into the drive sum (see
            # pallas_sweep_episode.py): one fewer reduced product
            d2 = (x0 - x0t) ** 2
            k = jnp.where(valid_col, jnp.exp(-0.5 * d2 * inv_mbw2), 0.0)
            rows_k = jnp.sum(k, axis=1, keepdims=True)
            t0t = s0.reshape(1, mp) - x0t * inv_mbw2
            drive0 = jnp.sum(k * t0t, axis=1, keepdims=True)
            phi0 = (drive0 + rows_k * x0 * inv_mbw2) \
                / jnp.float32(m_mpf)
            upd = jnp.where(mlane == 0, phi0, 0.0)
            mpfx_ref[:] = jnp.where(
                valid_row, mpfx_ref[:] + mpf_lr * upd, mpfx_ref[:]
            )
            return 0

        jax.lax.fori_loop(0, mpf_steps, mpf_body, 0,
                          unroll=mpf_steps if unroll else 1)
        # commit only when gated (the cond in `particle_episode_fn`)
        mpfx_ref[:] = jnp.where(gate, mpfx_ref[:], mpfx)
        sstate_ref[0, 11] = jnp.where(gate, bw_mpf, prior_bw)
        sstate_ref[0, 7] = jnp.where(gate, npx, lik_px)
        sstate_ref[0, 8] = jnp.where(gate, npy, lik_py)
        sstate_ref[0, 9] = jnp.where(gate, nvx, lik_vx)
        sstate_ref[0, 10] = jnp.where(gate, nvy, lik_vy)

        # ---- cost, crash / goal termination (order matches
        # `particle_episode_fn`: cum uses the PRE-detection done) ----
        occ_n = occ_scalar(npx, npy)
        cost_t = (w_px * (npx - tx) ** 2 + w_py * (npy - ty) ** 2
                  + w_vx * (nvx - tvx) ** 2 + w_vy * (nvy - tvy) ** 2
                  + w_obs * occ_n)
        cum = sstate_ref[0, 6] + not_done * cost_t
        crash_now = occ_n > 0.0 if rects is not None else \
            jnp.bool_(False)
        dist2 = ((tx - npx) ** 2 + (ty - npy) ** 2
                 + (tvx - nvx) ** 2 + (tvy - nvy) ** 2)
        success_now = dist2 <= success_dist * success_dist
        crashed_new = jnp.maximum(
            sstate_ref[0, 5],
            jnp.where(crash_now & (done0 < 0.5), 1.0, 0.0),
        )
        done_new = jnp.maximum(
            done0, jnp.where(crash_now | success_now, 1.0, 0.0)
        )

        log_row = (
            jnp.where(lane1 == 0, npx, 0.0)
            + jnp.where(lane1 == 1, npy, 0.0)
            + jnp.where(lane1 == 2, nvx, 0.0)
            + jnp.where(lane1 == 3, nvy, 0.0)
            + jnp.where(lane1 == 4, a_x, 0.0)
            + jnp.where(lane1 == 5, a_y, 0.0)
            + jnp.where(lane1 == 6, cost_t, 0.0)
            + jnp.where(lane1 == 7, done_new, 0.0)
            + jnp.where(lane1 == 8, crashed_new, 0.0)
            + jnp.where(lane1 == 9, cum, 0.0)
            + jnp.where(lane1 == 10, bw_sv, 0.0)
            + jnp.where(lane1 == 11, bw_mpf, 0.0)
        )
        log_ref[pl.ds(t, 1), :] = log_row

        sstate_ref[0, 0] = npx
        sstate_ref[0, 1] = npy
        sstate_ref[0, 2] = nvx
        sstate_ref[0, 3] = nvy
        sstate_ref[0, 4] = done_new
        sstate_ref[0, 5] = crashed_new
        sstate_ref[0, 6] = cum
        return 0

    jax.lax.fori_loop(0, steps, step, 0)

    theta_out_ref[:] = theta_ref[:]
    locs_out_ref[:] = locs_ref[:]
    amat_out_ref[:] = amat_ref[:]
    mpfx_out_ref[:] = mpfx_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=("steps", "warm_up", "hz", "m", "n_params", "n_act",
                     "m_mpf", "mpf_steps", "dt", "max_acc", "max_speed",
                     "weights", "target", "rects", "grid", "crash",
                     "success_dist", "change_at", "exp_util",
                     "weighted_prior", "mpf_log_space", "use_fixed_mpf_bw",
                     "mpf_bw_scale", "unroll", "interpret"),
)
def fused_particle_episode(
        seed, state0, theta0, locs0, log_mix0, a_mat0, a_seq0, mpfx0,
        prior_bw0, base_mass, load, ctrl_sigma, lr, alpha, temp,
        prior_sigma, mpf_lr, mpf_sigma, mpf_fixed_bw_val, *,
        steps, warm_up=0, hz, m, n_params, n_act, m_mpf, mpf_steps, dt,
        max_acc, max_speed, weights, target, rects, grid, crash,
        success_dist=1.0, change_at, exp_util=True, weighted_prior=True,
        mpf_log_space=True, use_fixed_mpf_bw=True, mpf_bw_scale=1.0,
        unroll=True, host_eps=None, host_pdz=None, host_pdu=None,
        interpret=False):
    """Run one whole particle-navigation DuSt episode as ONE Pallas
    program. state0 [4]; theta0/locs0/a_mat0 [m, hz, 2]; log_mix0 [m]
    normalized prior mixture log-weights; a_seq0 [hz, 2];
    mpfx0 [m_mpf, 1] (log-)mass particles; base_mass: the simulator's
    true mass before the +load change at `change_at` (traced).

    Host-noise mode (tests): host_eps [steps, 2, hz, 8, 128] (channel
    x/y action noise, rows q < m used), host_pdz / host_pdu
    [steps, 8, 128]. Returns a dict of per-step logs and final states.
    """
    if hz * 2 > 128 or n_act > 128 or m > 8:
        raise ValueError("particle episode kernel: hz*2<=128, "
                         "n_act<=128, m<=8")
    if m_mpf > 64:
        raise ValueError("particle episode kernel: m_mpf <= 64")
    mp = _round8(max(m_mpf, 8))
    steps_p = _round8(steps)
    host_noise = host_eps is not None

    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 2)
    scal = jnp.stack([
        jnp.asarray(state0[0], jnp.float32),
        jnp.asarray(state0[1], jnp.float32),
        jnp.asarray(state0[2], jnp.float32),
        jnp.asarray(state0[3], jnp.float32),
        jnp.asarray(ctrl_sigma, jnp.float32).reshape(()),
        jnp.asarray(lr, jnp.float32).reshape(()),
        jnp.asarray(alpha, jnp.float32).reshape(()),
        1.0 / jnp.asarray(temp, jnp.float32).reshape(()),
        1.0 / jnp.asarray(ctrl_sigma, jnp.float32).reshape(()) ** 2,
        1.0 / jnp.asarray(prior_sigma, jnp.float32).reshape(()) ** 2,
        jnp.asarray(base_mass, jnp.float32).reshape(()),
        jnp.asarray(load, jnp.float32).reshape(()),
        jnp.asarray(mpf_lr, jnp.float32).reshape(()),
        jnp.asarray(mpf_sigma, jnp.float32).reshape(()),
        jnp.asarray(prior_bw0, jnp.float32).reshape(()),
        jnp.asarray(mpf_fixed_bw_val, jnp.float32).reshape(()),
    ]).reshape(1, 16)
    logmix = jnp.zeros((1, 8), jnp.float32).at[0, :m].set(
        jnp.asarray(log_mix0, jnp.float32)
    )

    inputs = [
        seed_arr, scal, logmix,
        _pad_tile(theta0.reshape(m, -1), 8),
        _pad_tile(locs0.reshape(m, -1), 8),
        _pad_tile(a_mat0.reshape(m, -1), 8),
        _pad_tile(jnp.asarray(a_seq0).reshape(1, -1), 8),
        _pad_tile(jnp.asarray(mpfx0).reshape(m_mpf, 1), mp),
    ]
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] * 3 + \
        [pl.BlockSpec(memory_space=pltpu.VMEM)] * 5
    if host_noise:
        inputs += [
            jnp.asarray(host_eps, jnp.float32).reshape(
                steps * hz * 16, 128
            ),
            jnp.asarray(host_pdz, jnp.float32).reshape(steps * 8, 128),
            jnp.asarray(host_pdu, jnp.float32).reshape(steps * 8, 128),
        ]
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3

    kernel = functools.partial(
        _particle_episode_kernel,
        steps=steps, warm_up=warm_up, hz=hz, m=m, n_params=n_params,
        n_act=n_act, m_mpf=m_mpf, mpf_steps=mpf_steps, dt=float(dt),
        max_acc=float(max_acc), max_speed=float(max_speed),
        weights=weights, target=target, rects=rects, grid=grid,
        crash=bool(crash), success_dist=float(success_dist),
        change_at=int(change_at), exp_util=bool(exp_util),
        weighted_prior=bool(weighted_prior),
        mpf_log_space=bool(mpf_log_space),
        use_fixed_mpf_bw=bool(use_fixed_mpf_bw),
        mpf_bw_scale=float(mpf_bw_scale), host_noise=host_noise,
        unroll=bool(unroll),
    )
    rows = n_params * m
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
            pltpu.VMEM((hz * 16, 128), jnp.float32),   # eps (x, y)
            pltpu.VMEM((rows, 128), jnp.float32),      # px
            pltpu.VMEM((rows, 128), jnp.float32),      # py
            pltpu.VMEM((rows, 128), jnp.float32),      # vx
            pltpu.VMEM((rows, 128), jnp.float32),      # vy
            pltpu.VMEM((8, 128), jnp.float32),         # theta
            pltpu.VMEM((8, 128), jnp.float32),         # locs
            pltpu.VMEM((8, 128), jnp.float32),         # amat
            pltpu.VMEM((mp, 128), jnp.float32),        # mpf x
            pltpu.SMEM((1, 16), jnp.float32),          # sim/lik state
            pltpu.SMEM((1, 8), jnp.float32),           # prior log-mix
        ],
        interpret=interpret,
    )(*inputs)
    log, theta_out, locs_out, amat_out, mpfx_out = outs
    ev = hz * 2
    return {
        "state": log[:steps, 0:4],
        "action": log[:steps, 4:6],
        "cost": log[:steps, 6],
        "done": log[:steps, 7],
        "crashed": log[:steps, 8],
        "cum": log[:steps, 9],
        "bw_sv": log[:steps, 10],
        "bw_mpf": log[:steps, 11],
        "theta": theta_out[:m, :ev].reshape(m, hz, 2),
        "locs": locs_out[:m, :ev].reshape(m, hz, 2),
        "a_mat": amat_out[:m, :ev].reshape(m, hz, 2),
        "mpf_x": mpfx_out[:m_mpf, :1],
    }
