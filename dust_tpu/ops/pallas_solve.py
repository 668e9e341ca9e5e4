"""Whole-SVMPC-solve Pallas kernel for the pendulum control posterior.

With the rollout+cost (`pallas_rollout.py`) and MPF (`pallas_mpf.py`)
chains each fused into single programs, the remaining per-solve time is
the XLA glue around them: the SVGD direction (analytic likelihood
gradient, GMM prior score, 3x3 RBF Stein terms), the DISCO softmax
update, and the selection/roll chain of `SVMPC.forward` — dozens of
tiny ops, each paying a TPU launch gap inside the episode scan.

This kernel runs ONE ENTIRE SVMPC SOLVE in a single Pallas program:

  sample-actions epilogue -> all n_params x n_actions x n_pol pendulum
  rollouts + swing-up costs in VMEM -> param-averaged costs -> DISCO
  softmax weights + a_mat/a_mix update (`dust/controllers/disco.py:
  348-394`) -> analytic likelihood gradient + GMM prior score + RBF
  Stein direction + SGD step (`dust/inference/svmpc.py:32-95`) ->
  posterior weights, best-particle selection, horizon roll
  (`dust/inference/svmpc.py:128-200`).

Only the action noise (one threefry draw), the dynamics-parameter draws
(8 GMM samples), and the Silverman bandwidth (one 90-element sort) stay
in XLA — each a single fused op, not a chain.

Semantics = `SVMPC(kernel="rbf", reference_compat=False,
roll_strategy="repeat", weighted_prior=False, n_steps=1)` over a
`MultiDisco` with `a_reg == 0` (the demo configs: temperature = 1/alpha
and ctrl_penalty = 1 make the control-penalty term vanish,
`demo/pendulum_config.yaml`), isotropic policy prior, ctrl_dim 1.
`FusedPendulumSVMPC` (inference/svmpc.py) reproduces the exact PRNG
split discipline of the plain path, so fused == plain to float
tolerance on identical keys (tests/test_pallas_solve.py).

Tiling: trajectories live on [n_params * n_pol, n_actions<=128] tiles —
row p*m+q holds particle q under parameter draw p, lanes are action
samples. The param average, per-particle softmaxes and logsumexps are
then lane/row-block reductions; the particle-space objects (theta,
prior locs, a_mat) live on [m, hz] tiles (horizon in lanes).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.pendulum import PendulumModel

_MAX_SPEED = PendulumModel.MAX_SPEED
_MAX_TORQUE = PendulumModel.MAX_TORQUE
_SWINGUP_W = 50.0  # pinned by tests against experiments.pendulum_cost_fns
_NEG_BIG = -1e30
_POS_BIG = 1e30


def _solve_kernel(scal_ref, acts_t_ref, acts_mm_ref, il_ref, im_ref,
                  theta_ref, locs_ref, amat_ref, aseq_ref,
                  theta_opt_ref, theta_fwd_ref, amat_out_ref, aseq_out_ref,
                  misc_ref, mcost_ref, th_ref, om_ref,
                  *, hz, m, n_params, n_act, dt, g, exp_util):
    """scal (SMEM [1, 16]): [theta0, theta_d0, bw, lr, alpha, inv_temp,
    inv_s2, inv_ps2] (inv_s2 = 1/sigma_ctrl^2, inv_ps2 = 1/prior_sigma^2).

    acts_t [hz, rows, 128]: rollout layout, row p*m+q, lane i (pad 0);
    acts_mm [m, 128, 128]: matmul layout, [q, i, t] (pads 0);
    il/im [rows, 128]: 1/length, 1/mass per lane (pad 1);
    theta/locs/amat [8, 128]: rows 0:m are particles / prior centers /
    policy plans, lanes 0:hz the horizon (pads 0); aseq [8, 128] row 0.

    Outputs: theta_opt/theta_fwd/amat_out [8, 128] (same layout);
    aseq_out [8, 128] row 0 = selected a_seq (lanes 0:hz);
    misc [8, 128]: lane 0 = posterior weights, lane 1 = a_mix (rows 0:m);
    mcost [8, 128]: rows 0:m = param-averaged costs per action sample.
    """
    rows = n_params * m
    th0 = scal_ref[0, 0]
    om0 = scal_ref[0, 1]
    bw = scal_ref[0, 2]
    lr = scal_ref[0, 3]
    alpha = scal_ref[0, 4]
    inv_temp = scal_ref[0, 5]
    inv_s2 = scal_ref[0, 6]
    inv_ps2 = scal_ref[0, 7]
    inv_bw2 = 1.0 / (bw * bw)
    inv_2bw2 = 0.5 * inv_bw2

    # ---- stage A: rollout + swing-up cost, all trajectories in VMEM ----
    il = il_ref[:]
    im = im_ref[:]
    c_grav = -3.0 * g * 0.5 * dt * il
    c_act = 3.0 * dt * im * il * il

    shape = (rows, 128)
    th_ref[:] = jnp.zeros(shape, jnp.float32) + th0
    om_ref[:] = jnp.zeros(shape, jnp.float32) + om0
    cost = jnp.zeros(shape, jnp.float32)

    def body(t, cost):
        th = th_ref[:]
        om = om_ref[:]
        cost = cost + _SWINGUP_W * (jnp.cos(th) - 1.0) ** 2 + om * om
        a = acts_t_ref[pl.ds(t, 1), :, :].reshape(shape)
        a = jnp.clip(a, -_MAX_TORQUE, _MAX_TORQUE)
        om = om + c_grav * jnp.sin(th + math.pi) + c_act * a
        om = jnp.clip(om, -_MAX_SPEED, _MAX_SPEED)
        om_ref[:] = om
        th_ref[:] = th + om * dt
        return cost

    cost = jax.lax.fori_loop(0, hz, body, cost)
    th = th_ref[:]
    om = om_ref[:]
    cost = cost + _SWINGUP_W * (jnp.cos(th) - 1.0) ** 2 + om * om

    # ---- stage B: param-averaged costs mcost [m, 128] ----
    mcost = cost[0:m, :]
    for p in range(1, n_params):
        mcost = mcost + cost[p * m:(p + 1) * m, :]
    mcost = mcost * (1.0 / n_params)

    lane = jax.lax.broadcasted_iota(jnp.int32, (m, 128), 1)
    valid = lane < n_act
    mcost_v = jnp.where(valid, mcost, _POS_BIG)

    # ---- stage C: DISCO update (`disco.py:348-394`) ----
    beta = jnp.min(mcost_v)
    lc = jnp.where(valid, -(mcost - beta) * inv_temp, _NEG_BIG)
    row_max = jnp.max(lc, axis=1, keepdims=True)          # [m, 1]
    e = jnp.where(valid, jnp.exp(lc - row_max), 0.0)
    sum_e = jnp.sum(e, axis=1, keepdims=True)
    eta = row_max + jnp.log(sum_e)                        # [m, 1]
    omega = e / sum_e                                     # [m, 128]

    aseq_row = aseq_ref[0:1, :]                           # [1, 128]
    theta = theta_ref[0:m, :]                             # [m, 128]
    locs = locs_ref[0:m, :]

    # likelihood softmax over action samples (`svmpc.py:46-56`)
    wl = jnp.where(valid, -mcost * alpha, _NEG_BIG)
    wl_max = jnp.max(wl, axis=1, keepdims=True)
    we = jnp.where(valid, jnp.exp(wl - wl_max), 0.0)
    we_sum = jnp.sum(we, axis=1, keepdims=True)
    w_lik = we / we_sum                                   # [m, 128]
    # ExponentiatedUtility / ExpectedCost log-likelihood per particle
    if exp_util:
        log_l = (
            jnp.max(jnp.where(valid, -mcost * alpha, _NEG_BIG), axis=1,
                    keepdims=True)
        )
        log_l = log_l + jnp.log(jnp.sum(
            jnp.where(valid, jnp.exp(-mcost * alpha - log_l), 0.0),
            axis=1, keepdims=True,
        )) - math.log(float(n_act))
    else:
        log_l = -alpha * jnp.sum(
            jnp.where(valid, mcost, 0.0), axis=1, keepdims=True
        ) * (1.0 / n_act)

    # per-particle matmuls composed with row masks (Mosaic has no
    # value-level scatter; where(row==q, ...) broadcasts the [1, 128]
    # matmul results into their rows)
    rowm = jax.lax.broadcasted_iota(jnp.int32, (m, 128), 0)
    delta = jnp.zeros((m, 128), jnp.float32)
    glik = jnp.zeros((m, 128), jnp.float32)
    for q in range(m):
        acts_q = acts_mm_ref[q]                           # [128(i), 128(t)]
        # delta_q = sum_i omega[q, i] * (a[i, q, :] - a_seq)
        delta_q = jnp.dot(
            omega[q:q + 1, :], acts_q - aseq_row,
            preferred_element_type=jnp.float32,
        )                                                 # [1, 128]
        delta = jnp.where(rowm == q, delta_q, delta)
        # grad_lik_q = (sum_i w[q, i] a[i, q, :] - theta_q) / sigma^2
        wa_q = jnp.dot(
            w_lik[q:q + 1, :], acts_q,
            preferred_element_type=jnp.float32,
        )
        glik = jnp.where(rowm == q, (wa_q - theta[q:q + 1, :]) * inv_s2,
                         glik)
    amat_out_ref[:] = jnp.zeros((8, 128), jnp.float32)
    amat_out_ref[0:m, :] = amat_ref[0:m, :] + delta

    # a_mix = softmax(eta) over policies
    eta_max = jnp.max(eta, axis=0, keepdims=True)
    eta_e = jnp.exp(eta - eta_max)
    a_mix = eta_e / jnp.sum(eta_e, axis=0, keepdims=True)  # [m, 1]

    # ---- stage D: Stein direction + SGD step ----
    colm = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)

    # GMM prior score (`distributions.GMM.score`, isotropic)
    lp_pri = jnp.zeros((m, m), jnp.float32)  # [q, c] component log-probs
    for c in range(m):
        diff_c = theta - locs[c:c + 1, :]
        lp_c = -0.5 * inv_ps2 * jnp.sum(diff_c * diff_c, axis=1,
                                        keepdims=True)     # [m, 1]
        lp_pri = jnp.where(colm == c, lp_c, lp_pri)
    r_max = jnp.max(lp_pri, axis=1, keepdims=True)
    r_e = jnp.exp(lp_pri - r_max)
    r = r_e / jnp.sum(r_e, axis=1, keepdims=True)         # [m, m]
    score = glik
    for c in range(m):
        score = score + r[:, c:c + 1] * (locs[c:c + 1, :] - theta) * inv_ps2

    # RBF Stein terms: K = exp(-d^2/(2 bw^2)) on the flattened particles
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
    rowsum_k = jnp.sum(kmat, axis=1, keepdims=True)       # [m, 1]
    # reference_compat=False repulsion: -grad_first, /m (`svmpc.py:129`)
    grad_k = -(k_theta - rowsum_k * theta) * inv_bw2
    phi = (k_score + grad_k) * (1.0 / m)
    hz_mask = lane < hz
    theta_new = jnp.where(hz_mask, theta + lr * phi, 0.0)

    theta_opt_ref[:] = jnp.zeros((8, 128), jnp.float32)
    theta_opt_ref[0:m, :] = theta_new

    # ---- stage E: forward (weights / select / roll, `svmpc.py:128-208`)
    lp_new = jnp.zeros((m, m), jnp.float32)
    for c in range(m):
        diff_c = theta_new - locs[c:c + 1, :]
        lp_c = -0.5 * inv_ps2 * jnp.sum(diff_c * diff_c, axis=1,
                                        keepdims=True)
        lp_new = jnp.where(colm == c, lp_c, lp_new)
    n_max = jnp.max(lp_new, axis=1, keepdims=True)
    log_p = n_max + jnp.log(jnp.sum(jnp.exp(lp_new - n_max), axis=1,
                                    keepdims=True))       # [m, 1] (+const)
    log_w = log_l + log_p
    w_max = jnp.max(log_w, axis=0, keepdims=True)
    w_e = jnp.exp(log_w - w_max)
    weights = w_e / jnp.sum(w_e, axis=0, keepdims=True)   # [m, 1]

    # first-argmax selection
    row = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    is_max = log_w >= jnp.max(log_w, axis=0, keepdims=True)
    i_star = jnp.min(jnp.where(is_max, row, m))
    onehot = (row == i_star).astype(jnp.float32)          # [m, 1]
    a_seq_sel = jnp.sum(onehot * theta_new, axis=0, keepdims=True)

    # roll strategy "repeat": theta[t] <- theta[t+1], last repeats
    # (left circular shift by 1 == right shift by 127 on the lane axis)
    rolled = pltpu.roll(theta_new, shift=127, axis=1)
    theta_fwd = jnp.where(
        lane < hz - 1, rolled,
        jnp.where(lane == hz - 1, theta_new, 0.0),
    )
    theta_fwd_ref[:] = jnp.zeros((8, 128), jnp.float32)
    theta_fwd_ref[0:m, :] = theta_fwd

    aseq_out_ref[:] = jnp.zeros((8, 128), jnp.float32)
    aseq_out_ref[0:1, :] = a_seq_sel

    misc_ref[:] = jnp.zeros((8, 128), jnp.float32)
    misc_ref[0:m, :] = (
        jnp.where(lane == 0, weights, 0.0)
        + jnp.where(lane == 1, a_mix, 0.0)
    )

    mcost_ref[:] = jnp.zeros((8, 128), jnp.float32)
    mcost_ref[0:m, :] = jnp.where(valid, mcost, 0.0)


@functools.partial(
    jax.jit,
    static_argnames=("hz", "m", "n_params", "n_act", "dt", "g", "exp_util",
                     "interpret"),
)
def fused_pendulum_solve(state0, theta, locs, a_mat, a_seq, actions,
                         lengths, masses, bw, lr, alpha, temp, ctrl_sigma,
                         prior_sigma, *, hz, m, n_params, n_act, dt=0.05,
                         g=9.8, exp_util=True, interpret=False):
    """One full SVMPC solve in one Pallas program.

    state0 [2]; theta/locs/a_mat [m, hz] (ctrl_dim-1 squeezed);
    a_seq [hz]; actions [n_act, m, hz] (pre-sampled, reparameterized);
    lengths/masses [n_params]. Returns (theta_opt [m, hz],
    theta_fwd [m, hz], a_mat_new [m, hz], a_mix [m], a_seq_sel [hz],
    weights [m], costs [n_act, m]).
    """
    rows = n_params * m
    if n_act > 128:
        raise ValueError("fused solve supports n_actions <= 128")
    if m > 8:
        raise ValueError("fused solve supports n_particles <= 8")
    if hz > 127:
        raise ValueError("fused solve supports horizon <= 127")

    # rollout layout [hz, rows, 128]: row p*m+q, lane i
    acts_t = jnp.transpose(actions, (2, 1, 0))            # [hz, m, n_act]
    acts_t = jnp.pad(acts_t, ((0, 0), (0, 0), (0, 128 - n_act)))
    acts_t = jnp.tile(acts_t, (1, n_params, 1))           # [hz, rows, 128]
    # matmul layout [m, 128(i), 128(t)]
    acts_mm = jnp.transpose(actions, (1, 0, 2))           # [m, n_act, hz]
    acts_mm = jnp.pad(
        acts_mm, ((0, 0), (0, 128 - n_act), (0, 128 - hz))
    )

    def col(v):
        flat = jnp.repeat(jnp.asarray(v, jnp.float32).reshape(-1), m)
        return jnp.broadcast_to(flat[:, None], (rows, 128))

    il = 1.0 / col(lengths)
    im = 1.0 / col(masses)

    def pad8(x):
        x = jnp.asarray(x, jnp.float32).reshape(-1, x.shape[-1])
        return jnp.zeros((8, 128), jnp.float32).at[
            :x.shape[0], :x.shape[1]
        ].set(x)

    theta_p = pad8(theta)
    locs_p = pad8(locs)
    amat_p = pad8(a_mat)
    aseq_p = pad8(a_seq.reshape(1, -1))

    scal = jnp.stack([
        jnp.asarray(state0[0], jnp.float32),
        jnp.asarray(state0[1], jnp.float32),
        jnp.asarray(bw, jnp.float32).reshape(()),
        jnp.asarray(lr, jnp.float32).reshape(()),
        jnp.asarray(alpha, jnp.float32).reshape(()),
        1.0 / jnp.asarray(temp, jnp.float32).reshape(()),
        1.0 / jnp.asarray(ctrl_sigma, jnp.float32).reshape(()) ** 2,
        1.0 / jnp.asarray(prior_sigma, jnp.float32).reshape(()) ** 2,
        *([jnp.float32(0.0)] * 8),
    ]).reshape(1, 16)

    kernel = functools.partial(
        _solve_kernel, hz=hz, m=m, n_params=n_params, n_act=n_act,
        dt=float(dt), g=float(g), exp_util=bool(exp_util),
    )
    out_shape = jax.ShapeDtypeStruct((8, 128), jnp.float32)
    theta_opt, theta_fwd, amat_out, aseq_out, misc, mcost = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_shape=[out_shape] * 6,
        scratch_shapes=[
            pltpu.VMEM((rows, 128), jnp.float32),
            pltpu.VMEM((rows, 128), jnp.float32),
        ],
        interpret=interpret,
    )(scal, acts_t, acts_mm, il, im, theta_p, locs_p, amat_p, aseq_p)

    return (
        theta_opt[:m, :hz],
        theta_fwd[:m, :hz],
        amat_out[:m, :hz],
        misc[:m, 1],                # a_mix
        aseq_out[0, :hz],           # selected a_seq
        misc[:m, 0],                # posterior weights
        mcost[:m, :n_act].T,        # costs [n_act, m]
    )
