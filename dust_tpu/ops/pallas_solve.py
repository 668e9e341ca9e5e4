"""Whole-SVMPC-solve Pallas kernels (pendulum and particle tasks).

With the rollout+cost (`pallas_rollout.py`, `pallas_particle_rollout.py`)
and MPF (`pallas_mpf.py`, `pallas_particle_mpf.py`) chains each fused
into single programs, the remaining per-solve time is the XLA glue
around them: the SVGD direction (analytic likelihood gradient, GMM prior
score, m x m RBF Stein terms), the DISCO softmax update, and the
selection/roll chain of `SVMPC.forward` — dozens of tiny ops, each
paying a TPU launch gap inside the episode scan.

These kernels run ONE ENTIRE SVMPC SOLVE in a single Pallas program:

  sampled-action epilogue -> all n_params x n_actions x n_pol rollouts +
  costs in VMEM -> param-averaged costs -> DISCO softmax weights +
  a_mat/a_mix update (`dust/controllers/disco.py:348-394`) -> analytic
  likelihood gradient + GMM prior score + RBF Stein direction + SGD step
  (`dust/inference/svmpc.py:32-95`) -> posterior weights, best-particle
  selection, horizon roll (`dust/inference/svmpc.py:128-200`).

Only the action noise (one threefry draw), the dynamics-parameter draws
(a handful of GMM/Normal samples), and the Silverman bandwidth (one
small sort) stay in XLA — each a single fused op, not a chain.

Measured verdict (TPU v5e): this is a LATENCY optimization. Single
episode (bench.py / bench_all.py defaults) it wins — pendulum dual
8.1k -> 8.9-9.8k solves/s, SV-MPC 12.0k -> 13.8k, particle dual
8.4k -> 9.0k. Scenario sweeps (100+ episodes vmapped) it LOSES to the
fused-rollout+MPF combination (40.0k vs 42.2k pendulum, 38.3k vs 50.9k
particle at n=128-256): with a wide scenario batch, XLA fuses the
inter-kernel glue into batched ops and the launch gaps this kernel
removes are already amortized, while its per-particle unrolled matmuls
serialize. The sweeps therefore keep `fused_rollout` (see
bench/bench_all.py bench_sweep).

Semantics = `SVMPC(kernel="rbf", reference_compat=False,
roll_strategy="repeat", n_steps=1)` over a `MultiDisco` with
`a_reg == 0` (the demo configs: temperature = 1/alpha and
ctrl_penalty = 1 make the control-penalty term vanish) and an isotropic
policy prior; weighted priors (`particle_config.yaml: weighted_prior`)
are supported via prior logits passed in SMEM. The wrapper classes
(`inference/svmpc.py:FusedPendulumSVMPC`,
`inference/svmpc.py:FusedParticleSVMPC`) reproduce the plain path's
exact PRNG split discipline, so fused == plain to float tolerance on
identical keys (tests/test_pallas_solve.py).

Tiling: trajectories live on [n_params * n_pol, n_actions <= 128] tiles
— row p*m+q holds particle q under parameter draw p, lanes are action
samples; the param average, per-particle softmaxes and logsumexps are
then lane/row-block reductions. Particle-space objects (theta, prior
locs, a_mat) live on [m, hz*dim_a <= 128] tiles (flattened horizon in
lanes).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.pendulum import PendulumModel
from .pallas_episode import _rot_sincos

_MAX_SPEED = PendulumModel.MAX_SPEED
_MAX_TORQUE = PendulumModel.MAX_TORQUE
_SWINGUP_W = 50.0  # pinned by tests against experiments.pendulum_cost_fns
_NEG_BIG = -1e30
_POS_BIG = 1e30


def _solve_tail(cost, scal_ref, acts_mm_ref,
                theta_ref, locs_ref, amat_ref, aseq_ref,
                theta_opt_ref, theta_fwd_ref, amat_out_ref, aseq_out_ref,
                misc_ref, mcost_ref,
                *, m, n_params, n_act, hz, dim_a, exp_util, scal_off):
    """Everything after the rollout, shared by both tasks.

    cost [n_params*m, 128]: per-trajectory costs (row p*m+q, lane i).
    scal (SMEM [1, 16]) from `scal_off` on: [bw, lr, alpha, inv_temp,
    inv_s2, inv_ps2, log_softmax(prior logits) x m].
    acts_mm [m, 128, 128]: [q, i, flattened (t, a)] action layout.
    theta/locs/amat [8, 128]: rows 0:m, lanes 0:hz*dim_a (flattened
    horizon); aseq [8, 128] row 0.
    """
    ev = hz * dim_a
    bw = scal_ref[0, scal_off + 0]
    lr = scal_ref[0, scal_off + 1]
    alpha = scal_ref[0, scal_off + 2]
    inv_temp = scal_ref[0, scal_off + 3]
    inv_s2 = scal_ref[0, scal_off + 4]
    inv_ps2 = scal_ref[0, scal_off + 5]
    inv_bw2 = 1.0 / (bw * bw)
    inv_2bw2 = 0.5 * inv_bw2

    # ---- param-averaged costs mcost [m, 128] ----
    mcost = cost[0:m, :]
    for p in range(1, n_params):
        mcost = mcost + cost[p * m:(p + 1) * m, :]
    mcost = mcost * (1.0 / n_params)

    lane = jax.lax.broadcasted_iota(jnp.int32, (m, 128), 1)
    valid = lane < n_act
    mcost_v = jnp.where(valid, mcost, _POS_BIG)

    # ---- DISCO update (`disco.py:348-394`) ----
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
        log_l = wl_max + jnp.log(we_sum) - math.log(float(n_act))
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
        acts_q = acts_mm_ref[q]                       # [128(i), 128(t,a)]
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

    # ---- Stein direction + SGD step ----
    colm = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)

    # GMM prior component log-probs + normalized mixture logits
    lp_pri = jnp.zeros((m, m), jnp.float32)  # [q, c]
    for c in range(m):
        diff_c = theta - locs[c:c + 1, :]
        lp_c = (
            -0.5 * inv_ps2 * jnp.sum(diff_c * diff_c, axis=1,
                                     keepdims=True)
            + scal_ref[0, scal_off + 6 + c]
        )
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
    ev_mask = lane < ev
    theta_new = jnp.where(ev_mask, theta + lr * phi, 0.0)

    theta_opt_ref[:] = jnp.zeros((8, 128), jnp.float32)
    theta_opt_ref[0:m, :] = theta_new

    # ---- forward (weights / select / roll, `svmpc.py:128-208`) ----
    lp_new = jnp.zeros((m, m), jnp.float32)
    for c in range(m):
        diff_c = theta_new - locs[c:c + 1, :]
        lp_c = (
            -0.5 * inv_ps2 * jnp.sum(diff_c * diff_c, axis=1,
                                     keepdims=True)
            + scal_ref[0, scal_off + 6 + c]
        )
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
    is_max = log_w >= w_max
    i_star = jnp.min(jnp.where(is_max, row, m))
    onehot = (row == i_star).astype(jnp.float32)          # [m, 1]
    a_seq_sel = jnp.sum(onehot * theta_new, axis=0, keepdims=True)

    # roll strategy "repeat": theta[t] <- theta[t+1], last block repeats
    # (left circular shift by dim_a lanes)
    rolled = pltpu.roll(theta_new, shift=128 - dim_a, axis=1)
    theta_fwd = jnp.where(
        lane < (hz - 1) * dim_a, rolled,
        jnp.where(lane < ev, theta_new, 0.0),
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
from .pallas_particle_rollout import occupancy_hit


# --------------------------------------------------------------------------
# pendulum
# --------------------------------------------------------------------------


def _pendulum_solve_kernel(scal_ref, acts_t_ref, acts_mm_ref, il_ref,
                           im_ref, theta_ref, locs_ref, amat_ref, aseq_ref,
                           theta_opt_ref, theta_fwd_ref, amat_out_ref,
                           aseq_out_ref, misc_ref, mcost_ref, *, hz, m,
                           n_params, n_act, dt, g, exp_util):
    """scal (SMEM [1, 16]): [theta0, theta_d0, bw, lr, alpha, inv_temp,
    inv_s2, inv_ps2, log_softmax(prior logits) x m].

    acts_t [hz, rows, 128]: rollout layout, row p*m+q, lane i (pad 0);
    il/im [rows, 128]: 1/length, 1/mass per lane (pad 1). Physics and
    cost as `pallas_rollout.py` (PendulumModel.step + swing-up cost).
    """
    rows = n_params * m
    th0 = scal_ref[0, 0]
    om0 = scal_ref[0, 1]

    il = il_ref[:]
    im = im_ref[:]
    c_grav = -3.0 * g * 0.5 * dt * il
    c_act = 3.0 * dt * im * il * il

    # Rollout state is (cos th, sin th, om): the cost needs cos th, the
    # torque balance needs sin(th + pi) = -sin th, and th itself only
    # ever advances by the bounded angle om * dt — so the loop rotates
    # the (cos, sin) pair by short-polynomial trig (_rot_sincos) instead
    # of evaluating two full-range transcendentals per step.
    shape = (rows, 128)
    zs = jnp.zeros(shape, jnp.float32)
    cost = zs

    def body(t, carry):
        cost, c, s, om = carry
        cost = cost + _SWINGUP_W * (c - 1.0) ** 2 + om * om
        a = acts_t_ref[pl.ds(t, 1), :, :].reshape(shape)
        a = jnp.clip(a, -_MAX_TORQUE, _MAX_TORQUE)
        om = om + c_grav * (-s) + c_act * a
        om = jnp.clip(om, -_MAX_SPEED, _MAX_SPEED)
        sd, cd = _rot_sincos(om * dt, _MAX_SPEED * dt)
        return cost, c * cd - s * sd, s * cd + c * sd, om

    # vector trig on the broadcast tile: Mosaic has no scalar-core
    # transcendentals, so evaluate cos/sin once on the splatted angle.
    # anchor: scalar-splat loop carries get a REPLICATED vector layout,
    # but the body's outputs are data-dependent — newer Mosaic rejects
    # the non-replicated->replicated carry relayout ("Invalid relayout
    # ... replicated in destination but not in source"), so tie every
    # initial carry to a VMEM-loaded tile with an exact +0.0
    anchor = il * 0.0
    cost, c, _, om = jax.lax.fori_loop(
        0, hz, body, (cost + anchor, jnp.cos(zs + th0) + anchor,
                      jnp.sin(zs + th0) + anchor, zs + om0 + anchor)
    )
    cost = cost + _SWINGUP_W * (c - 1.0) ** 2 + om * om

    _solve_tail(
        cost, scal_ref, acts_mm_ref, theta_ref, locs_ref, amat_ref,
        aseq_ref, theta_opt_ref, theta_fwd_ref, amat_out_ref, aseq_out_ref,
        misc_ref, mcost_ref, m=m, n_params=n_params, n_act=n_act, hz=hz,
        dim_a=1, exp_util=exp_util, scal_off=2,
    )


def _check_dims(hz, m, n_act, dim_a):
    if n_act > 128:
        raise ValueError("fused solve supports n_actions <= 128")
    if m > 8:
        raise ValueError("fused solve supports n_particles <= 8")
    if hz * dim_a > 128:
        raise ValueError("fused solve supports horizon * ctrl_dim <= 128")


def _pad8(x):
    x = jnp.asarray(x, jnp.float32).reshape(-1, x.shape[-1])
    return jnp.zeros((8, 128), jnp.float32).at[
        :x.shape[0], :x.shape[1]
    ].set(x)


def _mm_layout(actions, m):
    """actions [n_act, m, ev] -> [m, 128, 128] matmul layout."""
    n_act, _, ev = actions.shape
    acts_mm = jnp.transpose(actions, (1, 0, 2))
    return jnp.pad(acts_mm, ((0, 0), (0, 128 - n_act), (0, 128 - ev)))


def _stream_layout(ch, n_params):
    """One action channel [n_act, m, hz] -> [hz, n_params*m, 128]."""
    n_act = ch.shape[0]
    acts_t = jnp.transpose(ch, (2, 1, 0))                 # [hz, m, n_act]
    acts_t = jnp.pad(acts_t, ((0, 0), (0, 0), (0, 128 - n_act)))
    return jnp.tile(acts_t, (1, n_params, 1))


def _solve_scal(state0, dim_s, bw, lr, alpha, temp, ctrl_sigma,
                prior_sigma, log_mix):
    vals = [jnp.asarray(state0[i], jnp.float32) for i in range(dim_s)]
    vals += [
        jnp.asarray(bw, jnp.float32).reshape(()),
        jnp.asarray(lr, jnp.float32).reshape(()),
        jnp.asarray(alpha, jnp.float32).reshape(()),
        1.0 / jnp.asarray(temp, jnp.float32).reshape(()),
        1.0 / jnp.asarray(ctrl_sigma, jnp.float32).reshape(()) ** 2,
        1.0 / jnp.asarray(prior_sigma, jnp.float32).reshape(()) ** 2,
    ]
    vals += [jnp.asarray(v, jnp.float32) for v in log_mix]
    if len(vals) > 16:
        raise ValueError("fused solve: dim_s + 6 + m must be <= 16")
    vals += [jnp.float32(0.0)] * (16 - len(vals))
    return jnp.stack(vals).reshape(1, 16)


_SOLVE_OUTS = dict(
    out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
    out_shape=[jax.ShapeDtypeStruct((8, 128), jnp.float32)] * 6,
)


def _unpack(outs, m, hz, dim_a, n_act):
    theta_opt, theta_fwd, amat_out, aseq_out, misc, mcost = outs
    ev = hz * dim_a
    return (
        theta_opt[:m, :ev],
        theta_fwd[:m, :ev],
        amat_out[:m, :ev],
        misc[:m, 1],                # a_mix
        aseq_out[0, :ev],           # selected a_seq (flattened)
        misc[:m, 0],                # posterior weights
        mcost[:m, :n_act].T,        # costs [n_act, m]
    )


@functools.partial(
    jax.jit,
    static_argnames=("hz", "m", "n_params", "n_act", "dt", "g", "exp_util",
                     "interpret"),
)
def fused_pendulum_solve(state0, theta, locs, log_mix, a_mat, a_seq,
                         actions, lengths, masses, bw, lr, alpha, temp,
                         ctrl_sigma, prior_sigma, *, hz, m, n_params,
                         n_act, dt=0.05, g=9.8, exp_util=True,
                         interpret=False):
    """One full pendulum SVMPC solve in one Pallas program.

    state0 [2]; theta/locs/a_mat [m, hz] (ctrl_dim-1 squeezed);
    log_mix: m normalized prior mixture log-weights; a_seq [hz];
    actions [n_act, m, hz] (pre-sampled, reparameterized);
    lengths/masses [n_params]. Returns (theta_opt [m, hz],
    theta_fwd [m, hz], a_mat_new [m, hz], a_mix [m], a_seq_sel [hz],
    weights [m], costs [n_act, m]).
    """
    _check_dims(hz, m, n_act, 1)
    rows = n_params * m
    acts_t = _stream_layout(actions, n_params)
    acts_mm = _mm_layout(actions, m)

    def col(v):
        flat = jnp.repeat(jnp.asarray(v, jnp.float32).reshape(-1), m)
        return jnp.broadcast_to(flat[:, None], (rows, 128))

    il = 1.0 / col(lengths)
    im = 1.0 / col(masses)
    scal = _solve_scal(state0, 2, bw, lr, alpha, temp, ctrl_sigma,
                       prior_sigma, log_mix)

    kernel = functools.partial(
        _pendulum_solve_kernel, hz=hz, m=m, n_params=n_params, n_act=n_act,
        dt=float(dt), g=float(g), exp_util=bool(exp_util),
    )
    outs = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        interpret=interpret,
        **_SOLVE_OUTS,
    )(scal, acts_t, acts_mm, il, im, _pad8(theta), _pad8(locs),
      _pad8(a_mat), _pad8(a_seq.reshape(1, -1)))
    return _unpack(outs, m, hz, 1, n_act)


# --------------------------------------------------------------------------
# particle navigation
# --------------------------------------------------------------------------


def _particle_solve_kernel(scal_ref, ax_ref, ay_ref, acts_mm_ref, im_ref,
                           theta_ref, locs_ref, amat_ref, aseq_ref,
                           theta_opt_ref, theta_fwd_ref, amat_out_ref,
                           aseq_out_ref, misc_ref, mcost_ref,
                           px_ref, py_ref, vx_ref, vy_ref,
                           *, hz, m, n_params, n_act, dt, max_acc,
                           max_speed, weights, target, rects, grid, crash,
                           exp_util):
    """scal (SMEM [1, 16]): [x, y, vx, vy, bw, lr, alpha, inv_temp,
    inv_s2, inv_ps2, log_softmax(prior logits) x m].

    ax/ay [hz, rows, 128]: action channels, row p*m+q, lane i;
    im [rows, 128]: 1/mass per lane. Physics, costs and gather-free
    rectangle collisions as `pallas_particle_rollout.py`.
    """
    rows = n_params * m
    (w_px, w_py, w_vx, w_vy, w_cx, w_cy, w_obs,
     wt_px, wt_py, wt_vx, wt_vy) = weights
    tx, ty, tvx, tvy = target

    shape = (rows, 128)
    px_ref[:] = jnp.zeros(shape, jnp.float32) + scal_ref[0, 0]
    py_ref[:] = jnp.zeros(shape, jnp.float32) + scal_ref[0, 1]
    vx_ref[:] = jnp.zeros(shape, jnp.float32) + scal_ref[0, 2]
    vy_ref[:] = jnp.zeros(shape, jnp.float32) + scal_ref[0, 3]
    im = im_ref[:]

    def occupancy(px, py):
        if rects is None:
            return None
        inv_cell, offx, offy, ximax, yimax = grid
        xi = jnp.clip(jnp.floor(px * inv_cell + offx), 0.0, ximax)
        yi = jnp.clip(jnp.floor(py * inv_cell + offy), 0.0, yimax)
        return jnp.where(occupancy_hit(xi, yi, rects, (ximax, yimax)), 1.0, 0.0)

    def state_cost(px, py, vx, vy, occ, quad):
        wpx, wpy, wvx, wvy = quad
        c = (wpx * (px - tx) ** 2 + wpy * (py - ty) ** 2
             + wvx * (vx - tvx) ** 2 + wvy * (vy - tvy) ** 2)
        if occ is not None:
            c = c + w_obs * occ
        return c

    def body(t, cost):
        px = px_ref[:]
        py = py_ref[:]
        vx = vx_ref[:]
        vy = vy_ref[:]
        occ = occupancy(px, py)
        a_x = ax_ref[pl.ds(t, 1), :, :].reshape(shape)
        a_y = ay_ref[pl.ds(t, 1), :, :].reshape(shape)
        cost = cost + (
            state_cost(px, py, vx, vy, occ, (w_px, w_py, w_vx, w_vy))
            + w_cx * a_x * a_x + w_cy * a_y * a_y
        )
        acc_x = jnp.clip(a_x * im, -max_acc, max_acc)
        acc_y = jnp.clip(a_y * im, -max_acc, max_acc)
        if crash and occ is not None:
            scale = dt * (1.0 - occ)
        else:
            scale = dt
        px_ref[:] = px + vx * scale
        py_ref[:] = py + vy * scale
        vx_ref[:] = jnp.clip(vx + acc_x * scale, -max_speed, max_speed)
        vy_ref[:] = jnp.clip(vy + acc_y * scale, -max_speed, max_speed)
        return cost

    # anchor: see _pendulum_solve_kernel — the scalar-zero carry would
    # be layout-replicated while the body output is not
    cost = jax.lax.fori_loop(0, hz, body, im * 0.0)
    px = px_ref[:]
    py = py_ref[:]
    vx = vx_ref[:]
    vy = vy_ref[:]
    cost = cost + state_cost(
        px, py, vx, vy, occupancy(px, py), (wt_px, wt_py, wt_vx, wt_vy)
    )

    _solve_tail(
        cost, scal_ref, acts_mm_ref, theta_ref, locs_ref, amat_ref,
        aseq_ref,
        theta_opt_ref, theta_fwd_ref, amat_out_ref, aseq_out_ref,
        misc_ref, mcost_ref, m=m, n_params=n_params, n_act=n_act, hz=hz,
        dim_a=2, exp_util=exp_util, scal_off=4,
    )


@functools.partial(
    jax.jit,
    static_argnames=("hz", "m", "n_params", "n_act", "dt", "max_acc",
                     "max_speed", "weights", "target", "rects", "grid",
                     "crash", "exp_util", "interpret"),
)
def fused_particle_solve(state0, theta, locs, log_mix, a_mat, a_seq,
                         actions, masses, bw, lr, alpha, temp, ctrl_sigma,
                         prior_sigma, *, hz, m, n_params, n_act, dt,
                         max_acc, max_speed, weights, target, rects, grid,
                         crash, exp_util=True, interpret=False):
    """One full particle-navigation SVMPC solve in one Pallas program.

    state0 [4]; theta/locs/a_mat [m, hz, 2]; log_mix: m normalized prior
    mixture log-weights; a_seq [hz, 2]; actions [n_act, m, hz, 2];
    masses [n_params]. Static config as `_particle_solve_kernel`.
    Returns (theta_opt [m, hz, 2], theta_fwd [m, hz, 2],
    a_mat_new [m, hz, 2], a_mix [m], a_seq_sel [hz, 2], weights [m],
    costs [n_act, m]).
    """
    _check_dims(hz, m, n_act, 2)
    rows = n_params * m

    ax = _stream_layout(actions[..., 0], n_params)
    ay = _stream_layout(actions[..., 1], n_params)
    acts_mm = _mm_layout(actions.reshape(n_act, m, hz * 2), m)

    flat_m = jnp.repeat(jnp.asarray(masses, jnp.float32).reshape(-1), m)
    im = 1.0 / jnp.broadcast_to(flat_m[:, None], (rows, 128))
    scal = _solve_scal(state0, 4, bw, lr, alpha, temp, ctrl_sigma,
                       prior_sigma, log_mix)

    kernel = functools.partial(
        _particle_solve_kernel, hz=hz, m=m, n_params=n_params, n_act=n_act,
        dt=float(dt), max_acc=float(max_acc), max_speed=float(max_speed),
        weights=weights, target=target, rects=rects, grid=grid,
        crash=bool(crash), exp_util=bool(exp_util),
    )
    outs = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        scratch_shapes=[pltpu.VMEM((rows, 128), jnp.float32)] * 4,
        interpret=interpret,
        **_SOLVE_OUTS,
    )(scal, ax, ay, acts_mm, im, _pad8(theta.reshape(m, -1)),
      _pad8(locs.reshape(m, -1)), _pad8(a_mat.reshape(m, -1)),
      _pad8(a_seq.reshape(1, -1)))
    (theta_opt, theta_fwd, amat_out, a_mix, a_seq_sel, w,
     costs) = _unpack(outs, m, hz, 2, n_act)
    return (
        theta_opt.reshape(m, hz, 2),
        theta_fwd.reshape(m, hz, 2),
        amat_out.reshape(m, hz, 2),
        a_mix,
        a_seq_sel.reshape(hz, 2),
        w,
        costs,
    )
