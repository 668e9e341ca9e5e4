"""Single-kernel MPF optimize for the particle-task mass posterior.

Particle-navigation counterpart of `pallas_mpf.py`: the whole MPF
optimize loop (all n_steps SVGD iterations: GMM-prior score,
Gaussian-likelihood gradient through one `Particle.step` prediction,
RBF Stein direction, SGD update) runs as ONE Pallas program — the
mass particles never leave VMEM. Workload shape from the reference
demo (`demo/particle_config.yaml`): 50 one-dimensional (log-)mass
particles x 20 SVGD steps per MPC solve.

The likelihood gradient is hand-derived for the acceleration-control
`Particle.step` (`dust/models/particle.py:117-166` numerics): the mass
enters the prediction only through the velocity components,
  v_pred_j = clip(v0_j + clip(a_j/m, +-max_acc) * dt * (1-crash),
                  +-max_speed),
so the position residuals drop out of d(log lik)/dm entirely and the
kernel needs only the velocity scalars. Both clip gates use the strict
interior (grad 0 on the boundary, matching jax.grad away from the
measure-zero tie) and the crash factor `(1-collision)` at the rollout
start is folded into the `scale` scalar by the caller — it is shared by
every particle because all predictions start from the same past_obs.
Verified against jax.grad / `MPF.optimize` in
tests/test_pallas_particle_mpf.py. Prior centers are fixed during
optimize (refresh happens after, matching `MPF.optimize`); semantics =
`MPF(reference_compat=False)`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_svgd import _round_up


def _particle_mpf_kernel(scal_ref, x0_ref, centers_ref, x_out_ref, x_ref,
                         *, n_steps, m, mp, max_acc, max_speed, log_space):
    """scal_ref (SMEM [1, 16]): [bw, prior_bw, lr, sigma, v0x, v0y,
    ax, ay, loc_vx, loc_vy, scale, 0...].

    x0/centers [mp, 128] padded with the (log-)mass in lane 0.
    x_ref: [mp, 128] VMEM particle scratch (lives across iterations).
    """
    bw = scal_ref[0, 0]
    pbw = scal_ref[0, 1]
    lr = scal_ref[0, 2]
    sigma = scal_ref[0, 3]
    v0x = scal_ref[0, 4]
    v0y = scal_ref[0, 5]
    ax = scal_ref[0, 6]
    ay = scal_ref[0, 7]
    loc_vx = scal_ref[0, 8]
    loc_vy = scal_ref[0, 9]
    scale = scal_ref[0, 10]          # dt * (1 - collision_at_past_obs)

    x_ref[:] = x0_ref[:]
    c0t = centers_ref[:][:, 0:1].reshape(1, mp)   # transposed centers

    inv_pbw2 = 1.0 / (pbw * pbw)
    inv_bw2 = 1.0 / (bw * bw)
    inv_s2 = 1.0 / (sigma * sigma)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (mp, 1), 0)
    valid_row = row_ids < m                       # [mp, 1] mask
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (mp, mp), 1)
    valid_col = col_ids < m                       # [mp, mp] mask

    def vel_grad_term(a_j, v0_j, loc_j, invm):
        """-(pred - loc)/sigma^2 * dpred/dm for one velocity component."""
        acc_raw = a_j * invm
        acc = jnp.clip(acc_raw, -max_acc, max_acc)
        g_a = jnp.where((acc_raw > -max_acc) & (acc_raw < max_acc), 1.0, 0.0)
        v_raw = v0_j + acc * scale
        pred = jnp.clip(v_raw, -max_speed, max_speed)
        g_v = jnp.where(
            (v_raw > -max_speed) & (v_raw < max_speed), 1.0, 0.0
        )
        dpred = g_v * g_a * (-a_j * invm * invm) * scale
        return -(pred - loc_j) * inv_s2 * dpred

    def body(i, _):
        x = x_ref[:]                              # [mp, 128]
        mass = x[:, 0:1]
        # padded rows carry zeros; guard the reciprocal (their phi is
        # masked from the update, but NaNs must not enter any reduction)
        mass = jnp.where(valid_row, mass, 1.0)
        if log_space:
            mass = jnp.exp(mass)
        invm = 1.0 / mass

        # ---- likelihood gradient (hand-derived particle physics) ----
        gl = (vel_grad_term(ax, v0x, loc_vx, invm)
              + vel_grad_term(ay, v0y, loc_vy, invm))
        if log_space:
            gl = gl * mass

        # ---- 1-D pairwise math on the VPU (same layout as the
        # pendulum kernel; single parameter column) ----
        x0 = x[:, 0:1]                            # [mp, 1]
        x0t = x0.reshape(1, mp)                   # [1, mp]

        # GMM-prior score over fixed centers
        d2c = (x0 - c0t) ** 2                     # [mp, mp]
        logits = jnp.where(valid_col, -0.5 * d2c * inv_pbw2, -jnp.inf)
        mx = jnp.max(logits, axis=1, keepdims=True)
        p = jnp.exp(logits - mx)                  # zeros at masked cols
        psum = jnp.sum(p, axis=1, keepdims=True)
        pc0 = jnp.sum(p * c0t, axis=1, keepdims=True) / psum
        gp0 = (pc0 - x0) * inv_pbw2

        s0 = jnp.where(valid_row, gl + gp0, 0.0)  # score column [mp, 1]

        # RBF kernel Stein direction; the repulsion folds into the
        # drive sum (see pallas_sweep_episode.py): one fewer reduction
        d2 = (x0 - x0t) ** 2
        k = jnp.where(valid_col, jnp.exp(-0.5 * d2 * inv_bw2), 0.0)
        rows = jnp.sum(k, axis=1, keepdims=True)
        t0t = s0.reshape(1, mp) - x0t * inv_bw2
        drive0 = jnp.sum(k * t0t, axis=1, keepdims=True)
        phi0 = (drive0 + rows * x0 * inv_bw2) / jnp.float32(m)

        upd = jnp.concatenate(
            [phi0, jnp.zeros((mp, 127), jnp.float32)], axis=1
        )
        x_ref[:] = jnp.where(valid_row, x_ref[:] + lr * upd, x_ref[:])
        return 0

    jax.lax.fori_loop(0, n_steps, body, 0)
    x_out_ref[:] = x_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=("n_steps", "max_acc", "max_speed", "log_space",
                     "interpret"),
)
def fused_particle_mpf_optimize(x, prior_locs, past_obs, loc, action,
                                scale, bw, prior_bw, lr, obs_sigma,
                                n_steps=20, max_acc=10.0, max_speed=5.0,
                                log_space=True, interpret=False):
    """Run the whole particle-mass MPF SVGD loop in one Pallas program.

    x, prior_locs: [m, 1] (log-)mass particles / prior centers;
    past_obs [4] the prediction start state, loc [4] the newest
    observation, action [2], scale = dt * (1 - collision(past_obs)).
    Returns x_final [m, 1].
    """
    m = x.shape[0]
    mp = _round_up(max(m, 8), 8)

    xp = jnp.zeros((mp, 128), jnp.float32).at[:m, :1].set(x)
    cp = jnp.zeros((mp, 128), jnp.float32).at[:m, :1].set(prior_locs)
    scal = jnp.stack([
        jnp.asarray(bw, jnp.float32).reshape(()),
        jnp.asarray(prior_bw, jnp.float32).reshape(()),
        jnp.asarray(lr, jnp.float32).reshape(()),
        jnp.asarray(obs_sigma, jnp.float32).reshape(()),
        jnp.asarray(past_obs[2], jnp.float32),
        jnp.asarray(past_obs[3], jnp.float32),
        jnp.asarray(action[0], jnp.float32),
        jnp.asarray(action[1], jnp.float32),
        jnp.asarray(loc[2], jnp.float32),
        jnp.asarray(loc[3], jnp.float32),
        jnp.asarray(scale, jnp.float32).reshape(()),
        jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0),
        jnp.float32(0.0), jnp.float32(0.0),
    ]).reshape(1, 16)

    kernel = functools.partial(
        _particle_mpf_kernel, n_steps=n_steps, m=m, mp=mp,
        max_acc=float(max_acc), max_speed=float(max_speed),
        log_space=bool(log_space),
    )
    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((mp, 128), jnp.float32)],
        interpret=interpret,
    )(scal, xp, cp)
    return out[:m, :1]
