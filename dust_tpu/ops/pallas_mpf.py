"""Single-kernel MPF optimize for the pendulum dynamics posterior.

The phase breakdown (bench/bench_phases.py) shows the dual solve spends
~45% of its time in MPF's 20 sequential SVGD steps — chains of tiny
[50, 2] ops. This kernel collapses the *whole optimize loop* (all
n_steps iterations: GMM-prior score, Gaussian-likelihood gradient
through the pendulum transition, RBF-kernel Stein direction, SGD update)
into ONE Pallas program: the particles never leave VMEM.

Measured verdict (TPU v5e, m=50) — workload-dependent, both numbers
real:
* micro-benched in isolation (one warm program in flight), XLA's
  compiled chain wins: ~205 us per optimize vs ~290-340 us for this
  kernel (Mosaic loop overhead and relayouts dominate at this size);
* inside the full episode scan (bench.py), this kernel wins 1.4x
  end-to-end: ~3.3k vs ~2.3k solves/s. With 20 sequential SVGD steps
  per solve embedded in a 200-step scan, collapsing each optimize to a
  single program removes the inter-op scheduling gaps that the isolated
  measurement never pays.
It is therefore the bench default (`BENCH_MPF=plain` restores the jnp
path); the other Pallas wins live where the quadratic objects are big
(`FusedMPF`: 5.8x at m=2048, pallas_svgd/pallas_gmm).

The likelihood gradient is hand-derived for `PendulumModel.step`
(`dust/models/pendulum.py:93-100` physics; uncertain params (length,
mass)) including the speed-clip gate, and is verified against jax.grad in
tests/test_pallas_mpf.py. Prior centers are fixed during optimize
(refresh happens after, matching `MPF.optimize`), semantics =
`MPF(reference_compat=False)`.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_svgd import _round_up

_MAX_SPEED = 8.0
_MAX_TORQUE = 2.0


def _mpf_kernel(scal_ref, x0_ref, centers_ref, x_out_ref, x_ref,
                *, n_steps, m, mp, dt, g, log_space):
    """scal_ref (SMEM [1, 16]): [bw, prior_bw, lr, sigma, theta0,
    theta_d0, action, loc0, loc1, 0...].

    x0/centers [mp, 128] padded with (length, mass) in lanes 0:2.
    x_ref: [mp, 128] VMEM particle scratch (lives across iterations).
    """
    bw = scal_ref[0, 0]
    pbw = scal_ref[0, 1]
    lr = scal_ref[0, 2]
    sigma = scal_ref[0, 3]
    theta0 = scal_ref[0, 4]
    theta_d0 = scal_ref[0, 5]
    action = scal_ref[0, 6]
    loc0 = scal_ref[0, 7]
    loc1 = scal_ref[0, 8]

    x_ref[:] = x0_ref[:]
    centers = centers_ref[:]
    c0t = centers[:, 0:1].reshape(1, mp)   # transposed center columns
    c1t = centers[:, 1:2].reshape(1, mp)

    inv_pbw2 = 1.0 / (pbw * pbw)
    inv_bw2 = 1.0 / (bw * bw)
    inv_s2 = 1.0 / (sigma * sigma)
    acts = jnp.clip(action, -_MAX_TORQUE, _MAX_TORQUE)
    sin_t = jnp.sin(theta0 + math.pi)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (mp, 1), 0)
    valid_row = row_ids < m                       # [mp, 1] mask
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (mp, mp), 1)
    valid_col = col_ids < m                       # [mp, mp] mask

    def body(i, _):
        x = x_ref[:]                              # [mp, 128]
        length = x[:, 0:1]
        mass = x[:, 1:2]
        # padded rows carry zeros; guard the reciprocals (their phi is
        # masked from the update, but NaNs must not enter any reduction)
        length = jnp.where(valid_row, length, 1.0)
        mass = jnp.where(valid_row, mass, 1.0)
        if log_space:
            length = jnp.exp(length)
            mass = jnp.exp(mass)

        # ---- likelihood gradient (hand-derived pendulum physics) ----
        il = 1.0 / length
        im = 1.0 / mass
        tdd = -3.0 * g * 0.5 * il * sin_t + 3.0 * im * il * il * acts
        theta_d_raw = theta_d0 + dt * tdd
        theta_d = jnp.clip(theta_d_raw, -_MAX_SPEED, _MAX_SPEED)
        theta = theta0 + theta_d * dt
        clip_gate = jnp.where(
            (theta_d_raw > -_MAX_SPEED) & (theta_d_raw < _MAX_SPEED), 1.0,
            0.0,
        )
        dtd_dl = clip_gate * dt * (
            3.0 * g * 0.5 * il * il * sin_t
            - 6.0 * im * il * il * il * acts
        )
        dtd_dm = clip_gate * dt * (-3.0 * im * im * il * il * acts)
        r0 = theta - loc0
        r1 = theta_d - loc1
        common = -(r0 * dt + r1) * inv_s2
        gl_l = common * dtd_dl
        gl_m = common * dtd_dm
        if log_space:
            gl_l = gl_l * length
            gl_m = gl_m * mass

        # ---- all pairwise math on the VPU (d=2: two column vectors;
        # MXU latency chains dominate tiny matmuls, so none are used) ----
        x0 = x[:, 0:1]                            # [mp, 1]
        x1 = x[:, 1:2]
        x0t = x0.reshape(1, mp)                   # [1, mp]
        x1t = x1.reshape(1, mp)

        # GMM-prior score over fixed centers
        d2c = (x0 - c0t) ** 2 + (x1 - c1t) ** 2   # [mp, mp]
        logits = jnp.where(valid_col, -0.5 * d2c * inv_pbw2, -jnp.inf)
        mx = jnp.max(logits, axis=1, keepdims=True)
        p = jnp.exp(logits - mx)                  # zeros at masked cols
        psum = jnp.sum(p, axis=1, keepdims=True)
        pc0 = jnp.sum(p * c0t, axis=1, keepdims=True) / psum
        pc1 = jnp.sum(p * c1t, axis=1, keepdims=True) / psum
        gp0 = (pc0 - x0) * inv_pbw2
        gp1 = (pc1 - x1) * inv_pbw2

        s0 = gl_l + gp0                           # score columns [mp, 1]
        s1 = gl_m + gp1
        s0 = jnp.where(valid_row, s0, 0.0)
        s1 = jnp.where(valid_row, s1, 0.0)

        # RBF kernel Stein direction; the repulsion folds into the
        # drive sum (see pallas_sweep_episode.py):
        # phi = sum_j k_rj*(s_j - x_j/bw^2) + (sum_j k_rj)*x_r/bw^2
        d2 = (x0 - x0t) ** 2 + (x1 - x1t) ** 2
        k = jnp.where(valid_col, jnp.exp(-0.5 * d2 * inv_bw2), 0.0)
        rows = jnp.sum(k, axis=1, keepdims=True)
        t0t = s0.reshape(1, mp) - x0t * inv_bw2
        t1t = s1.reshape(1, mp) - x1t * inv_bw2
        drive0 = jnp.sum(k * t0t, axis=1, keepdims=True)
        drive1 = jnp.sum(k * t1t, axis=1, keepdims=True)
        phi0 = (drive0 + rows * x0 * inv_bw2) / jnp.float32(m)
        phi1 = (drive1 + rows * x1 * inv_bw2) / jnp.float32(m)

        upd = jnp.concatenate(
            [phi0, phi1, jnp.zeros((mp, 126), jnp.float32)], axis=1
        )
        x_ref[:] = jnp.where(valid_row, x_ref[:] + lr * upd, x_ref[:])
        return 0

    jax.lax.fori_loop(0, n_steps, body, 0)
    x_out_ref[:] = x_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=("n_steps", "dt", "g", "log_space", "interpret"),
)
def fused_pendulum_mpf_optimize(x, prior_locs, past_obs, loc, action, bw,
                                prior_bw, lr, obs_sigma, n_steps=20,
                                dt=0.05, g=9.8, log_space=False,
                                interpret=False):
    """Run the whole MPF SVGD loop in one Pallas program.

    x, prior_locs: [m, 2] (length, mass) particles / prior centers;
    past_obs [2] the rollout start, loc [2] the newest observation,
    action [1]. Returns x_final [m, 2].
    """
    m = x.shape[0]
    mp = _round_up(max(m, 8), 8)

    xp = jnp.zeros((mp, 128), jnp.float32).at[:m, :2].set(x)
    cp = jnp.zeros((mp, 128), jnp.float32).at[:m, :2].set(prior_locs)
    scal = jnp.stack([
        jnp.asarray(bw, jnp.float32).reshape(()),
        jnp.asarray(prior_bw, jnp.float32).reshape(()),
        jnp.asarray(lr, jnp.float32).reshape(()),
        jnp.asarray(obs_sigma, jnp.float32).reshape(()),
        jnp.asarray(past_obs[0], jnp.float32),
        jnp.asarray(past_obs[1], jnp.float32),
        jnp.asarray(action, jnp.float32).reshape(-1)[0],
        jnp.asarray(loc[0], jnp.float32),
        jnp.asarray(loc[1], jnp.float32),
        jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0),
        jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0),
        jnp.float32(0.0),
    ]).reshape(1, 16)

    kernel = functools.partial(
        _mpf_kernel, n_steps=n_steps, m=m, mp=mp, dt=float(dt), g=float(g),
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
    return out[:m, :2]
