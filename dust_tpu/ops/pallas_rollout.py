"""Fused rollout+cost Pallas kernel for the pendulum control posterior.

The SVMPC SVGD step never differentiates through the rollouts (the
likelihood gradient is the reparameterized analytic form,
`dust/inference/svmpc.py:46-56`) and discards the trajectories — it only
consumes per-sequence costs. The XLA path (`MultiDisco.rollout`,
`disco.py:139-209` semantics) still materializes the full
[n_params, n_actions, n_pol, H+1, S] state tensor through a 30-iteration
scan of tiny elementwise ops, paying an inter-op scheduling gap per
horizon step — the same latency tax the fused MPF kernel
(`pallas_mpf.py`) eliminated for the dynamics posterior.

This kernel evolves all N = n_params x n_actions x n_pol pendulum
trajectories entirely in VMEM ([N/128, 128] theta/omega registers, the
action tensor streamed by horizon step) and accumulates the swing-up
cost sum_{t=0..H-1} inst(s_t) + term(s_H) in-kernel, returning only the
[n_params, n_actions, n_pol] cost tensor. Measured (TPU v5e, headline
dual-inference bench with the fused MPF): 3510 vs 3247 solves/s — the
bench default (`BENCH_ROLLOUT=plain` restores the scan path). Physics matches
`PendulumModel.step` (`dust/models/pendulum.py:82-100`: torque clamp
+-2, Euler update, speed clamp +-8, new-theta_d integration) and the
cost matches `pendulum_cost_fns` (50 (cos th - 1)^2 + th_dot^2, applied
per `MultiDisco.compute_cost`'s states[..., :-1, :] / states[..., -1, :]
split, `disco.py:294-346`).
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
# the swing-up cost weight of `experiments.pendulum_cost_fns`; pinned
# against drift by tests/test_pallas_rollout.py::test_forward_fused_
# matches_plain, which evaluates both paths through the real cost fns
_SWINGUP_W = 50.0


def _rollout_kernel(scal_ref, a_ref, il_ref, im_ref, cost_ref, th_ref,
                    om_ref, *, hz, rows, dt, g):
    """scal_ref (SMEM [1, 2]): [theta0, theta_d0] (shared initial state).

    a_ref [hz, rows, 128]: action per horizon step per trajectory lane;
    il/im [rows, 128]: 1/length and 1/mass per lane (padding lanes 1.0);
    cost_ref [rows, 128]: accumulated state cost out;
    th/om_ref: [rows, 128] VMEM state scratch (carrying the state through
    refs rather than fori_loop values avoids Mosaic's replicated-layout
    relayout failure on broadcast-of-dynamic-scalar carries).
    """
    il = il_ref[:]
    im = im_ref[:]
    # loop-invariant physics coefficients
    c_grav = -3.0 * g * 0.5 * dt * il           # dt * (-3g / 2l)
    c_act = 3.0 * dt * im * il * il             # dt * 3 / (m l^2)

    shape = (rows, 128)
    th_ref[:] = jnp.zeros(shape, jnp.float32) + scal_ref[0, 0]
    om_ref[:] = jnp.zeros(shape, jnp.float32) + scal_ref[0, 1]
    cost_ref[:] = jnp.zeros(shape, jnp.float32)

    def body(t, _):
        th = th_ref[:]
        om = om_ref[:]
        # inst cost of the *current* state: t=0 charges s0, matching the
        # states[..., :-1, :] slice of compute_cost
        cost_ref[:] += _SWINGUP_W * (jnp.cos(th) - 1.0) ** 2 + om * om
        a = a_ref[pl.ds(t, 1), :, :]
        a = jnp.clip(a.reshape(shape), -_MAX_TORQUE, _MAX_TORQUE)
        om = om + c_grav * jnp.sin(th + math.pi) + c_act * a
        om = jnp.clip(om, -_MAX_SPEED, _MAX_SPEED)
        om_ref[:] = om
        th_ref[:] = th + om * dt                # new theta_d integration
        return 0

    jax.lax.fori_loop(0, hz, body, 0)
    th = th_ref[:]
    om = om_ref[:]
    cost_ref[:] += _SWINGUP_W * (jnp.cos(th) - 1.0) ** 2 + om * om


@functools.partial(
    jax.jit, static_argnames=("dt", "g", "interpret")
)
def fused_pendulum_rollout_costs(state0, actions, lengths, masses,
                                 dt=0.05, g=9.8, interpret=False):
    """State costs for every (param draw, action sample, policy) pendulum
    rollout, computed in one Pallas program.

    state0 [2]; actions [n_actions, n_pol, H, 1] (shared across param
    draws, as in `MultiDisco.forward`'s broadcast); lengths/masses
    [n_params]. Returns [n_params, n_actions, n_pol].
    """
    n_act, n_pol, hz, _ = actions.shape
    n_params = lengths.shape[0]
    n_traj = n_act * n_pol
    n = n_params * n_traj
    npad = -(-n // 128) * 128
    rows = npad // 128

    acts = actions.reshape(n_traj, hz)
    acts = jnp.tile(acts, (n_params, 1))                  # [n, hz]
    acts = jnp.zeros((npad, hz), jnp.float32).at[:n].set(acts)
    acts = acts.T.reshape(hz, rows, 128)

    def col(v):
        flat = jnp.repeat(
            jnp.asarray(v, jnp.float32).reshape(-1), n_traj
        )
        return jnp.ones((npad,), jnp.float32).at[:n].set(flat).reshape(
            rows, 128
        )

    il = 1.0 / col(lengths)
    im = 1.0 / col(masses)
    scal = jnp.stack([
        jnp.asarray(state0[0], jnp.float32),
        jnp.asarray(state0[1], jnp.float32),
    ]).reshape(1, 2)

    kernel = functools.partial(
        _rollout_kernel, hz=hz, rows=rows, dt=float(dt), g=float(g)
    )
    cost = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((rows, 128), jnp.float32),
            pltpu.VMEM((rows, 128), jnp.float32),
        ],
        interpret=interpret,
    )(scal, acts, il, im)
    return cost.reshape(npad)[:n].reshape(n_params, n_act, n_pol)


def make_fused_pendulum_state_costs(model, interpret=False):
    """Build the `MultiDisco(fused_state_costs=...)` hook for a
    `PendulumModel`: (state, actions [n_actions, n_pol, H, A], params
    dict|None) -> state costs [n_actions, n_pol] (mean over param
    draws), replacing rollout + inst/term evaluation."""
    g_def, m_def, l_def = (
        float(model.params_dict["g"]),
        float(model.params_dict["mass"]),
        float(model.params_dict["length"]),
    )

    def hook(state, actions, params):
        s0 = jnp.reshape(jnp.asarray(state, jnp.float32), (-1,))[:2]
        if params is None:
            lengths = jnp.full((1,), l_def, jnp.float32)
            masses = jnp.full((1,), m_def, jnp.float32)
        else:
            unknown = set(params) - {"length", "mass"}
            if unknown:
                raise ValueError(
                    "fused pendulum state-cost hook only supports"
                    f" length/mass parameter columns, got {sorted(unknown)}"
                    " - use the scan rollout path for other overrides"
                )
            lengths = (
                params["length"].reshape(-1)
                if "length" in params
                else jnp.full((1,), l_def, jnp.float32)
            )
            masses = (
                params["mass"].reshape(-1)
                if "mass" in params
                else jnp.full((1,), m_def, jnp.float32)
            )
            if lengths.shape[0] != masses.shape[0]:
                n = max(lengths.shape[0], masses.shape[0])
                lengths = jnp.broadcast_to(lengths, (n,))
                masses = jnp.broadcast_to(masses, (n,))
        costs = fused_pendulum_rollout_costs(
            s0, actions, lengths, masses, dt=float(model.dt), g=g_def,
            interpret=interpret,
        )
        return costs.mean(axis=0)

    return hook
