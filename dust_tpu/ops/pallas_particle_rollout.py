"""Fused rollout+cost Pallas kernel for the particle control posterior.

Particle-navigation counterpart of `pallas_rollout.py`: all
N = n_params x n_actions x n_pol point-mass trajectories evolve entirely
in VMEM ([N/128, 128] position/velocity registers, action channels
streamed by horizon step) and the navigation cost
sum_{t=0..H-1} inst(s_t, a_t) + term(s_H) accumulates in-kernel,
returning only the [n_params, n_actions, n_pol] cost tensor.

Obstacle collisions use the same gather-free rectangle-membership test
as `models/obstacle_map.py:get_collisions` — the K decomposed cell
rectangles are baked in as compile-time constants and evaluated with
unrolled vector compares, so the kernel needs no occupancy table at
all. Each step computes the occupancy of the *current* state once and
shares it between the instantaneous cost term (`w_obs * occ`,
`dust/models/particle.py:170-198`) and the crash-freeze factor
`(1 - occ)` of the dynamics (`dust/models/particle.py:155-163`) —
matching the reference, which evaluates both at s_t. Physics matches
the acceleration-control `Particle.step` (`particle.py:117-166`:
acts = clip(a/m, +-max_acc), Euler update with old-velocity position
derivative, speed clamp), deterministic mode only (the scan path draws
control noise through `jax.random`; the kernel has no RNG).
Cost weights match `Particle.init_cost_weights`
(`particle.py:292-326`), applied per `MultiDisco.compute_cost`'s
states[..., :-1, :] / states[..., -1, :] split (`disco.py:294-346`).
Verified against the scan rollout + cost fns in
tests/test_pallas_particle_rollout.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def factor_rects(rects):
    """Split the STATIC rect set into (x_intervals, y_intervals,
    leftover_rects) such that the cross product of the interval lists
    is exactly a subset of `rects` — the regular obstacle-grid presets
    (e.g. grid_4x4: 16 interior rects = 4 x-bands x 4 y-bands, plus
    border-wall leftovers) factor, cutting the per-element occupancy
    test from len(rects) rectangle tests to |X| + |Y| interval tests
    plus the leftovers (measured 18 -> 10 tests on the particle demo).
    Returns (None, None, rects) when no cross-product subset of >= 4
    rects exists. The OR of the factored tests is boolean-identical to
    the per-rect OR (pure test reordering)."""
    from collections import Counter

    if rects is None:
        return None, None, None
    cx = Counter((xl, xh) for xl, xh, _, _ in rects)
    cy = Counter((yl, yh) for _, _, yl, yh in rects)
    xs = tuple(sorted(iv for iv, c in cx.items() if c >= 2))
    ys = tuple(sorted(iv for iv, c in cy.items() if c >= 2))
    cross = {(xl, xh, yl, yh) for xl, xh in xs for yl, yh in ys}
    if len(cross) >= 4 and cross <= set(rects):
        leftover = tuple(r for r in rects if r not in cross)
        return xs, ys, leftover
    return None, None, rects


def _periodic_intervals(ivs, vmax):
    """(offset, period, width, lo, hi) when the STATIC interval list
    is a uniform arithmetic progression whose single periodic-remainder
    membership test is EXHAUSTIVELY verified (here, at trace time, in
    f32) equal to the interval OR over the clamped integer cell domain
    [0, vmax]; None otherwise (callers fall back to the interval OR).
    The exhaustive check makes the fast path safe against f32 rounding
    in the remainder form: any cell it would misclassify rejects the
    factorization outright."""
    if vmax is None or len(ivs) < 3:
        return None
    w = ivs[0][1] - ivs[0][0]
    if any((h - l) != w for l, h in ivs):
        return None
    p = ivs[1][0] - ivs[0][0]
    if p <= 0 or any(ivs[k][0] != ivs[0][0] + k * p
                     for k in range(len(ivs))):
        return None
    off, lo, hi = ivs[0][0], ivs[0][0], ivs[-1][1]
    cells = np.arange(0.0, float(vmax) + 1.0, dtype=np.float32)
    u = cells - np.float32(off)
    r = u - np.float32(p) * np.floor(u * np.float32(1.0 / p))
    fast = ((r < np.float32(w)) & (cells >= np.float32(lo))
            & (cells < np.float32(hi)))
    ref = np.zeros_like(fast)
    for l, h in ivs:
        ref |= (cells >= np.float32(l)) & (cells < np.float32(h))
    if not np.array_equal(fast, ref):
        return None
    return float(off), float(p), float(w), float(lo), float(hi)


def occupancy_hit(xi, yi, rects, bounds=None):
    """Boolean occupancy from clamped cell-index tiles: factored
    interval tests when the static rect set decomposes (see
    `factor_rects`), per-rect tests otherwise. Output identical either
    way.

    bounds=(ximax, yimax) asserts the CALLER clamps xi to [0, ximax]
    and yi to [0, yimax] (all kernel call sites do, via the clip in
    their occ helpers); comparisons that are then statically always
    true are dropped — e.g. the two border-wall leftover rects of the
    demo map preset cost 4 tests instead of 16 (boolean-identical on
    the clamped domain, exhaustively checked per cell by
    tests/test_models.py)."""
    ximax = bounds[0] if bounds is not None else None
    yimax = bounds[1] if bounds is not None else None

    def ge(v, lo):
        # v >= lo, or None when statically true (v clamped to >= 0)
        return None if lo <= 0.0 else (v >= lo)

    def lt(v, hi, vmax):
        # v < hi, or None when statically true on [0, vmax]
        return None if (vmax is not None and hi > vmax) else (v < hi)

    def conj(*terms):
        # AND of the non-None terms; all-None (statically always true
        # on the clamped domain) degrades to a trivially-true compare
        out = None
        for term in terms:
            if term is None:
                continue
            out = term if out is None else (out & term)
        return (xi >= 0.0) if out is None else out

    def band_in(v, ivs, vmax):
        """OR of the axis interval tests — via ONE periodic-remainder
        test (r5, VERDICT r4 #6) when the STATIC interval list is a
        uniform arithmetic progression AND the remainder form is
        exhaustively verified boolean-identical over the clamped
        integer cell domain [0, vmax] at trace time (the callers
        produce integer-valued floats via floor + clip). The demo
        grid_4x4 bands (offset 39, period 40, width 22) qualify:
        2 compares + 4 arith ops replace 8 compares + 3 ORs per axis.
        Falls back to the interval OR otherwise."""
        per = _periodic_intervals(ivs, vmax)
        if per is not None:
            off, period, width, lo, hi = per
            u = v - off
            r = u - period * jnp.floor(u * (1.0 / period))
            return (r < width) & conj(ge(v, lo), lt(v, hi, vmax))
        out = None
        for lo_, hi_ in ivs:
            h = conj(ge(v, lo_), lt(v, hi_, vmax))
            out = h if out is None else (out | h)
        return out

    xs, ys, leftover = factor_rects(rects)
    hit = None
    if xs is not None:
        hit = band_in(xi, xs, ximax) & band_in(yi, ys, yimax)
    for xl, xh, yl, yh in leftover:
        h = conj(ge(xi, xl), lt(xi, xh, ximax),
                 ge(yi, yl), lt(yi, yh, yimax))
        hit = h if hit is None else (hit | h)
    return hit


def _rollout_kernel(scal_ref, ax_ref, ay_ref, im_ref, cost_ref,
                    px_ref, py_ref, vx_ref, vy_ref, *,
                    hz, rows, dt, max_acc, max_speed, weights, target,
                    rects, grid, crash):
    """scal_ref (SMEM [1, 4]): initial state (x, y, vx, vy), shared by
    every trajectory lane.

    ax/ay [hz, rows, 128]: action channels per horizon step per lane;
    im [rows, 128]: 1/mass per lane (padding lanes 1.0);
    cost_ref [rows, 128]: accumulated cost out;
    px/py/vx/vy: [rows, 128] VMEM state scratch.
    weights = (w_px, w_py, w_vx, w_vy, w_cx, w_cy, w_obs,
               wt_px, wt_py, wt_vx, wt_vy); target = (tx, ty, tvx, tvy);
    rects = K 4-tuples of half-open cell-index bounds (or None: no
    obstacles); grid = (inv_cell, offx, offy, ximax, yimax).
    """
    (w_px, w_py, w_vx, w_vy, w_cx, w_cy, w_obs,
     wt_px, wt_py, wt_vx, wt_vy) = weights
    tx, ty, tvx, tvy = target

    shape = (rows, 128)
    px_ref[:] = jnp.zeros(shape, jnp.float32) + scal_ref[0, 0]
    py_ref[:] = jnp.zeros(shape, jnp.float32) + scal_ref[0, 1]
    vx_ref[:] = jnp.zeros(shape, jnp.float32) + scal_ref[0, 2]
    vy_ref[:] = jnp.zeros(shape, jnp.float32) + scal_ref[0, 3]
    cost_ref[:] = jnp.zeros(shape, jnp.float32)
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

    def body(t, _):
        px = px_ref[:]
        py = py_ref[:]
        vx = vx_ref[:]
        vy = vy_ref[:]
        occ = occupancy(px, py)
        a_x = ax_ref[pl.ds(t, 1), :, :].reshape(shape)
        a_y = ay_ref[pl.ds(t, 1), :, :].reshape(shape)
        # inst cost of the *current* state + action t (the
        # states[..., :-1, :] slice of compute_cost: t=0 charges s0)
        cost_ref[:] += (
            state_cost(px, py, vx, vy, occ, (w_px, w_py, w_vx, w_vy))
            + w_cx * a_x * a_x + w_cy * a_y * a_y
        )
        # dynamics: old velocity drives the position update; crashed
        # lanes freeze whole-state via the (1 - occ) factor
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
        return 0

    jax.lax.fori_loop(0, hz, body, 0)
    px = px_ref[:]
    py = py_ref[:]
    vx = vx_ref[:]
    vy = vy_ref[:]
    cost_ref[:] += state_cost(
        px, py, vx, vy, occupancy(px, py), (wt_px, wt_py, wt_vx, wt_vy)
    )


@functools.partial(
    jax.jit,
    static_argnames=("dt", "max_acc", "max_speed", "weights", "target",
                     "rects", "grid", "crash", "interpret"),
)
def fused_particle_rollout_costs(state0, actions, masses, *, dt, max_acc,
                                 max_speed, weights, target, rects, grid,
                                 crash, interpret=False):
    """Navigation costs for every (param draw, action sample, policy)
    particle rollout, computed in one Pallas program.

    state0 [4]; actions [n_actions, n_pol, H, 2] (shared across param
    draws, as in `MultiDisco.forward`'s broadcast); masses [n_params].
    Static config as in `_rollout_kernel`. Returns
    [n_params, n_actions, n_pol].
    """
    n_act, n_pol, hz, _ = actions.shape
    n_params = masses.shape[0]
    n_traj = n_act * n_pol
    n = n_params * n_traj
    npad = -(-n // 128) * 128
    rows = npad // 128

    def stream(ch):
        acts = actions[..., ch].reshape(n_traj, hz)
        acts = jnp.tile(acts, (n_params, 1))              # [n, hz]
        acts = jnp.zeros((npad, hz), jnp.float32).at[:n].set(acts)
        return acts.T.reshape(hz, rows, 128)

    flat_m = jnp.repeat(jnp.asarray(masses, jnp.float32).reshape(-1),
                        n_traj)
    im = 1.0 / jnp.ones((npad,), jnp.float32).at[:n].set(flat_m).reshape(
        rows, 128
    )
    scal = jnp.asarray(state0, jnp.float32).reshape(1, 4)

    kernel = functools.partial(
        _rollout_kernel, hz=hz, rows=rows, dt=float(dt),
        max_acc=float(max_acc), max_speed=float(max_speed),
        weights=weights, target=target, rects=rects, grid=grid,
        crash=bool(crash),
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
        scratch_shapes=[pltpu.VMEM((rows, 128), jnp.float32)] * 4,
        interpret=interpret,
    )(scal, stream(0), stream(1), im)
    return cost.reshape(npad)[:n].reshape(n_params, n_act, n_pol)


def particle_kernel_statics(model):
    """Validate a `Particle` model for the fused kernels and extract the
    compile-time cost/collision configuration: dict(weights, target,
    rects, grid, crash) as consumed by `_rollout_kernel` and
    `pallas_solve._particle_solve_kernel`."""
    if model.control_type != "acceleration":
        raise ValueError(
            "fused particle rollout supports acceleration control only"
        )
    if not model.deterministic:
        raise ValueError(
            "fused particle rollout requires deterministic dynamics (the "
            "kernel has no RNG for control noise) - use the scan path"
        )
    if tuple(model.uncertain_params or ()) not in ((), ("mass",)):
        raise ValueError(
            "fused particle rollout supports exactly one uncertain param:"
            f" ('mass',), got {tuple(model.uncertain_params)}"
        )

    w = tuple(float(v) for v in np.asarray(model.w_state))       # [4]
    wc = tuple(float(v) for v in np.asarray(model.w_ctrl))       # [2]
    wt = tuple(float(v) for v in np.asarray(model.w_term))       # [4]
    weights = (*w, *wc, float(model.w_obs), *wt)
    target = tuple(float(v) for v in np.asarray(model.target))   # [4]

    rects, grid = None, None
    if model.with_obstacle and model.obst_map is not None:
        bounds = model.obst_map.rect_bounds
        if bounds is None:
            raise ValueError(
                "fused particle rollout needs a binary occupancy raster "
                "(rectangle decomposition unavailable) - use the scan path"
            )
        xlo, xhi, ylo, yhi = (np.asarray(b) for b in bounds)
        rects = tuple(
            (float(a), float(b), float(c), float(d))
            for a, b, c, d in zip(xlo, xhi, ylo, yhi)
        )
        om = model.obst_map
        grid = (
            1.0 / om.cell_size,
            float(om.c_offset[0]), float(om.c_offset[1]),
            float(om.map.shape[0] - 1), float(om.map.shape[1] - 1),
        )
    crash = model.can_crash and model.with_obstacle
    return dict(weights=weights, target=target, rects=rects, grid=grid,
                crash=crash)


def make_fused_particle_state_costs(model, interpret=False):
    """Build the `MultiDisco(fused_state_costs=...)` hook for a
    deterministic acceleration-control `Particle` model:
    (state, actions [n_actions, n_pol, H, 2], params dict|None) -> state
    costs [n_actions, n_pol] (mean over param draws), replacing
    rollout + inst/term evaluation. Uses the model's built-in cost
    functions (`default_inst_cost`/`default_term_cost`)."""
    statics = particle_kernel_statics(model)
    weights = statics["weights"]
    target = statics["target"]
    rects, grid, crash = statics["rects"], statics["grid"], statics["crash"]
    m_def = float(model.params_dict["mass"])

    def hook(state, actions, params):
        s0 = jnp.reshape(jnp.asarray(state, jnp.float32), (-1,))[:4]
        if params is None:
            masses = jnp.full((1,), m_def, jnp.float32)
        else:
            unknown = set(params) - {"mass"}
            if unknown:
                raise ValueError(
                    "fused particle state-cost hook only supports a mass"
                    f" parameter column, got {sorted(unknown)} - use the"
                    " scan rollout path for other overrides"
                )
            masses = params["mass"].reshape(-1)
        costs = fused_particle_rollout_costs(
            s0, actions, masses, dt=float(model.dt),
            max_acc=model.max_acc, max_speed=model.max_speed,
            weights=weights, target=target, rects=rects, grid=grid,
            crash=crash, interpret=interpret,
        )
        return costs.mean(axis=0)

    return hook
