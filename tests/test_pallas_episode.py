"""Whole-episode megakernel (ops/pallas_episode.py) equivalence tests.

The production path generates noise in-kernel with the TPU hardware PRNG
(a different stream than jax.random — statistically equivalent, not
bitwise), and TPU interpret mode zero-stubs `prng_random_bits`, so CPU
tests drive the kernel's host-noise mode: every draw is injected, and the
whole episode must reproduce — step by step — the composition of the
independently-tested `fused_pendulum_solve` (tests/test_pallas_solve.py)
and `fused_pendulum_mpf_optimize` (tests/test_pallas_mpf.py) kernels with
the simulator step and Silverman bandwidths between them
(`PendulumSimulation.episode_fn` sequencing, `simulation.py:67-130`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dust_tpu.ops.bandwidth import silvermans_rule
from dust_tpu.ops.pallas_episode import fused_pendulum_episode
from dust_tpu.ops.pallas_mpf import fused_pendulum_mpf_optimize
from dust_tpu.ops.pallas_solve import fused_pendulum_solve

HZ, M, NP, NA, MM = 30, 3, 8, 128, 50
SIG, LR, ALPHA, TEMP, PSIG = 2.0, 2.0, 1.0, 1.0, 2.0
MLR, MSIG = 1e-3, 0.1
G_SIM, G_MODEL, DT = 10.0, 9.8, 0.05


def _setup(steps, seed=0):
    key = jax.random.key(seed)
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    theta0 = jax.random.normal(k1, (M, HZ)) * 0.3
    mpfx0 = jnp.stack(
        [1.0 + 0.1 * jax.random.normal(k2, (MM,)),
         1.0 + 0.1 * jax.random.normal(k3, (MM,))], axis=1
    )
    eps = jax.random.normal(k4, (steps, HZ, 8, 128))
    pdz = jax.random.normal(k5, (steps, 8, 128))
    pdu = jax.random.uniform(k6, (steps, 8, 128))
    return theta0, mpfx0, eps, pdz, pdu


def _reference_composition(steps, warm_up, theta0, mpfx0, eps, pdz, pdu,
                           prior_bw0, true_length=1.0, true_mass=1.0):
    """The same episode as a host loop over the independently-tested
    whole-solve and MPF kernels (interpret mode)."""
    theta, locs = theta0, theta0
    amat = jnp.zeros((M, HZ))
    aseq = jnp.zeros(HZ)
    x = mpfx0
    pbw = jnp.float32(prior_bw0)
    obs = jnp.array([np.pi, 0.0], jnp.float32)
    log_mix = jnp.full((M,), -np.log(M), jnp.float32)
    il_t, im_t = 1.0 / true_length, 1.0 / true_mass
    logs = {k: [] for k in ("th", "om", "action", "cost", "bw_sv",
                            "bw_mpf")}
    for t in range(steps):
        bw_sv = silvermans_rule(theta)
        actions = theta[None] + SIG * jnp.transpose(
            eps[t, :, :M, :NA], (2, 1, 0)
        )
        idx = jnp.minimum(
            jnp.floor(pdu[t, :NP, 0] * MM), MM - 1
        ).astype(jnp.int32)
        draws = x[idx] + pbw * pdz[t, :NP, 0:2]
        (theta_opt, theta_fwd, amat_n, _, a_seq_sel, _, _) = \
            fused_pendulum_solve(
                obs, theta, locs, log_mix, amat, aseq, actions,
                draws[:, 0], draws[:, 1], bw_sv, LR, ALPHA, TEMP, SIG,
                PSIG, hz=HZ, m=M, n_params=NP, n_act=NA, dt=DT,
                g=G_MODEL, interpret=True,
            )
        amat = amat_n
        if t >= warm_up:
            action = a_seq_sel[0]
            theta = theta_fwd
            locs = theta_fwd
        else:
            # warm-up (`simulation.py:83-93`): no forward — zero action,
            # keep the optimized (unrolled) particles, prior unchanged
            action = jnp.float32(0.0)
            theta = theta_opt
        a_cl = jnp.clip(action, -2.0, 2.0)
        om2 = jnp.clip(
            obs[1] + (-1.5 * G_SIM * il_t * jnp.sin(obs[0] + np.pi)
                      + 3.0 * im_t * il_t * il_t * a_cl) * DT,
            -8.0, 8.0,
        )
        th2 = obs[0] + om2 * DT
        new_obs = jnp.array([th2, om2])
        bw_mpf = silvermans_rule(x)
        x = fused_pendulum_mpf_optimize(
            x, x, obs, new_obs, action[None], bw_mpf, pbw, MLR, MSIG,
            n_steps=20, dt=DT, g=G_MODEL, interpret=True,
        )
        pbw = bw_mpf
        obs = new_obs
        logs["th"].append(float(th2))
        logs["om"].append(float(om2))
        logs["action"].append(float(action))
        logs["cost"].append(
            float(50.0 * (jnp.cos(th2) - 1.0) ** 2 + om2 ** 2)
        )
        logs["bw_sv"].append(float(bw_sv))
        logs["bw_mpf"].append(float(bw_mpf))
    return logs, theta, amat, x


def _run_mega(steps, warm_up, theta0, mpfx0, eps, pdz, pdu, prior_bw0,
              true_length=1.0, true_mass=1.0):
    return fused_pendulum_episode(
        jnp.zeros(2, jnp.int32), jnp.array([np.pi, 0.0]), theta0, theta0,
        jnp.zeros((M, HZ)), jnp.zeros(HZ), mpfx0, prior_bw0,
        true_length, true_mass, SIG, LR, ALPHA, TEMP, PSIG, MLR, MSIG,
        steps=steps, warm_up=warm_up, hz=HZ, m=M, n_params=NP, n_act=NA,
        m_mpf=MM, mpf_steps=20, dt=DT, g_model=G_MODEL, g_sim=G_SIM,
        host_eps=eps, host_pdz=pdz, host_pdu=pdu, interpret=True,
    )


@pytest.mark.parametrize("warm_up", [0, 2])
def test_episode_matches_tested_kernel_composition(warm_up):
    """First-step outputs are exact (0.0 observed); later steps drift
    at reassociation level (the megakernel accumulates the likelihood
    gradient by per-timestep lane reductions where the whole-solve
    kernel uses MXU matmuls) and the chaotic swing-up rollout amplifies
    ~1e-7 particle drift to ~1e-4 within a step — tolerances below are
    still 3+ orders tighter than any real logic bug would produce."""
    steps, prior_bw0 = 3, 0.05
    theta0, mpfx0, eps, pdz, pdu = _setup(steps)
    out = _run_mega(steps, warm_up, theta0, mpfx0, eps, pdz, pdu,
                    prior_bw0)
    ref_logs, ref_theta, ref_amat, ref_x = _reference_composition(
        steps, warm_up, theta0, mpfx0, eps, pdz, pdu, prior_bw0
    )
    for k, tol in (("th", 1e-5), ("om", 1e-4), ("action", 1e-4),
                   ("cost", 1e-3), ("bw_sv", 1e-6), ("bw_mpf", 1e-6)):
        np.testing.assert_allclose(
            np.asarray(out[k]), np.asarray(ref_logs[k]), atol=tol,
            err_msg=k,
        )
    np.testing.assert_allclose(out["theta"], ref_theta, atol=1e-3)
    np.testing.assert_allclose(out["a_mat"], ref_amat, atol=5e-3)
    np.testing.assert_allclose(out["mpf_x"], ref_x, atol=1e-5)

    # single-step check is EXACT modulo reassociation: no chaotic
    # amplification has occurred yet
    out1 = _run_mega(1, warm_up, theta0, mpfx0, eps[:1], pdz[:1],
                     pdu[:1], prior_bw0)
    ref1_logs, ref1_theta, ref1_amat, ref1_x = _reference_composition(
        1, warm_up, theta0, mpfx0, eps, pdz, pdu, prior_bw0
    )
    np.testing.assert_allclose(out1["theta"], ref1_theta, atol=1e-6)
    np.testing.assert_allclose(out1["a_mat"], ref1_amat, atol=1e-6)
    np.testing.assert_allclose(out1["action"][0], ref1_logs["action"][0],
                               atol=1e-6)


def test_episode_true_params_enter_simulator():
    """Different episode true parameters must change the trajectory
    (they are traced into the simulator, not baked)."""
    steps, prior_bw0 = 2, 0.05
    theta0, mpfx0, eps, pdz, pdu = _setup(steps, seed=1)
    out_a = _run_mega(steps, 0, theta0, mpfx0, eps, pdz, pdu, prior_bw0,
                      true_length=1.0, true_mass=1.0)
    out_b = _run_mega(steps, 0, theta0, mpfx0, eps, pdz, pdu, prior_bw0,
                      true_length=1.25, true_mass=0.8)
    assert not np.allclose(np.asarray(out_a["om"]),
                           np.asarray(out_b["om"]))
    # same controller noise: the first solve (same start state) picks the
    # same action before dynamics diverge
    np.testing.assert_allclose(out_a["action"][0], out_b["action"][0],
                               atol=1e-6)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="in-kernel hardware PRNG requires a real TPU")
def test_episode_device_rng_deterministic():
    steps, prior_bw0 = 4, 0.05
    theta0, mpfx0, _, _, _ = _setup(steps)

    def run():
        return fused_pendulum_episode(
            jnp.array([3, 7], jnp.int32), jnp.array([np.pi, 0.0]),
            theta0, theta0, jnp.zeros((M, HZ)), jnp.zeros(HZ), mpfx0,
            prior_bw0, 1.0, 1.0, SIG, LR, ALPHA, TEMP, PSIG, MLR, MSIG,
            steps=steps, hz=HZ, m=M, n_params=NP, n_act=NA, m_mpf=MM,
            mpf_steps=20, unroll=True,  # rolled body is CPU-only
        )

    a, b = run(), run()
    np.testing.assert_array_equal(np.asarray(a["cost"]),
                                  np.asarray(b["cost"]))
    assert np.isfinite(np.asarray(a["cost"])).all()


def test_bitonic_silverman_rows_match_reference():
    """_silverman_rows (one bitonic sort for all rows) must reproduce
    ops/bandwidth.silvermans_rule per row, including duplicate values
    and the +_POS_BIG lane padding."""
    import functools
    from jax.experimental import pallas as pl
    from dust_tpu.ops.pallas_episode import _POS_BIG, _silverman_rows

    n = 90
    key = jax.random.key(7)
    vals = jax.random.normal(key, (8, n)) * jnp.arange(
        1, 9, dtype=jnp.float32
    )[:, None]
    vals = vals.at[3, 10:20].set(vals[3, 0])      # duplicates
    tile = jnp.full((8, 128), jnp.float32(_POS_BIG))
    tile = tile.at[:, :n].set(vals)

    def kernel(v_ref, out_ref):
        out_ref[:] = jnp.broadcast_to(
            _silverman_rows(v_ref[:], n), (8, 128)
        )

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=True,
    )(tile)[:, 0]
    expect = np.array([silvermans_rule(np.asarray(vals[r]))
                       for r in range(8)])
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-6)
