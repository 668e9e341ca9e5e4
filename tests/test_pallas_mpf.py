"""Single-kernel pendulum MPF vs the jnp MPF (interpreter mode on CPU):
the hand-derived likelihood gradient and the whole fused loop must match
jax.grad-based math."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dust_tpu.inference import GaussianLikelihood, MPF
from dust_tpu.inference.mpf import FusedPendulumMPF
from dust_tpu.models import PendulumModel


def _setup(rng, log_space=False, m=50):
    model = PendulumModel(uncertain_params=("length", "mass"))
    lik = GaussianLikelihood(obs_std=0.1, model=model, log_space=log_space)
    init = rng.uniform(0.6, 1.3, size=(m, 2)).astype(np.float32)
    if log_space:
        init = np.log(init)
    obs = np.array([2.8, -0.3], dtype=np.float32)
    return model, lik, init, obs


@pytest.mark.parametrize("log_space", [False, True])
@pytest.mark.parametrize("action", [0.9, 2.5, -1.4])
def test_fused_mpf_matches_jnp_mpf(rng, log_space, action):
    """Full optimize loop parity, including torque clipping (|a|>2) and
    log-space parameters."""
    model, lik, init, obs = _setup(rng, log_space)
    lr, bw, prior_bw, n_steps = 1e-3, 0.3, 0.2, 6

    plain = MPF(likelihood=lik, optimizer=optax.sgd(lr))
    fused = FusedPendulumMPF(likelihood=lik, lr=lr, interpret=True)

    a = jnp.array([action])
    new_obs = jnp.array([2.7, -0.6])

    ms_p = plain.init_state(init, obs, dim_a=1, bw=prior_bw)
    ms_f = fused.init_state(init, obs, dim_a=1, bw=prior_bw)
    ms_p, _, _ = plain.optimize(ms_p, a, new_obs, bw=bw, n_steps=n_steps)
    ms_f, _, _ = fused.optimize(ms_f, a, new_obs, bw=bw, n_steps=n_steps)

    np.testing.assert_allclose(
        np.asarray(ms_f.x), np.asarray(ms_p.x), rtol=2e-3, atol=2e-4
    )
    # the refreshed priors agree too
    np.testing.assert_allclose(
        np.asarray(ms_f.prior.locs), np.asarray(ms_p.prior.locs),
        rtol=2e-3, atol=2e-4,
    )


def test_fused_mpf_speed_clip_gate(rng):
    """A state near the speed limit exercises the clip gate: gradients
    through clipped lanes must vanish exactly as jax.grad's do."""
    model, lik, init, _ = _setup(rng)
    # theta_d0 near the +8 clip: large positive tdd pushes past it for
    # some particles
    obs = np.array([0.5, 7.9], dtype=np.float32)
    lr, bw, prior_bw = 1e-3, 0.3, 0.2

    plain = MPF(likelihood=lik, optimizer=optax.sgd(lr))
    fused = FusedPendulumMPF(likelihood=lik, lr=lr, interpret=True)
    a = jnp.array([2.0])
    new_obs = jnp.array([0.6, 8.0])

    ms_p = plain.init_state(init, obs, dim_a=1, bw=prior_bw)
    ms_f = fused.init_state(init, obs, dim_a=1, bw=prior_bw)
    ms_p, _, _ = plain.optimize(ms_p, a, new_obs, bw=bw, n_steps=4)
    ms_f, _, _ = fused.optimize(ms_f, a, new_obs, bw=bw, n_steps=4)
    np.testing.assert_allclose(
        np.asarray(ms_f.x), np.asarray(ms_p.x), rtol=2e-3, atol=2e-4
    )


@pytest.mark.parametrize("log_space", [False, True])
def test_closed_form_mpf_matches_jnp_mpf(rng, log_space):
    """ClosedFormPendulumMPF (hand-derived jnp likelihood gradient) ==
    plain MPF with jax.grad."""
    from dust_tpu.inference.mpf import ClosedFormPendulumMPF

    model, lik, init, obs = _setup(rng, log_space)
    lr, bw, prior_bw, n_steps = 1e-3, 0.3, 0.2, 6

    plain = MPF(likelihood=lik, optimizer=optax.sgd(lr))
    closed = ClosedFormPendulumMPF(likelihood=lik, optimizer=optax.sgd(lr))

    a = jnp.array([1.7])
    new_obs = jnp.array([2.7, -0.6])
    ms_p = plain.init_state(init, obs, dim_a=1, bw=prior_bw)
    ms_c = closed.init_state(init, obs, dim_a=1, bw=prior_bw)
    ms_p, _, _ = plain.optimize(ms_p, a, new_obs, bw=bw, n_steps=n_steps)
    ms_c, _, _ = closed.optimize(ms_c, a, new_obs, bw=bw, n_steps=n_steps)
    np.testing.assert_allclose(np.asarray(ms_c.x), np.asarray(ms_p.x),
                               rtol=2e-4, atol=2e-5)


def test_fused_mpf_vmaps_over_scenarios(rng):
    """vmap lifts the fused-MPF kernel to a leading grid dim (the fused
    sweep path, bench/bench_all.py bench_sweep(fused=True)): batched ==
    per-lane."""
    from dust_tpu.ops.pallas_mpf import fused_pendulum_mpf_optimize

    n_sc, m = 3, 12
    xs = rng.uniform(0.6, 1.3, size=(n_sc, m, 2)).astype(np.float32)
    obs = np.array(
        [[2.8, -0.3], [2.5, 0.4], [3.0, 0.0]], dtype=np.float32
    )
    locs = obs + np.array([0.1, -0.2], dtype=np.float32)
    acts = np.array([[0.9], [-1.4], [2.5]], dtype=np.float32)

    f = lambda x, po, lo, a: fused_pendulum_mpf_optimize(
        x, x, po, lo, a, 0.3, 0.2, 1e-3, 0.1, n_steps=4, interpret=True
    )
    batched = jax.vmap(f)(jnp.asarray(xs), jnp.asarray(obs),
                          jnp.asarray(locs), jnp.asarray(acts))
    single = jnp.stack(
        [f(xs[i], obs[i], locs[i], acts[i]) for i in range(n_sc)]
    )
    np.testing.assert_allclose(
        np.asarray(batched), np.asarray(single), rtol=1e-6, atol=1e-6
    )
