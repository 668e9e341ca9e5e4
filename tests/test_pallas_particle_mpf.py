"""Single-kernel particle-mass MPF vs the jnp MPF (interpreter mode on
CPU): the hand-derived likelihood gradient through `Particle.step` and
the whole fused loop must match jax.grad-based math, including the
acceleration/speed clip gates and the crash factor at the prediction
start."""

import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dust_tpu.inference import GaussianLikelihood, MPF
from dust_tpu.inference.mpf import FusedParticleMPF
from dust_tpu.models import Particle

_ENV = dict(
    dt=0.015,
    control_type="acceleration",
    can_crash=True,
    with_obstacle=True,
    deterministic=True,
    obst_preset="grid_4x4",
    obst_width=2.1,
    max_speed=5.0,
    max_accel=10.0,
    map_cell_size=0.1,
    map_size=[22, 22],
    map_type="direct",
)


def _setup(rng, log_space=True, m=50, with_obstacle=True):
    env = dict(_ENV)
    if not with_obstacle:
        env.update(can_crash=False, with_obstacle=False)
        for k in ("obst_preset", "obst_width", "map_cell_size", "map_size",
                  "map_type"):
            env.pop(k)
    model = Particle(uncertain_params=["mass"], mass=2.0, **env)
    lik = GaussianLikelihood(obs_std=0.1, model=model, log_space=log_space)
    init = rng.uniform(1.6, 2.4, size=(m, 1)).astype(np.float32)
    if log_space:
        init = np.log(init)
    obs = np.array([-9.0, -9.0, 0.4, -0.2], dtype=np.float32)
    return model, lik, init, obs


@pytest.mark.parametrize("log_space", [False, True])
@pytest.mark.parametrize("action", [(3.0, -5.0), (25.0, -2.0), (9.0, 30.0)])
def test_fused_particle_mpf_matches_jnp_mpf(rng, log_space, action):
    """Full optimize loop parity; |a|/m > max_accel cases exercise the
    acceleration clip gate (mass ~2 so a=25 saturates at 10)."""
    model, lik, init, obs = _setup(rng, log_space)
    lr, bw, prior_bw, n_steps = 1e-2, 0.3, 0.2, 6

    plain = MPF(likelihood=lik, optimizer=optax.sgd(lr))
    fused = FusedParticleMPF(likelihood=lik, lr=lr, interpret=True)

    a = jnp.asarray(action, jnp.float32)
    new_obs = jnp.array([-8.9, -9.1, 0.5, -0.4])

    ms_p = plain.init_state(init, obs, dim_a=2, bw=prior_bw)
    ms_f = fused.init_state(init, obs, dim_a=2, bw=prior_bw)
    ms_p, _, _ = plain.optimize(ms_p, a, new_obs, bw=bw, n_steps=n_steps)
    ms_f, _, _ = fused.optimize(ms_f, a, new_obs, bw=bw, n_steps=n_steps)

    np.testing.assert_allclose(
        np.asarray(ms_f.x), np.asarray(ms_p.x), rtol=2e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(ms_f.prior.locs), np.asarray(ms_p.prior.locs),
        rtol=2e-3, atol=2e-4,
    )


def test_fused_particle_mpf_speed_clip_gate(rng):
    """Start velocity near the +-5 speed limit: gradients through clipped
    velocity lanes must vanish exactly as jax.grad's do. m=13 also
    exercises the non-multiple-of-8 padding path."""
    model, lik, init, _ = _setup(rng, log_space=True, m=13)
    obs = np.array([0.0, 0.0, 4.96, -4.96], dtype=np.float32)
    lr, bw, prior_bw = 1e-2, 0.3, 0.2

    plain = MPF(likelihood=lik, optimizer=optax.sgd(lr))
    fused = FusedParticleMPF(likelihood=lik, lr=lr, interpret=True)
    a = jnp.array([9.0, -9.0])
    new_obs = jnp.array([0.07, -0.07, 5.0, -5.0])

    ms_p = plain.init_state(init, obs, dim_a=2, bw=prior_bw)
    ms_f = fused.init_state(init, obs, dim_a=2, bw=prior_bw)
    ms_p, _, _ = plain.optimize(ms_p, a, new_obs, bw=bw, n_steps=4)
    ms_f, _, _ = fused.optimize(ms_f, a, new_obs, bw=bw, n_steps=4)
    np.testing.assert_allclose(
        np.asarray(ms_f.x), np.asarray(ms_p.x), rtol=2e-3, atol=2e-4
    )


def test_fused_particle_mpf_crashed_start(rng):
    """A prediction start inside an obstacle cell freezes the particle
    (`dust/models/particle.py:155-163`): the likelihood gradient is zero
    and only the prior + kernel terms move the mass particles."""
    model, lik, init, _ = _setup(rng, log_space=True)
    occ = np.asarray(model.obst_map.map)
    xi, yi = np.argwhere(occ > 0)[0]
    cell = model.map_cell_size
    off = np.asarray(model.obst_map.c_offset)
    pos = (np.array([xi, yi]) + 0.5 - off) * cell
    obs = np.array([pos[0], pos[1], 0.4, -0.2], dtype=np.float32)
    assert float(model.obst_map.get_collisions(jnp.asarray(obs[:2]))) == 1.0

    lr, bw, prior_bw = 1e-2, 0.3, 0.2
    plain = MPF(likelihood=lik, optimizer=optax.sgd(lr))
    fused = FusedParticleMPF(likelihood=lik, lr=lr, interpret=True)
    a = jnp.array([3.0, -5.0])
    new_obs = np.array([pos[0], pos[1], 0.4, -0.2], dtype=np.float32)

    ms_p = plain.init_state(init, obs, dim_a=2, bw=prior_bw)
    ms_f = fused.init_state(init, obs, dim_a=2, bw=prior_bw)
    ms_p, _, _ = plain.optimize(ms_p, a, new_obs, bw=bw, n_steps=4)
    ms_f, _, _ = fused.optimize(ms_f, a, new_obs, bw=bw, n_steps=4)
    np.testing.assert_allclose(
        np.asarray(ms_f.x), np.asarray(ms_p.x), rtol=2e-3, atol=2e-4
    )


def test_fused_particle_mpf_no_obstacles(rng):
    """Obstacle-free model: the crash factor is identically zero and the
    full dt scale applies."""
    model, lik, init, obs = _setup(rng, log_space=False,
                                   with_obstacle=False)
    lr, bw, prior_bw = 1e-2, 0.3, 0.2
    plain = MPF(likelihood=lik, optimizer=optax.sgd(lr))
    fused = FusedParticleMPF(likelihood=lik, lr=lr, interpret=True)
    a = jnp.array([3.0, -5.0])
    new_obs = jnp.array([-8.9, -9.1, 0.5, -0.4])

    ms_p = plain.init_state(init, obs, dim_a=2, bw=prior_bw)
    ms_f = fused.init_state(init, obs, dim_a=2, bw=prior_bw)
    ms_p, _, _ = plain.optimize(ms_p, a, new_obs, bw=bw, n_steps=4)
    ms_f, _, _ = fused.optimize(ms_f, a, new_obs, bw=bw, n_steps=4)
    np.testing.assert_allclose(
        np.asarray(ms_f.x), np.asarray(ms_p.x), rtol=2e-3, atol=2e-4
    )


def test_fused_particle_mpf_rejects_velocity_control():
    model = Particle(
        uncertain_params=["mass"], mass=2.0, dt=0.015,
        control_type="velocity", deterministic=True, max_speed=5.0,
    )
    lik = GaussianLikelihood(obs_std=0.1, model=model, log_space=True)
    with pytest.raises(ValueError, match="acceleration"):
        FusedParticleMPF(likelihood=lik, lr=1e-2)
