"""Particle-axis sharded SVGD vs single-device math on the 8-device CPU
mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dust_tpu.inference import GaussianLikelihood, MPF
from dust_tpu.models import PendulumModel
from dust_tpu.ops.pallas_svgd import svgd_phi_reference
from dust_tpu.parallel import make_mesh
from dust_tpu.parallel.stein import ShardedMPF, make_sharded_svgd_phi


def test_sharded_phi_matches_reference(rng):
    mesh = make_mesh(axis_names=("particle",))
    m, d = 64, 3
    x = jnp.asarray(rng.normal(size=(m, d)).astype(np.float32))
    score = jnp.asarray(rng.normal(size=(m, d)).astype(np.float32)) * 4.0
    bw = 0.9

    phi_fn = make_sharded_svgd_phi(mesh, "particle")
    sharded = jax.jit(phi_fn)(x, score, jnp.float32(bw))
    oracle = svgd_phi_reference(x, score, bw)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(oracle),
                               rtol=1e-4, atol=1e-5)


def test_sharded_mpf_matches_single_device(rng):
    """ShardedMPF.optimize == MPF(reference_compat=False).optimize on the
    same particles (8-way particle sharding)."""
    mesh = make_mesh(axis_names=("particle",))
    model = PendulumModel(uncertain_params=("length", "mass"))
    lik = GaussianLikelihood(obs_std=0.1, model=model)

    init = rng.uniform(0.6, 1.3, size=(64, 2)).astype(np.float32)
    obs = np.array([2.8, -0.2], dtype=np.float32)
    action = np.array([0.8], dtype=np.float32)
    new_obs = np.array([2.7, -0.5], dtype=np.float32)

    plain = MPF(likelihood=lik, optimizer=optax.sgd(1e-3))
    ms0 = plain.init_state(init, obs, dim_a=1, bw=0.2)
    ms1, grads1, _ = plain.optimize(
        ms0, jnp.asarray(action), jnp.asarray(new_obs), bw=0.3, n_steps=5
    )

    sharded = ShardedMPF(likelihood=lik, mesh=mesh, optimizer=optax.sgd(1e-3))
    ss0 = sharded.shard_state(
        sharded.init_state(init, obs, dim_a=1, bw=0.2)
    )
    ss1, grads2, _ = sharded.optimize(
        ss0, jnp.asarray(action), jnp.asarray(new_obs), bw=0.3, n_steps=5
    )

    np.testing.assert_allclose(
        np.asarray(ss1.x), np.asarray(ms1.x), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(grads2), np.asarray(grads1), rtol=1e-3
    )
    # particles really live across 8 devices
    assert len(ss1.x.sharding.device_set) == 8
