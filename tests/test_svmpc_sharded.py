"""Particle-sharded SVMPC == unsharded SVMPC on the 8-device mesh, with
identical injected noise and parameter draws."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from dust_tpu.controllers import MultiDisco
from dust_tpu.distributions import GMM
from dust_tpu.inference import ExponentiatedUtility, SVMPC
from dust_tpu.models import PendulumModel
from dust_tpu.parallel import make_mesh
from dust_tpu.parallel.svmpc_sharded import ShardedSVMPC
from dust_tpu.spaces import Box
from tests.test_disco import inst_cost_jnp, term_cost_jnp

M, HORIZON, N_SAMPLES = 8, 10, 16  # m divisible by the 8-device mesh


@struct.dataclass
class _FixedParams:
    """Deterministic params_dist (a pytree, so it can ride through
    shard_map): both paths draw identical parameters."""

    draws: jnp.ndarray

    def sample(self, key, shape):
        return self.draws

    def log_prob(self, x):
        return jnp.zeros(self.draws.shape[0])


def _build():
    model = PendulumModel(uncertain_params=("length", "mass"))
    ctrl = MultiDisco(
        observation_space=Box(dim=2),
        action_space=Box(dim=1, low=-2.0, high=2.0),
        hz_len=HORIZON, n_policies=M, action_samples=N_SAMPLES,
        params_samples=4,
        a_cov=4.0 * jnp.eye(1),
        inst_cost_fn=inst_cost_jnp, term_cost_fn=term_cost_jnp,
        params_sampling=True,
    )
    lik = ExponentiatedUtility(alpha=1.0, n_samples=N_SAMPLES,
                               controller=ctrl, model=model)
    svmpc = SVMPC(likelihood=lik, kernel="rbf", n_particles=M,
                  optimizer=optax.sgd(1.0), reference_compat=False)
    return model, ctrl, svmpc


def test_sharded_svmpc_matches_unsharded(rng):
    model, ctrl, svmpc = _build()
    mesh = make_mesh(axis_names=("particle",))
    sharded = ShardedSVMPC(svmpc, model, mesh)

    theta0 = jnp.asarray(rng.normal(size=(M, HORIZON, 1)) * 2, jnp.float32)
    prior = GMM.from_cov(theta0, jnp.ones(M), 4.0 * jnp.eye(1))
    noise = jnp.asarray(
        rng.normal(size=(N_SAMPLES, M, HORIZON, 1)), jnp.float32
    )
    params = _FixedParams(
        draws=jnp.asarray(rng.uniform(0.6, 1.3, size=(4, 2)), jnp.float32)
    )
    obs = jnp.array([[3.0, 0.0]])
    key = jax.random.key(0)
    bw = 0.9

    # unsharded oracle
    sv_u = svmpc.init_state(theta0, prior)
    ds_u = ctrl.init_state()
    sv_u, ds_u, costs_u = svmpc.svgd_step(sv_u, ds_u, obs, params, key, bw,
                                          noise=noise)

    # sharded
    sv_s = svmpc.init_state(theta0, prior)
    ds_s = ctrl.init_state()
    sv_s, ds_s = sharded.shard_states(sv_s, ds_s)
    sv_s, ds_s, costs_s = sharded.svgd_step(sv_s, ds_s, obs, params, key,
                                            bw, noise=noise)

    np.testing.assert_allclose(np.asarray(costs_s), np.asarray(costs_u),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(sv_s.theta),
                               np.asarray(sv_u.theta), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ds_s.a_mat),
                               np.asarray(ds_u.a_mat), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ds_s.a_mix),
                               np.asarray(ds_u.a_mix), rtol=1e-3, atol=1e-6)
    # particles really live across 8 devices
    assert len(sv_s.theta.sharding.device_set) == 8

    # forward on the sharded state produces the same selection
    sv_u2, a_seq_u, w_u = svmpc.forward(sv_u, costs_u)
    sv_s2, a_seq_s, w_s = sharded.forward(sv_s, costs_s)
    np.testing.assert_allclose(np.asarray(a_seq_s), np.asarray(a_seq_u),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(w_s), np.asarray(w_u),
                               rtol=1e-3, atol=1e-5)


def test_sharded_svmpc_keyed_noise_runs(rng):
    """Production path: per-device folded keys (no injected noise) runs
    and produces finite, moving particles."""
    model, ctrl, svmpc = _build()
    mesh = make_mesh(axis_names=("particle",))
    sharded = ShardedSVMPC(svmpc, model, mesh)

    theta0 = jnp.asarray(rng.normal(size=(M, HORIZON, 1)), jnp.float32)
    prior = GMM.from_cov(theta0, jnp.ones(M), 4.0 * jnp.eye(1))
    params = _FixedParams(
        draws=jnp.asarray(rng.uniform(0.6, 1.3, size=(4, 2)), jnp.float32)
    )
    sv, ds = sharded.shard_states(
        svmpc.init_state(theta0, prior), ctrl.init_state()
    )
    sv, ds, costs = sharded.svgd_step(
        sv, ds, jnp.array([[3.0, 0.0]]), params, jax.random.key(3), 0.9
    )
    assert np.isfinite(np.asarray(costs)).all()
    assert not np.allclose(np.asarray(sv.theta), np.asarray(theta0))


def test_sharded_svmpc_adam_optimizer(rng):
    """Scalar-leaf optimizer states (adam's count) shard correctly
    (regression: per-leaf in_specs, not blanket P('particle'))."""
    model = PendulumModel(uncertain_params=("length", "mass"))
    ctrl = MultiDisco(
        observation_space=Box(dim=2),
        action_space=Box(dim=1, low=-2.0, high=2.0),
        hz_len=HORIZON, n_policies=M, action_samples=N_SAMPLES,
        params_samples=4, a_cov=4.0 * jnp.eye(1),
        inst_cost_fn=inst_cost_jnp, term_cost_fn=term_cost_jnp,
        params_sampling=True,
    )
    lik = ExponentiatedUtility(alpha=1.0, n_samples=N_SAMPLES,
                               controller=ctrl, model=model)
    svmpc = SVMPC(likelihood=lik, kernel="rbf", n_particles=M,
                  optimizer=optax.adam(0.1), reference_compat=False)
    mesh = make_mesh(axis_names=("particle",))
    sharded = ShardedSVMPC(svmpc, model, mesh)
    theta0 = jnp.asarray(rng.normal(size=(M, HORIZON, 1)), jnp.float32)
    prior = GMM.from_cov(theta0, jnp.ones(M), 4.0 * jnp.eye(1))
    params = _FixedParams(
        draws=jnp.asarray(rng.uniform(0.6, 1.3, size=(4, 2)), jnp.float32)
    )
    sv, ds = sharded.shard_states(
        svmpc.init_state(theta0, prior), ctrl.init_state()
    )
    sv, ds, costs = sharded.svgd_step(
        sv, ds, jnp.array([[3.0, 0.0]]), params, jax.random.key(5), 0.9
    )
    assert np.isfinite(np.asarray(sv.theta)).all()


def test_sharded_svmpc_rejects_utf():
    import pytest as _pytest

    from dust_tpu.utils.utf import MerweScaledUTF

    model = PendulumModel(uncertain_params=("length", "mass"))
    ctrl = MultiDisco(
        observation_space=Box(dim=2),
        action_space=Box(dim=1, low=-2.0, high=2.0),
        hz_len=HORIZON, n_policies=1, action_samples=N_SAMPLES,
        a_cov=4.0 * jnp.eye(1),
        inst_cost_fn=inst_cost_jnp, term_cost_fn=term_cost_jnp,
        params_sampling=MerweScaledUTF(n=2, alpha=0.5),
    )
    lik = ExponentiatedUtility(alpha=1.0, n_samples=N_SAMPLES,
                               controller=ctrl, model=model)
    svmpc = SVMPC(likelihood=lik, kernel="rbf", n_particles=1,
                  optimizer=optax.sgd(1.0), reference_compat=False)
    with _pytest.raises(ValueError, match="UTF"):
        ShardedSVMPC(svmpc, model, make_mesh(axis_names=("particle",)))
