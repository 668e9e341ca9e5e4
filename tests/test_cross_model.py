"""Controller/inference generalization across every dynamics model:
the same MultiDisco + SVMPC machinery must drive cartpole and skid-steer
(models the reference ships but never exercises)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dust_tpu.controllers import MultiDisco
from dust_tpu.distributions import GMM, Uniform
from dust_tpu.inference import ExponentiatedUtility, SVMPC
from dust_tpu.models import CartPoleModel, SkidSteerRobot
from dust_tpu.spaces import Box


def test_disco_balances_cartpole():
    """MPPI keeps the (fixed) cartpole upright — exercises the bug-fixed
    model end to end (the reference's CartPole cannot run at all)."""
    model = CartPoleModel(dt=0.02)

    def inst(s, a=None, **_):
        return 10.0 * s[..., 2] ** 2 + 0.1 * s[..., 0] ** 2 + 0.1 * s[..., 3] ** 2

    ctrl = MultiDisco(
        observation_space=Box(dim=4),
        action_space=Box(dim=1, low=-1.0, high=1.0),
        hz_len=20, n_policies=1, action_samples=128,
        a_cov=0.25 * jnp.eye(1),
        inst_cost_fn=inst, term_cost_fn=inst,
        params_sampling="none",
    )

    @jax.jit
    def mpc(dstate, obs, key):
        dstate, *_ = ctrl.forward(dstate, obs, model, key=key)
        dstate, act = ctrl.step(dstate, strategy="average")
        return dstate, act[0]

    dstate = ctrl.init_state()
    obs = jnp.array([[0.0, 0.0, 0.15, 0.0]])  # tilted pole
    key = jax.random.key(0)
    for t in range(60):
        key, k = jax.random.split(key)
        dstate, act = mpc(dstate, obs, k)
        obs = model.step(obs, act[None])
    theta = float(obs[0, 2])
    assert abs(theta) < 0.1, f"pole fell: theta={theta}"
    assert np.isfinite(np.asarray(obs)).all()


def test_disco_drives_skid_steer_to_waypoint():
    """Sampled-params MPPI steers the skid-steer robot toward a waypoint
    under uncertain ICR offset."""
    model = SkidSteerRobot(delta_t=0.1, uncertain_params=("x_icr",))
    target = jnp.array([1.0, 0.5])

    def inst(s, a=None, **_):
        return jnp.sum((s[..., :2] - target) ** 2, axis=-1)

    ctrl = MultiDisco(
        observation_space=Box(dim=5),
        action_space=Box(dim=2, low=-0.5, high=0.5),
        hz_len=15, n_policies=1, action_samples=64, params_samples=4,
        a_cov=0.04 * jnp.eye(2),
        inst_cost_fn=inst, term_cost_fn=inst,
        params_sampling=True,
    )
    icr_dist = Uniform(jnp.array([0.1]), jnp.array([0.3]), event_ndims=1)

    @jax.jit
    def mpc(dstate, obs, key):
        dstate, *_ = ctrl.forward(dstate, obs, model, icr_dist, key)
        dstate, act = ctrl.step(dstate, strategy="average")
        return dstate, act[0]

    dstate = ctrl.init_state()
    obs = jnp.zeros((1, 5))
    key = jax.random.key(1)
    d0 = float(jnp.linalg.norm(obs[0, :2] - target))
    for t in range(200):
        key, k = jax.random.split(key)
        dstate, act = mpc(dstate, obs, k)
        obs = model.step(obs, act[None], {"x_icr": jnp.full((1, 1), 0.2)})
    d1 = float(jnp.linalg.norm(obs[0, :2] - target))
    # top speed ~0.02 m/step: 200 steps bounds reachable progress
    assert d1 < 0.5 * d0, f"no progress toward waypoint: {d0} -> {d1}"


def test_svmpc_on_cartpole():
    """The Stein-MPC layer composes with a non-demo model out of the box."""
    model = CartPoleModel(dt=0.02)

    def inst(s, a=None, **_):
        return 10.0 * s[..., 2] ** 2 + 0.1 * s[..., 3] ** 2

    m, horizon = 2, 12
    ctrl = MultiDisco(
        observation_space=Box(dim=4),
        action_space=Box(dim=1, low=-1.0, high=1.0),
        hz_len=horizon, n_policies=m, action_samples=32,
        a_cov=0.25 * jnp.eye(1),
        inst_cost_fn=inst, term_cost_fn=inst,
        params_sampling="none",
    )
    lik = ExponentiatedUtility(alpha=1.0, n_samples=32, controller=ctrl,
                               model=model)
    svmpc = SVMPC(likelihood=lik, n_particles=m, optimizer=optax.sgd(0.5))
    theta0 = jnp.zeros((m, horizon, 1))
    prior = GMM.from_cov(theta0, jnp.ones(m), 0.25 * jnp.eye(1))
    sv = svmpc.init_state(theta0, prior)
    ds = ctrl.init_state()
    obs = jnp.array([[0.0, 0.0, 0.1, 0.0]])

    sv, ds, costs = svmpc.optimize(sv, ds, obs, None, jax.random.key(2))
    sv, a_seq, w = svmpc.forward(sv, costs)
    assert np.isfinite(np.asarray(a_seq)).all()
    assert np.isfinite(np.asarray(costs)).all()
