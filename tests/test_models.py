"""Dynamics models vs the torch reference (`dust/models/*`), including
sampled-parameter broadcasting and the particle model's occupancy grid."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from dust_tpu.models import CartPoleModel, PendulumModel, Particle, SkidSteerRobot
from dust_tpu.models.obstacle_map import generate_obstacle_map, get_obst_preset

PARTICLE_ENV = dict(
    dt=0.015,
    control_type="acceleration",
    noise_std=[0.1, 0.1],
    init_state=[-9.0, -9.0, 0, 0],
    target_state=[9.0, 9.0, 0, 0],
    can_crash=True,
    with_obstacle=True,
    deterministic=True,
    cost_params={
        "w_qpos": 0.5,
        "w_qvel": 0.25,
        "w_ctrl": 0.2,
        "w_obs": 1.0e6,
        "w_qpos_T": 1.0e3,
        "w_qvel_T": 0.1,
    },
    obst_preset="grid_4x4",
    obst_width=2.1,
    max_speed=5,
    max_accel=10,
    map_cell_size=0.1,
    map_size=[22, 22],
    map_type="direct",
)


def _ref_particle_env():
    env = dict(PARTICLE_ENV)
    env["noise_std"] = torch.tensor(env["noise_std"])
    return env


def test_pendulum_step_matches_reference(reference, rng):
    ref_mod = reference("dust.models.pendulum")
    ours = PendulumModel(uncertain_params=("length", "mass"))
    theirs = ref_mod.PendulumModel(uncertain_params=("length", "mass"))

    states = rng.normal(size=(16, 2)).astype(np.float32) * 3
    actions = rng.normal(size=(16, 1)).astype(np.float32) * 3

    # default params
    out = ours.step(jnp.asarray(states), jnp.asarray(actions))
    ref = theirs.step(torch.tensor(states), torch.tensor(actions))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-5)

    # sampled params (length, mass) as [n, 1] columns
    params = rng.uniform(0.6, 1.3, size=(16, 2)).astype(np.float32)
    out = ours.step(
        jnp.asarray(states), jnp.asarray(actions), ours.params_to_dict(params)
    )
    ref = theirs.step(
        torch.tensor(states),
        torch.tensor(actions),
        theirs.params_to_dict(torch.tensor(params)),
    )
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-5)


def test_pendulum_gym_v0_clamp_order():
    """PARITY #20: gym Pendulum-v0 (the reference's actual simulator,
    `dust/utils/simulations.py:49-53`) advances theta with the
    UNCLIPPED new speed and clamps afterwards; the reference's own
    model clamps first. Pin `gym_v0_compat=True` against a numpy
    transcription of the published gym v0 step (gym 0.18
    pendulum.py:30-37, the release the RSS 2021 experiments used), at
    interior states AND a boundary state where the orders diverge."""
    g, m, length, dt = 10.0, 1.0, 1.0, 0.05
    max_speed, max_torque = 8.0, 2.0

    def gym_v0_step(th, thdot, u):
        u = np.clip(u, -max_torque, max_torque)
        newthdot = thdot + (
            -3.0 * g / (2.0 * length) * np.sin(th + np.pi)
            + 3.0 / (m * length ** 2) * u
        ) * dt
        newth = th + newthdot * dt
        newthdot = np.clip(newthdot, -max_speed, max_speed)
        return newth, newthdot

    gym_model = PendulumModel(g=10.0, dt=dt, gym_v0_compat=True)
    default_model = PendulumModel(g=10.0, dt=dt)

    # interior + speed-boundary states (at theta=+pi/2 gravity torque
    # -3g/2*sin(th+pi) = +15 aids the +2 action: thdot 7.9 -> 8.95,
    # past the +8 clamp within one step)
    states = np.array([[0.3, 1.0], [np.pi - 0.1, -2.0],
                       [np.pi / 2, 7.9], [0.05, -7.95]],
                      dtype=np.float32)
    actions = np.array([[0.5], [3.0], [2.0], [-2.0]], dtype=np.float32)
    out = np.asarray(gym_model.step(jnp.asarray(states),
                                    jnp.asarray(actions)))
    exp_th, exp_thd = gym_v0_step(states[:, 0], states[:, 1],
                                  actions[:, 0])
    np.testing.assert_allclose(out[:, 0], exp_th, atol=1e-6)
    np.testing.assert_allclose(out[:, 1], exp_thd, atol=1e-6)

    # the clamp orders agree away from the boundary...
    out_d = np.asarray(default_model.step(jnp.asarray(states[:2]),
                                          jnp.asarray(actions[:2])))
    np.testing.assert_allclose(out_d[:, 0], exp_th[:2], atol=1e-6)
    # ...and genuinely differ at it (theta sees the clipped vs
    # unclipped speed)
    out_b = np.asarray(default_model.step(jnp.asarray(states[2:3]),
                                          jnp.asarray(actions[2:3])))
    assert abs(float(out_b[0, 0]) - exp_th[2]) > 1e-5


def test_pendulum_get_obs():
    state = jnp.array([[0.5, -1.0]])
    obs = PendulumModel.get_obs(state)
    np.testing.assert_allclose(
        np.asarray(obs), [[np.cos(0.5), np.sin(0.5), -1.0]], atol=1e-6
    )


def test_obstacle_map_matches_reference(reference):
    ref_map_mod = reference("dust.utils.obstacle_map")
    obst_params = get_obst_preset("grid_4x4", 2.1)
    ref_params = ref_map_mod.get_obst_preset("grid_4x4", 2.1)
    assert [list(map(float, p)) for p in obst_params] == [
        list(map(float, p)) for p in ref_params
    ]

    ours = generate_obstacle_map([22, 22], obst_params, 0.1, map_type="direct")
    theirs = ref_map_mod.generate_obstacle_map(
        [22, 22], ref_params, 0.1, map_type="direct"
    )
    np.testing.assert_array_equal(ours.map, theirs.map)

    # batched collision gather parity
    pts = np.random.default_rng(3).uniform(-11, 11, size=(64, 2)).astype(np.float32)
    ref_vals = theirs.get_collisions(torch.tensor(pts))
    our_vals = ours.get_collisions(jnp.asarray(pts))
    np.testing.assert_allclose(np.asarray(our_vals), ref_vals.numpy())


@pytest.mark.parametrize("preset", ["grid_4x4", "staggered_3-2-3",
                                    "single_centred"])
def test_collision_rects_match_gather(preset):
    """The gather-free rectangle-membership path of `get_collisions` is
    bit-identical to the raster gather at every cell center, at random
    world points, and outside the map (clamp path)."""
    from dust_tpu.models.obstacle_map import decompose_rects

    m = generate_obstacle_map(
        [22, 22], get_obst_preset(preset, 2.1), 0.1, map_type="direct"
    )
    # the decomposition reconstructs the raster exactly
    recon = np.zeros_like(m.map)
    for x0, x1, y0, y1 in decompose_rects(m.map):
        assert not recon[x0:x1, y0:y1].any()  # disjoint
        recon[x0:x1, y0:y1] = 1.0
    np.testing.assert_array_equal(recon, m.map)

    ij = np.stack(np.meshgrid(np.arange(m.x_dim), np.arange(m.y_dim),
                              indexing="ij"), axis=-1)
    centers = jnp.asarray(
        (ij + 0.5 - m.c_offset) * m.cell_size, jnp.float32
    ).reshape(-1, 2)
    pts = np.random.default_rng(7).uniform(-14, 14, size=(512, 2))
    for x in (centers, jnp.asarray(pts, jnp.float32)):
        np.testing.assert_array_equal(
            np.asarray(m.get_collisions(x)),
            np.asarray(m.get_collisions(x, use_gather=True)),
        )


@pytest.mark.parametrize("preset", ["grid_4x4", "staggered_3-2-3",
                                    "single_centred"])
def test_occupancy_hit_bounds_exhaustive(preset):
    """The kernels' `occupancy_hit` with clamp `bounds` (which drops
    statically-true comparisons, e.g. on border-wall rects) must equal
    both the raster and the unbounded test at EVERY cell index of the
    clamped domain."""
    from dust_tpu.models.obstacle_map import decompose_rects
    from dust_tpu.ops.pallas_particle_rollout import occupancy_hit

    m = generate_obstacle_map(
        [22, 22], get_obst_preset(preset, 2.1), 0.1, map_type="direct"
    )
    rects = tuple(
        (float(a), float(b), float(c), float(d))
        for a, b, c, d in decompose_rects(m.map)
    )
    ximax, yimax = float(m.x_dim - 1), float(m.y_dim - 1)
    xi, yi = np.meshgrid(np.arange(m.x_dim, dtype=np.float32),
                         np.arange(m.y_dim, dtype=np.float32),
                         indexing="ij")
    xi, yi = jnp.asarray(xi), jnp.asarray(yi)
    hit_b = np.asarray(occupancy_hit(xi, yi, rects, (ximax, yimax)))
    hit_u = np.asarray(occupancy_hit(xi, yi, rects))
    np.testing.assert_array_equal(hit_b, np.asarray(m.map) > 0)
    np.testing.assert_array_equal(hit_b, hit_u)


def test_particle_step_and_costs_match_reference(reference, rng):
    ref_mod = reference("dust.models.particle")
    ours = Particle(uncertain_params=["mass"], mass=2.0, **PARTICLE_ENV)
    theirs = ref_mod.Particle(
        uncertain_params=["mass"], mass=torch.tensor(2.0), **_ref_particle_env()
    )

    states = rng.uniform(-10, 10, size=(32, 4)).astype(np.float32)
    states[:, 2:] = rng.uniform(-5, 5, size=(32, 2))
    actions = rng.uniform(-12, 12, size=(32, 2)).astype(np.float32)

    out = ours.step(jnp.asarray(states), jnp.asarray(actions))
    ref = theirs.step(torch.tensor(states), torch.tensor(actions))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-5)

    # sampled mass per trajectory
    mass = rng.uniform(1.5, 3.0, size=(32, 1)).astype(np.float32)
    out = ours.step(jnp.asarray(states), jnp.asarray(actions), {"mass": mass})
    ref = theirs.step(
        torch.tensor(states), torch.tensor(actions), {"mass": torch.tensor(mass)}
    )
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-5)

    # cost functions
    inst = ours.default_inst_cost(jnp.asarray(states), jnp.asarray(actions))
    inst_ref = theirs.default_inst_cost(torch.tensor(states), torch.tensor(actions))
    np.testing.assert_allclose(np.asarray(inst), inst_ref.numpy(), rtol=1e-5)

    term = ours.default_term_cost(jnp.asarray(states))
    term_ref = theirs.default_term_cost(torch.tensor(states))
    np.testing.assert_allclose(np.asarray(term), term_ref.numpy(), rtol=1e-5)


def test_particle_noise_is_reproducible():
    env = dict(PARTICLE_ENV, deterministic=False)
    model = Particle(uncertain_params=["mass"], **env)
    s = jnp.zeros((4, 4))
    a = jnp.ones((4, 2))
    k = jax.random.key(0)
    out1 = model.step(s, a, key=k)
    out2 = model.step(s, a, key=k)
    out3 = model.step(s, a, key=jax.random.key(1))
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert not np.allclose(np.asarray(out1), np.asarray(out3))


def test_skid_steer_matches_reference(reference, rng):
    ref_mod = reference("dust.models.skid_steer_robot")
    ours = SkidSteerRobot(delta_t=0.05, uncertain_params=("x_icr",))
    theirs = ref_mod.SkidSteerRobot(delta_t=0.05, uncertain_params=("x_icr",))

    states = rng.normal(size=(8, 5)).astype(np.float32)
    actions = rng.uniform(-1, 1, size=(8, 2)).astype(np.float32)
    out = ours.step(jnp.asarray(states), jnp.asarray(actions), None)
    ref = theirs.step(torch.tensor(states), torch.tensor(actions), None)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-5)


def test_cartpole_step_is_finite_and_param_path_works(rng):
    """The reference CartPole step is unusable (AttributeError +
    total-mass bug, `dust/models/cartpole.py:151-161`); ours must run and
    behave physically: an unperturbed upright pole stays upright."""
    model = CartPoleModel(uncertain_params=("mass_pole",))
    states = rng.normal(size=(8, 4)).astype(np.float32) * 0.1
    actions = rng.uniform(-1, 1, size=(8, 1)).astype(np.float32)
    out = model.step(jnp.asarray(states), jnp.asarray(actions))
    assert np.all(np.isfinite(np.asarray(out)))

    # sampled-params path (broken in the reference) works here
    mp = rng.uniform(0.05, 0.2, size=(8, 1)).astype(np.float32)
    out_p = model.step(jnp.asarray(states), jnp.asarray(actions), {"mass_pole": mp})
    assert np.all(np.isfinite(np.asarray(out_p)))

    # equilibrium: zero state, zero action -> stays at zero
    zero = model.step(jnp.zeros((1, 4)), jnp.zeros((1, 1)))
    np.testing.assert_allclose(np.asarray(zero), np.zeros((1, 4)), atol=1e-7)
