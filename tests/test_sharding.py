"""Sharded scenario sweeps on the virtual 8-device CPU mesh: sharded and
unsharded runs agree exactly on fixed keys (SURVEY.md §7.5 distributed
strategy)."""

import jax
import jax.numpy as jnp
import numpy as np

from dust_tpu.experiments import build_pendulum_stack, load_config
from dust_tpu.parallel import ScenarioSweep, make_mesh
from dust_tpu.parallel.sweep import broadcast_scenarios
from dust_tpu.simulation import PendulumSimulation

PEND_CFG = "demo/pendulum_config.yaml"


def _sweep_inputs(stack, n, steps):
    keys = jax.random.split(jax.random.key(7), n)
    true_params = {
        "length": jnp.linspace(0.7, 1.2, n),
        "mass": jnp.linspace(0.7, 1.2, n)[::-1],
    }
    init_obs = jnp.broadcast_to(stack.init_state.reshape(1, 1, -1),
                                (n, 1, 2))
    dstate = broadcast_scenarios(
        stack.controller.init_state(stack.init_policies), n
    )
    svstate = broadcast_scenarios(
        stack.svmpc.init_state(stack.init_policies, stack.policies_prior), n
    )
    mstate = broadcast_scenarios(
        stack.mpf.init_state(stack.mpf_init, stack.init_state, 1), n
    )
    return keys, true_params, init_obs, dstate, svstate, mstate


def test_sharded_sweep_matches_unsharded():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    cfg = load_config(PEND_CFG)
    cfg["exp_params"].update(
        horizon=8, action_samples=8, params_samples=2,
        mpf_n_particles=8, mpf_steps=2, n_particles=2,
    )
    stack = build_pendulum_stack(cfg, jax.random.key(0), case="dust")
    harness = PendulumSimulation(
        controller=stack.controller, svmpc=stack.svmpc, mpf=stack.mpf,
        model=stack.model, steps=6, warm_up=1,
        mpf_bw=stack.mpf_bw, mpf_steps=2,
    )

    n = 16
    inputs = _sweep_inputs(stack, n, steps=6)

    mesh = make_mesh(axis_names=("scenario",))
    sharded = ScenarioSweep(harness, stack.dynamics_prior, mesh=mesh)
    out_sharded = sharded.run(*inputs)

    unsharded = ScenarioSweep(harness, stack.dynamics_prior, mesh=None)
    out_plain = unsharded.run(*inputs)

    assert out_sharded["costs"].shape == (n, 6)
    assert bool(out_sharded["healthy"].all())
    np.testing.assert_allclose(
        np.asarray(out_sharded["costs"]), np.asarray(out_plain["costs"]),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_sharded["avg_cum_cost"]),
        np.asarray(out_plain["avg_cum_cost"]),
        rtol=1e-5,
    )
    # the scenario axis is actually distributed
    assert len(out_sharded["costs"].sharding.device_set) == 8


def test_scenarios_differ_by_true_params():
    """Different true parameters must produce different trajectories —
    the sweep really varies the simulator per lane."""
    cfg = load_config(PEND_CFG)
    cfg["exp_params"].update(
        horizon=8, action_samples=8, params_samples=2,
        mpf_n_particles=8, mpf_steps=2, n_particles=2,
    )
    stack = build_pendulum_stack(cfg, jax.random.key(0), case="dust")
    harness = PendulumSimulation(
        controller=stack.controller, svmpc=stack.svmpc, mpf=stack.mpf,
        model=stack.model, steps=6, warm_up=1,
        mpf_bw=stack.mpf_bw, mpf_steps=2,
    )
    n = 4
    keys = jnp.broadcast_to(jax.random.key(3), (n,))
    true_params = {
        "length": jnp.array([0.7, 0.9, 1.1, 1.3]),
        "mass": jnp.full((n,), 1.0),
    }
    init_obs = jnp.broadcast_to(stack.init_state.reshape(1, 1, -1), (n, 1, 2))
    dstate = broadcast_scenarios(
        stack.controller.init_state(stack.init_policies), n
    )
    svstate = broadcast_scenarios(
        stack.svmpc.init_state(stack.init_policies, stack.policies_prior), n
    )
    mstate = broadcast_scenarios(
        stack.mpf.init_state(stack.mpf_init, stack.init_state, 1), n
    )
    out = ScenarioSweep(harness, stack.dynamics_prior).run(
        keys, true_params, init_obs, dstate, svstate, mstate
    )
    states = np.asarray(out["states"])
    # same key, different lengths -> trajectories diverge
    assert not np.allclose(states[0], states[3])


def test_sharded_megakernel_group_sweep_matches_unsharded():
    """The sweep-megakernel group axis (the bench.py headline path)
    shards over the mesh with zero cross-device math: sharded ==
    unsharded exactly. Interpret mode zero-stubs the hardware PRNG, so
    per-group host noise is threaded as mapped args."""
    from dust_tpu.parallel.sweep import MegakernelGroupSweep
    from dust_tpu.simulation import megakernel_pendulum_sweep_fn

    assert len(jax.devices()) == 8
    cfg = load_config(PEND_CFG)
    exp = cfg["exp_params"]
    stack = build_pendulum_stack(cfg, jax.random.key(0), case="dust")
    n_sc, steps, groups = 2, 1, 8
    hz, m = exp["horizon"], exp["n_particles"]
    smp = -(-n_sc * m // 8) * 8
    base = megakernel_pendulum_sweep_fn(
        stack, exp, steps=steps, n_sc=n_sc, unroll=False,
        interpret=True,
    )
    lens = jnp.linspace(0.8, 1.2, n_sc)
    mass = jnp.linspace(0.9, 1.1, n_sc)

    def sweep_fn(seed, eps, pdz, pdu):
        out = base(seed, lens, mass, host_eps=eps, host_pdz=pdz,
                   host_pdu=pdu)
        return {"cost": out["cost"], "theta": out["theta"],
                "mpf_x": out["mpf_x"]}

    key = jax.random.key(11)
    k1, k2, k3 = jax.random.split(key, 3)
    seeds = jnp.zeros((groups, 2), jnp.int32)
    eps = jax.random.normal(k1, (groups, steps, hz, smp, 128))
    pdz = jax.random.normal(k2, (groups, steps, n_sc, 8, 128))
    pdu = jax.random.uniform(k3, (groups, steps, n_sc, 8, 128))

    plain = MegakernelGroupSweep(sweep_fn, mesh=None)
    sharded = MegakernelGroupSweep(sweep_fn, mesh=make_mesh(8))
    out_a = plain.run(seeds, eps, pdz, pdu)
    out_b = sharded.run(seeds, eps, pdz, pdu)
    for k in out_a:
        # ulp-level: the unsharded program vmaps 8 groups wide while
        # each device compiles a width-1 program — XLA fuses the
        # interpret-mode kernel body slightly differently per width
        np.testing.assert_allclose(np.asarray(out_a[k]),
                                   np.asarray(out_b[k]),
                                   rtol=1e-6, atol=1e-6, err_msg=k)
    # groups carry different noise -> different episodes
    assert not np.allclose(np.asarray(out_a["cost"][0]),
                           np.asarray(out_a["cost"][1]))
