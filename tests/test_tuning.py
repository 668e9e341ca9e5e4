"""Tuning harness: random search semantics and the vmapped parallel-lr
sweep."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dust_tpu.experiments import build_pendulum_stack, load_config
from dust_tpu.simulation import PendulumSimulation
from dust_tpu.tuning import parallel_lr_sweep, random_search, sample_space


def test_sample_space_types():
    rng = np.random.default_rng(0)
    space = {
        "lr": (0.1, 10.0, "log"),
        "sigma": (0.5, 5.0),
        "horizon": [20, 30, 40],
        "n": (2, 8),
    }
    for _ in range(20):
        t = sample_space(rng, space)
        assert 0.1 <= t["lr"] <= 10.0
        assert 0.5 <= t["sigma"] <= 5.0
        assert t["horizon"] in (20, 30, 40)
        assert isinstance(t["n"], int) and 2 <= t["n"] <= 8


def test_random_search_handles_failures():
    calls = []

    def objective(trial):
        calls.append(trial)
        if trial["x"] > 0.5:
            raise RuntimeError("diverged")
        return trial["x"]

    best, value, history = random_search(
        objective, {"x": (0.0, 1.0)}, 10, seed=1
    )
    assert len(history) == 10
    assert value == best["x"] <= 0.5
    assert any(v == float("inf") for _, v in history)


def test_parallel_lr_sweep_orders_sanely():
    """Tiny sweep: lanes produce finite distinct costs and match a
    single-lane run at the same lr."""
    cfg = load_config("demo/pendulum_config.yaml")
    cfg["exp_params"].update(horizon=8, action_samples=8, n_particles=2)
    stack = build_pendulum_stack(cfg, jax.random.key(0), case="svmpc")
    stack.svmpc.optimizer = optax.inject_hyperparams(optax.sgd)(
        learning_rate=1.0
    )
    harness = PendulumSimulation(
        controller=stack.controller, svmpc=stack.svmpc,
        model=stack.model, steps=6, warm_up=0,
    )
    lrs = jnp.array([0.5, 2.0, 8.0])
    costs = parallel_lr_sweep(
        harness, stack, lrs, jax.random.key(1),
        {"length": 1.0, "mass": 1.0},
    )
    arr = np.asarray(costs)
    assert arr.shape == (3,)
    assert np.isfinite(arr).all()
    assert len(np.unique(arr.round(4))) == 3  # lanes actually differ

    # single-lane reproducibility at lrs[1]
    single = parallel_lr_sweep(
        harness, stack, lrs[1:2], jax.random.key(1),
        {"length": 1.0, "mass": 1.0},
    )
    np.testing.assert_allclose(float(single[0]), arr[1], rtol=1e-5)


def test_parallel_lr_sweep_sharded_matches_unsharded():
    from dust_tpu.parallel import make_mesh

    cfg = load_config("demo/pendulum_config.yaml")
    cfg["exp_params"].update(horizon=8, action_samples=8, n_particles=2)
    stack = build_pendulum_stack(cfg, jax.random.key(0), case="svmpc")
    stack.svmpc.optimizer = optax.inject_hyperparams(optax.sgd)(
        learning_rate=1.0
    )
    harness = PendulumSimulation(
        controller=stack.controller, svmpc=stack.svmpc,
        model=stack.model, steps=6, warm_up=0,
    )
    lrs = jnp.logspace(-1, 1, 8)
    plain = parallel_lr_sweep(
        harness, stack, lrs, jax.random.key(1),
        {"length": 1.0, "mass": 1.0},
    )
    mesh = make_mesh(axis_names=("scenario",))
    sharded = parallel_lr_sweep(
        harness, stack, lrs, jax.random.key(1),
        {"length": 1.0, "mass": 1.0}, mesh=mesh,
    )
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(plain),
                               rtol=1e-5)
    assert len(sharded.sharding.device_set) == 8
