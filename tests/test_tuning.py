"""Tuning harness: random search semantics and the vmapped parallel-lr
sweep."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dust_tpu.experiments import build_pendulum_stack, load_config
from dust_tpu.simulation import PendulumSimulation
from dust_tpu.tuning import (
    parallel_lr_sweep,
    pendulum_asha_objective,
    random_search,
    sample_space,
    successive_halving,
)


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


def test_successive_halving_promotes_and_converges():
    """On a known analytic objective (budget-dependent noise shrinking
    toward |x - 0.3|), SH promotes the right region, spends the
    advertised budget schedule, and the episode-equivalents accounting
    is exact."""
    evals = []

    def batch_objective(trials, budget):
        evals.append((budget, len(trials)))
        # deterministic 'noise' that decays with budget: low-budget
        # rungs are a biased view of the true objective, as in real
        # short-episode evaluations
        return np.array([
            abs(t["x"] - 0.3) + np.cos(97.0 * t["x"]) / budget
            for t in trials
        ])

    best, value, history, episode_eq = successive_halving(
        batch_objective, {"x": (0.0, 1.0)}, 27, eta=3,
        min_budget=4, max_budget=100, seed=0,
    )
    # rung schedule 4, 12, 36, 100 with 27 -> 9 -> 3 -> 1 survivors
    assert [b for b, _ in evals] == [4, 12, 36, 100]
    assert [n for _, n in evals] == [27, 9, 3, 1]
    assert episode_eq == (4 * 27 + 12 * 9 + 36 * 3 + 100 * 1) / 100
    assert abs(best["x"] - 0.3) < 0.25
    assert value == abs(best["x"] - 0.3) + np.cos(97.0 * best["x"]) / 100
    # non-finite scores are eliminated, never promoted
    def nan_objective(trials, budget):
        return np.array([
            np.nan if t["x"] > 0.5 else t["x"] for t in trials
        ])

    best2, value2, hist2, _ = successive_halving(
        nan_objective, {"x": (0.0, 1.0)}, 9, eta=3,
        min_budget=2, max_budget=8, seed=1,
    )
    assert best2["x"] <= 0.5 and np.isfinite(value2)


def test_pendulum_asha_objective_batches_groups():
    """The pendulum batch objective scores every trial finitely, groups
    compile-static params, and agrees with the single-lane parallel-lr
    path at a matched config."""
    cfg = load_config("demo/pendulum_config.yaml")
    cfg["exp_params"].update(horizon=8, action_samples=8, n_particles=2)
    true_params = {"length": 1.0, "mass": 1.0}
    objective = pendulum_asha_objective(cfg, true_params, seed=0)
    base_alpha = cfg["exp_params"]["alpha"]
    base_sigma = cfg["exp_params"]["prior_sigma"]
    trials = [
        {"learning_rate": 0.5, "alpha": base_alpha, "horizon": 8,
         "prior_sigma": base_sigma},
        {"learning_rate": 2.0, "alpha": base_alpha, "horizon": 8,
         "prior_sigma": base_sigma},
        {"learning_rate": 2.0, "alpha": 2.0 * base_alpha, "horizon": 8,
         "prior_sigma": 2.0},
    ]
    scores = objective(trials, budget=6)
    assert scores.shape == (3,)
    assert np.isfinite(scores).all()
    assert len(np.unique(scores.round(4))) == 3

    # cross-check lane 0/1 against parallel_lr_sweep on the same stack
    stack = build_pendulum_stack(cfg, jax.random.key(0), case="svmpc")
    stack.svmpc.optimizer = optax.inject_hyperparams(optax.sgd)(
        learning_rate=1.0
    )
    harness = PendulumSimulation(
        controller=stack.controller, svmpc=stack.svmpc,
        model=stack.model, steps=6, warm_up=0,
    )
    ref = parallel_lr_sweep(
        harness, stack, jnp.array([0.5, 2.0]), jax.random.key(1),
        true_params,
    )
    np.testing.assert_allclose(scores[:2], np.asarray(ref), rtol=1e-5)


def test_asha_finds_config_matching_hand_tuned_quality():
    """End-to-end SH on the (tiny-shape) pendulum task: the returned
    config's full-budget episode cost must match or beat the demo's
    hand-tuned hyperparameters evaluated under the same protocol — the
    reference needs a 200-trial Optuna study for this
    (`demo/pendulum_tuning.py:179-180`); SH spends a few
    episode-equivalents of batched lanes."""
    cfg = load_config("demo/pendulum_config.yaml")
    cfg["exp_params"].update(action_samples=16, n_particles=2)
    true_params = {"length": 1.0, "mass": 1.0}
    objective = pendulum_asha_objective(cfg, true_params, seed=3)
    space = {
        "learning_rate": (0.1, 10.0, "log"),
        "prior_sigma": (0.5, 5.0),
    }
    best, value, history, episode_eq = successive_halving(
        objective, space, 16, eta=4, min_budget=5, max_budget=40,
        seed=3,
    )
    assert best is not None and np.isfinite(value)
    assert episode_eq < 20  # 16 configs in under 20 episode-equivalents

    # hand-tuned demo config under the identical evaluation protocol
    baseline = objective([{
        "learning_rate": cfg["exp_params"]["learning_rate"],
        "prior_sigma": cfg["exp_params"]["prior_sigma"],
    }], budget=40)[0]
    assert value <= baseline * 1.05, (value, baseline)


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


def test_particle_sweep_score_ordering():
    """Any success beats any non-crash failure beats any crash;
    earlier success beats later; closer failure beats farther."""
    from dust_tpu.tuning import particle_sweep_score

    steps, target = 10, np.array([9.0, 9.0, 0.0, 0.0])

    def sweep_out(done_at, crash, final):
        n_sc = len(done_at)
        done = np.zeros((steps, n_sc))
        crashed = np.zeros((steps, n_sc))
        for s, (t, c) in enumerate(zip(done_at, crash)):
            if t is not None:
                done[t:, s] = 1.0
                if c:
                    crashed[t:, s] = 1.0
        out = {"done": done, "crashed": crashed}
        for i, k in enumerate(("px", "py", "vx", "vy")):
            out[k] = np.zeros((steps, n_sc))
            out[k][-1] = [f[i] for f in final]
        return out

    at_goal = (9.0, 9.0, 0.0, 0.0)
    far = (-9.0, -9.0, 0.0, 0.0)
    near = (8.0, 9.0, 0.0, 0.0)
    out = sweep_out(
        done_at=[2, 7, None, None, 3],
        crash=[False, False, False, False, True],
        final=[at_goal, at_goal, near, far, far],
    )
    score, n_succ, n_crash, succ = particle_sweep_score(
        out, target, steps)
    assert n_succ == 2 and n_crash == 1
    assert list(succ) == [True, True, False, False, False]
    per = []
    for s in range(5):
        one = {k: v[:, s:s + 1] for k, v in out.items()}
        p, *_ = particle_sweep_score(one, target, steps)
        per.append(p)
    # early success < late success < near failure < far failure < crash
    assert per[0] < per[1] < per[2] < per[3] < per[4]
    assert abs(score - np.mean(per)) < 1e-12


def test_particle_sweep_asha_objective_smoke():
    """One tiny interpret-mode trial through the megakernel objective:
    finite score, failure isolation (a bad static shape scores inf)."""
    from dust_tpu.experiments import load_config as load_cfg
    from dust_tpu.tuning import particle_sweep_asha_objective

    config = load_cfg("/root/repo/demo/particle_config.yaml")
    objective = particle_sweep_asha_objective(
        config, jnp.linspace(1.5, 3.0, 2), seed=0, interpret=True)
    trials = [
        {"learning_rate": 50.0, "alpha": 2.0, "w_qvel_T": 100.0},
        {"shape": (6, 70)},  # m*hz*2 > 512: kernel rejects -> inf
    ]
    scores = objective(trials, budget=2)
    assert np.isfinite(scores[0]) and 0.0 < scores[0] < 5.1
    assert scores[1] == np.inf


def test_tuned_particle_config_values():
    """The shipped tuned config reaches the model/stack builders with
    the refine-search winner's values (2026-08-20, seeds 7/21, 8/8
    strict success at 600 steps on held-out seeds — BASELINE.md)."""
    from dust_tpu.experiments import build_particle_stack, load_config

    cfg = load_config("/root/repo/demo/particle_config_tuned.yaml")
    exp = cfg["exp_params"]
    assert abs(exp["learning_rate"] - 292.229416) < 1e-4
    assert abs(exp["alpha"] - 0.307686) < 1e-5
    assert cfg["sim_params"]["steps"] == 600
    stack = build_particle_stack(cfg, jax.random.key(0))
    # terminal weights layout: [qpos_T, qpos_T, qvel_T, qvel_T]
    assert float(stack.model.w_term[2]) == 800.0
    assert stack.use_svmpc and stack.mpf is not None


def test_tuned_pendulum_config_values():
    """The shipped r4 tail-tuned config reaches the stack builder with
    the --tail ASHA winner's values (2026-08-20; 20-seed
    characterization in BASELINE.md "r4 pendulum tail verdict")."""
    from dust_tpu.experiments import build_pendulum_stack, load_config

    cfg = load_config("/root/repo/demo/pendulum_config_tuned.yaml")
    exp = cfg["exp_params"]
    assert abs(exp["learning_rate"] - 1.1857) < 1e-6
    assert abs(exp["alpha"] - 1.3677) < 1e-6
    assert abs(exp["ctrl_sigma"] - 1.2633) < 1e-6
    assert abs(exp["prior_sigma"] - 2.1853) < 1e-6
    stack = build_pendulum_stack(cfg, jax.random.key(0), case="dust")
    assert stack.svmpc is not None and stack.mpf is not None


def test_pendulum_tail_objective_scores_and_ranks():
    """pendulum_sweep_tail_objective runs a tiny interpret-mode budget
    and returns finite scores; an unsolvable budget scores the
    10+min-cost failure branch (any swing-up beats any failure)."""
    import jax.numpy as jnp

    from dust_tpu.experiments import load_config
    from dust_tpu.tuning import pendulum_sweep_tail_objective

    cfg = load_config("/root/repo/demo/pendulum_config.yaml")
    obj = pendulum_sweep_tail_objective(
        cfg, jnp.linspace(0.7, 1.25, 8), jnp.linspace(1.25, 0.7, 8),
        seed=0, n_seeds=1)
    scores = obj([{}, dict(learning_rate=1.2, alpha=1.4)], 4)
    assert np.all(np.isfinite(scores))
    # 4 steps cannot swing up: both trials take the failure branch
    assert np.all(scores > 10.0)
