"""Hyperparameter tuning harness.

The reference tunes with sequential Optuna trials, one full episode per
trial (`demo/pendulum_tuning.py:30-43,179-180`,
`demo/particle_tuning.py:147-148`). Two TPU-native replacements:

* `random_search` — generic host-side random search over any config keys
  (including shape-changing ones like the horizon). Failed trials score
  +inf, mirroring the reference's RuntimeError guard
  (`demo/particle_tuning.py:93-105`). Trials that share array shapes
  reuse the jit cache only if the caller reuses the stack — the docstring
  of the objective explains the contract.
* `parallel_lr_sweep` — the genuinely parallel path: learning rates ride
  in the optimizer state (`optax.inject_hyperparams`), so K trials vmap
  into ONE device program and shard over the mesh with the scenario
  sweep. This is BASELINE.json config #5's "tuning-style evaluation"
  pattern: thousands of (hyperparam x seed) lanes per launch.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def sample_space(rng, space):
    """Draw one trial from `space`. Tuples are ranges — (low, high) for
    uniform, (low, high, 'log') for log-uniform, int bounds give int
    draws; lists are categorical choices."""
    trial = {}
    for name, spec in space.items():
        if isinstance(spec, tuple):
            low, high = spec[0], spec[1]
            if len(spec) == 3 and spec[2] == "log":
                value = math.exp(rng.uniform(math.log(low), math.log(high)))
            else:
                value = rng.uniform(low, high)
            if isinstance(low, int) and isinstance(high, int):
                value = int(round(value))
            trial[name] = value
        else:
            trial[name] = spec[int(rng.integers(len(spec)))]
    return trial


def random_search(objective, space, n_trials, seed=0, verbose=False):
    """Minimize `objective(trial: dict) -> float` over random draws.
    Exceptions / non-finite scores count as +inf (reference guard,
    `demo/particle_tuning.py:93-105`). Returns (best_params, best_value,
    history list of (params, value))."""
    rng = np.random.default_rng(seed)
    best_params, best_value = None, float("inf")
    history = []
    for i in range(n_trials):
        trial = sample_space(rng, space)
        try:
            value = float(objective(trial))
            if not math.isfinite(value):
                value = float("inf")
        except (FloatingPointError, RuntimeError, ValueError) as exc:
            if verbose:
                print(f"trial {i} failed: {exc}")
            value = float("inf")
        history.append((trial, value))
        if value < best_value:
            best_params, best_value = trial, value
        if verbose:
            print(f"trial {i}: {value:.4f} {trial} (best {best_value:.4f})")
    return best_params, best_value, history


def successive_halving(batch_objective, space, n_configs, eta=3,
                       min_budget=25, max_budget=200, seed=0,
                       verbose=False):
    """Batched successive halving (the ASHA rung schedule run
    rung-synchronously — the natural shape for a vmapped accelerator,
    where one rung is ONE wide device program rather than Optuna's
    sequential trials, `demo/pendulum_tuning.py:179-180` in the
    reference).

    Minimizes `batch_objective(trials: list[dict], budget: int) ->
    per-trial scores [len(trials)]` where `budget` is in episode steps.
    Rung k evaluates the survivors at budget `min_budget * eta^k`
    (clipped to `max_budget`) and keeps the best `1/eta` fraction.
    Non-finite scores count as +inf (the reference's failed-trial
    guard, `demo/particle_tuning.py:93-105`).

    Returns `(best_params, best_value, history, episode_equivalents)`
    where `history` is a list of `(budget, [(trial, score), ...])` per
    rung and `episode_equivalents` is the total steps evaluated divided
    by `max_budget` — directly comparable against the reference's
    200-full-episode Optuna study.
    """
    rng = np.random.default_rng(seed)
    survivors = [sample_space(rng, space) for _ in range(n_configs)]

    budgets = []
    b = int(min_budget)
    while b < int(max_budget):
        budgets.append(b)
        b *= eta
    budgets.append(int(max_budget))

    history = []
    total_steps = 0
    best_params, best_value = None, float("inf")
    for k, budget in enumerate(budgets):
        scores = np.asarray(batch_objective(survivors, budget),
                            dtype=float)
        scores = np.where(np.isfinite(scores), scores, np.inf)
        total_steps += budget * len(survivors)
        history.append((budget, list(zip(survivors, scores))))
        order = np.argsort(scores, kind="stable")
        if budget == budgets[-1] and np.isfinite(scores[order[0]]):
            # full-budget scores are the real objective
            best_params = survivors[int(order[0])]
            best_value = float(scores[order[0]])
        if verbose:
            print(f"rung {k} (budget {budget}, {len(survivors)} "
                  f"trials): best {scores[order[0]]:.4f} "
                  f"{survivors[int(order[0])]}")
        keep = max(1, int(math.ceil(len(survivors) / eta)))
        survivors = [survivors[int(i)] for i in order[:keep]]
    return best_params, best_value, history, total_steps / max_budget


def set_injected_lr(opt_state, lr):
    """Overwrite the learning rate inside an
    `optax.inject_hyperparams(...)` optimizer state."""
    hyperparams = dict(opt_state.hyperparams)
    hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state._replace(hyperparams=hyperparams)


def pendulum_asha_objective(base_config, true_params, seed=0,
                            case="svmpc", mesh=None):
    """Build a `successive_halving` batch objective for the pendulum
    SV-MPC task (the reference's tuning target,
    `demo/pendulum_tuning.py:30-43`).

    Trials may vary `learning_rate`, `prior_sigma` (lane-vmapped: the
    lr rides in the optax injected-hyperparams state, the prior sigma
    in the SVMPC state's prior scale_tril and the matching init-particle
    spread), and `alpha` / `horizon` (compile-static: trials sharing
    them evaluate as lanes of ONE device program, so a rung costs one
    program launch per distinct (alpha, horizon) combo — sample them
    from small grids to keep rungs wide). Budget is episode steps; all
    lanes share one episode noise stream (common random numbers), so
    rung comparisons are paired.
    """
    import copy

    import optax

    from .experiments import build_pendulum_stack
    from .parallel.sweep import ScenarioSweep, broadcast_scenarios
    from .simulation import PendulumSimulation

    base_exp = base_config["exp_params"]

    def batch_objective(trials, budget):
        scores = np.full(len(trials), np.inf)
        groups = {}
        for i, t in enumerate(trials):
            gkey = (round(float(t.get("alpha", base_exp["alpha"])), 8),
                    int(t.get("horizon", base_exp["horizon"])))
            groups.setdefault(gkey, []).append(i)
        for (alpha, horizon), idxs in groups.items():
            config = copy.deepcopy(base_config)
            config["exp_params"].update(alpha=alpha, horizon=horizon)
            stack = build_pendulum_stack(
                config, jax.random.key(seed), case=case
            )
            stack.svmpc.optimizer = optax.inject_hyperparams(optax.sgd)(
                learning_rate=1.0
            )
            harness = PendulumSimulation(
                controller=stack.controller, svmpc=stack.svmpc,
                model=stack.model, steps=int(budget), warm_up=0,
            )
            svstate0 = stack.svmpc.init_state(
                stack.init_policies, stack.policies_prior
            )
            base_sigma = float(config["exp_params"]["prior_sigma"])
            lrs = jnp.asarray(
                [trials[i].get("learning_rate", base_exp["learning_rate"])
                 for i in idxs], jnp.float32)
            ratio = jnp.asarray(
                [trials[i].get("prior_sigma", base_sigma) / base_sigma
                 for i in idxs], jnp.float32)
            locs = stack.policies_prior.locs

            def make_lane(lr, r):
                prior = svstate0.prior.replace(
                    scale_tril=r * svstate0.prior.scale_tril
                )
                theta = locs + r * (svstate0.theta - locs)
                return svstate0.replace(
                    theta=theta, prior=prior,
                    opt_state=set_injected_lr(svstate0.opt_state, lr),
                )

            svstates = jax.vmap(make_lane)(lrs, ratio)
            k = len(idxs)
            keys = jnp.broadcast_to(jax.random.key(seed + 1), (k,))
            params = {name: jnp.full((k,), v)
                      for name, v in true_params.items()}
            init_obs = jnp.broadcast_to(
                stack.init_state.reshape(1, 1, -1),
                (k, 1, stack.init_state.shape[0]),
            )
            dstate = broadcast_scenarios(
                stack.controller.init_state(stack.init_policies), k
            )
            mstate = (
                broadcast_scenarios(
                    stack.mpf.init_state(stack.mpf_init, stack.init_state,
                                         stack.controller.dim_a), k
                )
                if stack.mpf is not None else broadcast_scenarios((), k)
            )
            sweep = ScenarioSweep(harness, stack.dynamics_prior,
                                  mesh=mesh)
            out = sweep.run(keys, params, init_obs, dstate, svstates,
                            mstate)
            scores[np.asarray(idxs)] = np.asarray(out["avg_cum_cost"])
        return scores

    return batch_objective


def parallel_lr_sweep(harness, stack, lrs, key, true_params,
                      mesh=None):
    """Evaluate K learning rates as K parallel lanes of one device
    program (optionally sharded over `mesh`). The stack's SVMPC must have
    been built with `optimizer=optax.inject_hyperparams(optax.sgd)(
    learning_rate=...)`. Returns avg-cum-cost [K]."""
    from .parallel.sweep import ScenarioSweep, broadcast_scenarios

    lrs = jnp.asarray(lrs, jnp.float32)
    k = lrs.shape[0]

    svstate0 = stack.svmpc.init_state(
        stack.init_policies, stack.policies_prior
    )
    svstates = jax.vmap(
        lambda lr: svstate0.replace(
            opt_state=set_injected_lr(svstate0.opt_state, lr)
        )
    )(lrs)

    keys = jnp.broadcast_to(key, (k,))
    params = {name: jnp.full((k,), v) for name, v in true_params.items()}
    init_obs = jnp.broadcast_to(
        stack.init_state.reshape(1, 1, -1), (k, 1, stack.init_state.shape[0])
    )
    dstate = broadcast_scenarios(
        stack.controller.init_state(stack.init_policies), k
    )
    mstate = (
        broadcast_scenarios(
            stack.mpf.init_state(stack.mpf_init, stack.init_state,
                                 stack.controller.dim_a), k
        )
        if stack.mpf is not None else broadcast_scenarios((), k)
    )
    sweep = ScenarioSweep(harness, stack.dynamics_prior, mesh=mesh)
    out = sweep.run(keys, params, init_obs, dstate, svstates, mstate)
    return out["avg_cum_cost"]


def particle_sweep_score(out, target, steps):
    """Strict-success score of one robustness sweep
    (`megakernel_particle_sweep_fn` outputs, [steps, n_sc] logs).

    Success is the reference's strict test — the FULL 4-dim state
    (position AND velocity) within `success_dist` of the target,
    `/root/reference/dust/utils/simulations.py:257` — which the kernel
    evaluates per step into the cumulative `done`/`crashed` flags.

    Per scenario (lower is better):
      success:  t_success / steps            in [0, 1)
      no goal:  1 + final_4dim_dist / 36     in [1, ~2)
      crashed:  4 + final_4dim_dist / 36     in [4, ~5)
    so any success beats any failure, earlier success beats later,
    closer failure beats farther, and crashes are worst. Returns
    (mean score, n_success, n_crash, per-scenario success mask).
    """
    done = np.asarray(out["done"])
    crashed = np.asarray(out["crashed"])
    last = steps - 1
    crash = crashed[last] > 0.5
    succ = (done[last] > 0.5) & ~crash
    t_succ = done.argmax(axis=0)  # first step the flag latched
    dist = np.sqrt(
        (np.asarray(out["px"][last]) - target[0]) ** 2
        + (np.asarray(out["py"][last]) - target[1]) ** 2
        + (np.asarray(out["vx"][last]) - target[2]) ** 2
        + (np.asarray(out["vy"][last]) - target[3]) ** 2
    )
    per = np.where(crash, 4.0 + dist / 36.0,
                   np.where(succ, t_succ / steps, 1.0 + dist / 36.0))
    return float(per.mean()), int(succ.sum()), int(crash.sum()), succ


def particle_sweep_asha_objective(base_config, true_masses, seed=0,
                                  interpret=None, verbose=False):
    """Build a `successive_halving` batch objective that scores each
    trial as ONE 8-scenario robustness sweep through the particle sweep
    MEGAKERNEL (the VERDICT-r2 #3 surface: the reference tunes with 500
    sequential CPU episodes, `/root/reference/demo/particle_tuning.py:147`;
    here a full 8-episode x 400-step trial is one ~15 ms device
    program, so the search runs at full budget).

    Trial keys: `learning_rate` / `alpha` / `ctrl_sigma` /
    `prior_sigma` / any exp_params key ride in the kernel's SMEM
    scalar tile — ZERO recompiles across trials. `w_*` keys override
    env cost_params and `shape` = (n_particles, horizon) changes
    operand shapes — both are compile-static, so sample them from
    small grids (one ~70 s Mosaic compile per distinct combination,
    cached across trials and rungs). Budget is episode steps (also
    static). All trials share one PRNG seed (common random numbers:
    rung comparisons are paired).

    On TPU the sweep uses the hardware PRNG; on CPU (tests) interpret
    mode with host noise.
    """
    import copy

    from .experiments import build_particle_stack
    from .simulation import megakernel_particle_sweep_fn

    true_masses = jnp.asarray(true_masses, jnp.float32)
    n_sc = int(true_masses.shape[0])
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    target = np.asarray(base_config["env_params"]["target_state"],
                        np.float64)

    def _host_noise(key, steps, hz, m):
        smp = -(-n_sc * m // 8) * 8
        k1, k2, k3 = jax.random.split(key, 3)
        return (jax.random.normal(k1, (steps, hz, 2, smp, 128)),
                jax.random.normal(k2, (steps, n_sc, 8, 128)),
                jax.random.uniform(k3, (steps, n_sc, 8, 128)))

    def batch_objective(trials, budget):
        scores = np.full(len(trials), np.inf)
        for i, t in enumerate(trials):
            config = copy.deepcopy(base_config)
            cost = dict(config["env_params"].get("cost_params", {}))
            for k, v in t.items():
                if k.startswith("w_"):
                    cost[k] = float(v)
                elif k == "shape":
                    (config["exp_params"]["n_particles"],
                     config["exp_params"]["horizon"]) = v
                else:
                    config["exp_params"][k] = v
            config["env_params"]["cost_params"] = cost
            exp = config["exp_params"]
            try:
                stack = build_particle_stack(config,
                                             jax.random.key(seed))
                sweep = megakernel_particle_sweep_fn(
                    stack, exp, steps=int(budget), n_sc=n_sc,
                    unroll=not interpret, interpret=interpret)
                kw = {}
                if interpret:
                    eps, pdz, pdu = _host_noise(
                        jax.random.key(seed + 1), int(budget),
                        exp["horizon"], exp["n_particles"])
                    kw = dict(host_eps=eps, host_pdz=pdz, host_pdu=pdu)
                out = sweep(jnp.asarray([seed + 1, 0], jnp.int32),
                            true_masses, **kw)
                score, n_succ, n_crash, _ = particle_sweep_score(
                    out, target, int(budget))
                scores[i] = score
                if verbose:
                    print(f"  trial {i}: score={score:.4f} "
                          f"success={n_succ}/{n_sc} crash={n_crash} "
                          f"{t}", flush=True)
            except (ValueError, RuntimeError, TypeError) as exc:
                if verbose:
                    print(f"  trial {i} failed: {exc}", flush=True)
        return scores

    return batch_objective


def pendulum_tail_score(out, steps, tail=5):
    """Worst-corner tail score of one pendulum robustness sweep
    (`megakernel_pendulum_sweep_fn` outputs, [steps, n_sc] costs) —
    the VERDICT-r3 #7 objective: the demo config reaches 8/8 swing-up
    over true (length, mass) in [0.70, 1.25] x [1.25, 0.70] but one
    extreme corner oscillates late (tail cost 0.04-0.31).

    Per scenario: tail = mean cost over the last `tail` steps; a
    scenario that never swings up (2nd-half min cost >= 1, the demo's
    criterion, `demo/sweep_example.py`) scores 10 + its 2nd-half min
    so ANY 8/8-swing-up config beats any failure. The trial score is
    the MAX over scenarios (the tail is a worst-corner metric — a
    mean would let one bad corner hide behind seven good ones).
    Returns (score, n_solved, per-scenario tails).
    """
    cost = np.asarray(out["cost"])                  # [steps, n_sc]
    half_min = cost[steps // 2:].min(axis=0)
    tails = cost[-tail:].mean(axis=0)
    solved = half_min < 1.0
    per = np.where(solved, tails, 10.0 + half_min)
    return float(per.max()), int(solved.sum()), tails


def pendulum_sweep_tail_objective(base_config, lens, masses, seed=0,
                                  interpret=None, verbose=False,
                                  n_seeds=1):
    """Build a `successive_halving` batch objective that scores each
    trial as ONE n_sc-scenario pendulum robustness sweep through the
    sweep MEGAKERNEL, minimizing the WORST-corner tail cost
    (`pendulum_tail_score`).

    Trial keys `learning_rate` / `alpha` / `ctrl_sigma` /
    `prior_sigma` / `mpf_learning_rate` ride in the kernel's SMEM
    scalar tile — ZERO recompiles across trials; `horizon` /
    `n_particles` / `mpf_steps` are compile-static (sample from small
    grids). All trials share PRNG seeds (common random numbers);
    `n_seeds > 1` averages the score over independent sweep seeds to
    de-noise the tail (the tail of a single 8-episode sweep is a
    5-step mean of a stochastic controller).
    """
    import copy

    from .experiments import build_pendulum_stack
    from .simulation import megakernel_pendulum_sweep_fn

    lens = jnp.asarray(lens, jnp.float32)
    masses = jnp.asarray(masses, jnp.float32)
    n_sc = int(lens.shape[0])
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def _host_noise(key, steps, hz, m):
        smp = -(-n_sc * m // 8) * 8
        k1, k2, k3 = jax.random.split(key, 3)
        return (jax.random.normal(k1, (steps, hz, smp, 128)),
                jax.random.normal(k2, (steps, n_sc, 8, 128)),
                jax.random.uniform(k3, (steps, n_sc, 8, 128)))

    def batch_objective(trials, budget):
        scores = np.full(len(trials), np.inf)
        for i, t in enumerate(trials):
            config = copy.deepcopy(base_config)
            for k, v in t.items():
                config["exp_params"][k] = v
            exp = config["exp_params"]
            try:
                stack = build_pendulum_stack(
                    config, jax.random.key(seed), case="dust")
                sweep = megakernel_pendulum_sweep_fn(
                    stack, exp, steps=int(budget), n_sc=n_sc,
                    unroll=not interpret, interpret=interpret)
                vals, solved_min = [], n_sc
                for sd in range(n_seeds):
                    kw = {}
                    if interpret:
                        eps, pdz, pdu = _host_noise(
                            jax.random.key(seed + 1 + sd), int(budget),
                            exp["horizon"], exp["n_particles"])
                        kw = dict(host_eps=eps, host_pdz=pdz,
                                  host_pdu=pdu)
                    out = sweep(
                        jnp.asarray([seed + 1, sd * 1000], jnp.int32),
                        lens, masses, **kw)
                    v, n_solved, _ = pendulum_tail_score(
                        out, int(budget))
                    vals.append(v)
                    solved_min = min(solved_min, n_solved)
                scores[i] = float(np.mean(vals))
                if verbose:
                    print(f"  trial {i}: score={scores[i]:.4f} "
                          f"solved={solved_min}/{n_sc} {t}",
                          flush=True)
            except (ValueError, RuntimeError, TypeError) as exc:
                if verbose:
                    print(f"  trial {i} failed: {exc}", flush=True)
        return scores

    return batch_objective
