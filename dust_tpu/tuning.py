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


def set_injected_lr(opt_state, lr):
    """Overwrite the learning rate inside an
    `optax.inject_hyperparams(...)` optimizer state."""
    hyperparams = dict(opt_state.hyperparams)
    hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state._replace(hyperparams=hyperparams)


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
