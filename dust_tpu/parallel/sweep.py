"""Sharded scenario sweeps: thousands of MPC episodes in parallel.

The pod-scale analogue of the reference's sequential Optuna trials and
multi-episode loops (`demo/pendulum_tuning.py:179-180`,
`dust/utils/simulations.py:36`): every scenario (seed x true-parameter
draw) runs the full closed-loop episode; `vmap` batches them into one
device program and the scenario axis shards over the mesh. Per-scenario
failure isolation is inherent — a NaN episode stays in its own batch lane
(SURVEY.md §5.3) and is reported per-scenario, never poisoning the
reduction (metrics use nan-aware reductions).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .mesh import scenario_sharding


class ScenarioSweep:
    """vmap + shard a `PendulumSimulation`-style episode over scenarios.

    Usage:
        sweep = ScenarioSweep(harness, dyn_dist, mesh)
        out = sweep.run(keys [N], true_params {k: [N]}, init_obs, dstate0,
                        svstate0, mstate0)   # N sharded over the mesh
    """

    def __init__(self, harness, static_dyn_dist=None, mesh=None,
                 axis="scenario"):
        self.harness = harness
        self.mesh = mesh
        self.axis = axis
        episode = harness.episode_fn(static_dyn_dist)

        def batched(keys, true_params, init_obs, dstate, svstate, mstate):
            carry, logs = jax.vmap(episode)(
                keys, true_params, init_obs, dstate, svstate, mstate
            )
            states, actions, costs = logs[0], logs[1], logs[2]
            # nan-aware per-scenario isolation: a diverged episode reports
            # nan metrics for itself only
            cum_costs = jnp.sum(costs, axis=1)
            avg_cum = cum_costs / costs.shape[1]
            healthy = jnp.isfinite(cum_costs)
            return {
                "costs": costs,              # [N, steps]
                "states": states,            # [N, steps, S]
                "actions": actions,          # [N, steps, A]
                "avg_cum_cost": avg_cum,     # [N]
                "healthy": healthy,          # [N]
                "mean_cost_healthy": jnp.nanmean(
                    jnp.where(healthy, avg_cum, jnp.nan)
                ),
            }

        if mesh is not None:
            shard = scenario_sharding(mesh, axis)
            self._fn = jax.jit(
                batched,
                in_shardings=(
                    shard,            # keys [N]
                    None,             # true_params dict [N]-leaves (auto)
                    shard,            # init_obs [N, 1, S]
                    None, None, None,  # batched state pytrees (auto)
                ),
                out_shardings=None,
            )
        else:
            self._fn = jax.jit(batched)

    def run(self, keys, true_params, init_obs, dstate, svstate, mstate):
        if self.mesh is not None:
            shard = scenario_sharding(self.mesh, self.axis)
            place = lambda tree: jax.device_put(
                tree,
                jax.tree_util.tree_map(lambda _: shard, tree),
            )
            keys = jax.device_put(keys, shard)
            true_params = place(true_params)
            init_obs = jax.device_put(init_obs, shard)
            dstate = place(dstate)
            svstate = place(svstate)
            mstate = place(mstate)
        return self._fn(keys, true_params, init_obs, dstate, svstate, mstate)


def broadcast_scenarios(tree, n):
    """Tile a per-episode init pytree across a leading scenario axis."""
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (n, *jnp.shape(x))), tree
    )


class ParticleScenarioSweep:
    """vmap + shard the particle-navigation episode over scenarios:
    per-lane PRNG keys, initial states and true simulator masses. The
    particle analogue of `ScenarioSweep` (BASELINE.json config #4's
    changing-dynamics task at sweep scale)."""

    def __init__(self, episode_fn, mesh=None, axis="scenario"):
        self.mesh = mesh
        self.axis = axis

        def batched(keys, state0, dstate, svstate, mstate, sim_mass):
            state, done, crashed, cum, logs = jax.vmap(episode_fn)(
                keys, state0, dstate, svstate, mstate, sim_mass
            )
            cum = jnp.where(crashed, jnp.inf, cum)
            return {
                "final_state": state,
                "success": done & ~crashed,
                "crashed": crashed,
                "cum_cost": cum,
                "success_rate": jnp.mean((done & ~crashed).astype(jnp.float32)),
                "crash_rate": jnp.mean(crashed.astype(jnp.float32)),
            }

        self._fn = jax.jit(batched)

    def run(self, keys, state0, dstate, svstate, mstate, sim_mass):
        if self.mesh is not None:
            shard = scenario_sharding(self.mesh, self.axis)
            place = lambda tree: jax.device_put(
                tree, jax.tree_util.tree_map(lambda _: shard, tree)
            )
            keys, state0, dstate, svstate, mstate, sim_mass = (
                place(keys), place(state0), place(dstate), place(svstate),
                place(mstate), place(sim_mass),
            )
        return self._fn(keys, state0, dstate, svstate, mstate, sim_mass)


class MegakernelGroupSweep:
    """Shard scenario-sweep MEGAKERNEL groups over a device mesh.

    The sweep megakernel (`ops/pallas_sweep_episode.py`, the bench.py
    headline) advances up to 8 episodes per Pallas program; at pod
    scale the GROUP axis is the data-parallel unit: each device scans
    its local groups, so N devices run N*groups_per_device*8 episodes
    with zero cross-device communication (scenario DP, SURVEY.md §2.2).

    `sweep_fn(seed2, *mapped)` is a megakernel adapter
    (`simulation.megakernel_pendulum_sweep_fn` closure, optionally with
    per-group host-noise arrays appended as mapped args for CPU
    tests). shard_map is required — a Pallas call has no GSPMD
    partitioning rule, so jit in_shardings cannot split it; explicit
    per-device programs can.
    """

    def __init__(self, sweep_fn, mesh=None, axis="scenario"):
        self.mesh = mesh
        self.axis = axis

        def batched(seeds, *mapped):
            return jax.vmap(sweep_fn)(seeds, *mapped)

        if mesh is not None:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            spec = P(axis)
            self._fn = jax.jit(shard_map(
                batched, mesh=mesh,
                in_specs=spec, out_specs=spec,
                check_vma=False,
            ))
        else:
            self._fn = jax.jit(batched)

    def run(self, seeds, *mapped):
        """seeds [G, 2] int32 (G divisible by mesh size when sharded);
        mapped: optional per-group leading-axis-G arrays (host noise).
        Returns the megakernel's log dict with a leading group axis."""
        if self.mesh is not None:
            shard = scenario_sharding(self.mesh, self.axis)
            seeds = jax.device_put(seeds, shard)
            mapped = tuple(jax.device_put(m, shard) for m in mapped)
        return self._fn(seeds, *mapped)
