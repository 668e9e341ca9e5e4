"""Closed-loop MPC episode harness.

TPU-native redesign of `dust/utils/simulations.py:13-260`. The reference
steps a Python loop (SVMPC optimize -> forward -> gym env.step -> MPF
optimize) with host logging; here the *entire episode* is one
`lax.scan`-over-steps jitted device program:

* the simulator is the dynamics model itself with the episode's true
  parameters passed as traced values (one compile serves every episode /
  seed — this is what makes the pod-scale scenario sweep a `vmap`);
  gym `Pendulum-v0` dynamics == `PendulumModel.step` with g=10
  (`dust/models/pendulum.py:93-100` vs gym classic control);
* warm-up gating, the particle task's mid-episode mass change, crash and
  goal termination are all branchless (`lax.cond` / done-masks) per
  SURVEY.md §7.4.3;
* per-step logs (states, actions, costs, particles, weights, bandwidths)
  are stacked by the scan and converted to the reference's pandas
  DataFrame schema on host afterwards.

Intended-behavior note: when MPF is active, rollout parameters are drawn
from the *current* MPF prior each step. The reference instead keeps a
stale alias created before the loop (`simulations.py:79` — live particle
locations but the initial bandwidth forever).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .models.pendulum import PendulumModel


class PendulumSimulation:
    """Multi-episode pendulum harness (`run_pendulum_simulation`,
    `dust/utils/simulations.py:13-194`)."""

    def __init__(self, controller, svmpc=None, mpf=None, model=None,
                 sim_g=10.0, sim_dt=0.05, steps=200, warm_up=1,
                 use_svmpc=True, disco_strategy="average", mpf_bw=None,
                 mpf_steps=None, use_exact_model=False):
        self.controller = controller
        self.svmpc = svmpc
        self.mpf = mpf
        self.model = model  # internal rollout model
        self.sim_model = PendulumModel(g=sim_g, dt=sim_dt)
        self.steps = int(steps)
        self.warm_up = int(warm_up)
        self.use_svmpc = bool(use_svmpc)
        self.disco_strategy = disco_strategy
        self.mpf_bw = mpf_bw          # None -> per-step Silverman
        self.mpf_steps = mpf_steps    # None -> mpf.n_steps
        # exact-model baselines (`simulations.py:43-44`): the controller
        # rolls out under the episode's true parameters, passed as traced
        # values (NOT baked into the model object — one compile serves
        # every episode)
        self.use_exact_model = bool(use_exact_model)

    def episode_fn(self, static_dyn_dist):
        """Build the jittable single-episode function
        (key, true_params, init_obs, dstate, svstate, mstate) -> (carry,
        logs). `true_params` is a dict of traced scalars for the simulator."""
        ctrl, svmpc, mpf = self.controller, self.svmpc, self.mpf
        model, use_svmpc, warm_up = self.model, self.use_svmpc, self.warm_up

        def episode(key, true_params, init_obs, dstate, svstate, mstate):
            def step_fn(carry, t):
                key, obs, dstate, svstate, mstate = carry
                key, k_opt, k_fwd = jax.random.split(key, 3)
                dyn_dist = mstate.prior if mpf is not None else static_dyn_dist

                if use_svmpc:
                    svstate, dstate, costs = svmpc.optimize(
                        svstate, dstate, obs, dyn_dist, k_opt
                    )

                    def act_fn(op):
                        sv, c = op
                        sv2, a_seq, w = svmpc.forward(sv, c, key=k_fwd)
                        return sv2, a_seq[0], w

                    def warm_fn(op):
                        sv, _ = op
                        return (
                            sv,
                            jnp.zeros((ctrl.dim_a,)),
                            jnp.full((svmpc.n_particles,), jnp.nan),
                        )

                    svstate, action, weights = jax.lax.cond(
                        t >= warm_up, act_fn, warm_fn, (svstate, costs)
                    )
                else:
                    override = (
                        {k: v for k, v in true_params.items()
                         if k in model.params_dict}
                        if self.use_exact_model else None
                    )
                    dstate, _, _, _, _, _ = ctrl.forward(
                        dstate, obs, model, dyn_dist, k_opt,
                        params_override=override,
                    )
                    dstate, next_actions = ctrl.step(
                        dstate, strategy=self.disco_strategy
                    )
                    action = next_actions.reshape(-1)
                    weights = dstate.a_mix

                obs = self.sim_model.step(obs, action[None], true_params)

                if mpf is not None:
                    mstate, _, bw = mpf.optimize(
                        mstate, action, obs[0], bw=self.mpf_bw,
                        n_steps=self.mpf_steps,
                    )
                else:
                    bw = jnp.float32(0.0)

                cost = ctrl.inst_cost_fn(obs)[0]
                theta_log = (
                    svstate.theta if use_svmpc
                    else jnp.zeros((ctrl.n_pol, ctrl.hz_len, ctrl.dim_a))
                )
                dyn_log = mstate.x if mpf is not None else jnp.zeros((1, 1))
                log = (obs[0], action, cost, theta_log, weights, dyn_log, bw)
                return (key, obs, dstate, svstate, mstate), log

            carry0 = (key, init_obs, dstate, svstate, mstate)
            return jax.lax.scan(step_fn, carry0, jnp.arange(self.steps))

        return episode

    def run(self, key, experiment_params, init_state, init_policies,
            policies_prior=None, dyn_dist=None, mpf_init=None,
            episodes=None, verbose=False):
        """Run one episode per entry of `experiment_params` (list of dicts
        of true simulator parameters); returns the reference-schema
        DataFrame (`simulations.py:172-193`)."""
        import pandas as pd

        episodes = len(experiment_params) if episodes is None else episodes
        episode_fn = jax.jit(self.episode_fn(dyn_dist))

        epoch_rows = []
        init_obs = jnp.asarray(init_state, jnp.float32).reshape(1, -1)
        for i in range(episodes):
            key, k_ep = jax.random.split(key)
            true = experiment_params[i]
            true_params = {k: jnp.float32(v) for k, v in true.items()}
            dstate = self.controller.init_state(init_policies)
            svstate = (
                self.svmpc.init_state(init_policies, policies_prior)
                if self.use_svmpc else ()
            )
            mstate = (
                self.mpf.init_state(
                    mpf_init, init_obs[0], self.controller.dim_a
                )
                if self.mpf is not None else ()
            )
            _, logs = episode_fn(
                k_ep, true_params, init_obs, dstate, svstate, mstate
            )
            states, actions, costs, thetas, weights, dyn_parts, bws = map(
                np.asarray, logs
            )
            if verbose:
                print(
                    f"episode {i}: params={true} "
                    f"final avg cost={costs[-20:].mean():.3f}"
                )
            df = pd.DataFrame(
                index=list(range(self.steps)),
                data={
                    "Cost": costs,
                    "Position": states[:, 0],
                    "Speed": states[:, 1],
                    "Actions": actions[:, 0],
                    "Timestep": np.arange(self.steps),
                    "Iteration": i,
                    "DynParticles": (
                        list(dyn_parts) if self.mpf is not None else None
                    ),
                    "DynBandwidths": bws,
                    "PolParticles": thetas[..., 0, 0].tolist(),
                    "Weights": weights.tolist(),
                    "ExpParams": self.steps * [list(true.values())],
                },
            )
            df["AvgCumCost"] = (
                df["Cost"].cumsum(0) / (df["Timestep"] + 1)
            ).round(2)
            epoch_rows.append(df)
        return pd.concat(epoch_rows, axis=0)


def megakernel_pendulum_episode_fn(stack, exp_params, steps, warm_up=0,
                                   unroll=True, interpret=False):
    """Whole-episode megakernel adapter (`ops/pallas_episode.py`): the
    entire closed loop — every SVMPC solve, simulator step and MPF
    posterior update — runs as ONE Pallas program with in-kernel
    hardware-PRNG noise. Returns episode(seed [2] int32, true_length,
    true_mass) -> logs dict. RNG stream differs from the plain/fused
    paths (statistically equivalent); use for production throughput,
    not bitwise-equivalence work."""
    from .ops.pallas_episode import fused_pendulum_episode

    exp = exp_params
    mstate = stack.mpf.init_state(stack.mpf_init, stack.init_state, 1)
    dstate = stack.controller.init_state(stack.init_policies)
    theta0 = stack.init_policies[..., 0]
    locs0 = stack.policies_prior.locs[..., 0]
    amat0 = dstate.a_mat[..., 0]
    aseq0 = dstate.a_seq[..., 0]
    g_model = float(stack.model.params_dict["g"])

    def episode(seed, true_length=1.0, true_mass=1.0):
        return fused_pendulum_episode(
            seed, stack.init_state, theta0, locs0, amat0, aseq0,
            stack.mpf_init, mstate.prior_bw, true_length, true_mass,
            exp["ctrl_sigma"], exp["learning_rate"], exp["alpha"],
            1.0 / exp["alpha"], exp["prior_sigma"],
            exp["mpf_learning_rate"], exp["mpf_obs_std"],
            steps=steps, warm_up=warm_up, hz=exp["horizon"],
            m=exp["n_particles"], n_params=exp["params_samples"],
            n_act=exp["action_samples"], m_mpf=exp["mpf_n_particles"],
            mpf_steps=exp["mpf_steps"], g_model=g_model, g_sim=10.0,
            exp_util=exp.get("likelihood", "ExponentiatedUtility")
            == "ExponentiatedUtility",
            mpf_log_space=exp["mpf_log_space"],
            mpf_fixed_bw=exp.get("mpf_bandwidth"),
            mpf_bw_scale=exp["mpf_bandwidth_scaling"],
            unroll=unroll, interpret=interpret,
        )

    return episode


def megakernel_pendulum_sweep_fn(stack, exp_params, steps, n_sc,
                                 warm_up=0, unroll=True,
                                 interpret=False, svmpc_only=False,
                                 n_chains=1):
    """Scenario-batched sweep megakernel adapter
    (`ops/pallas_sweep_episode.py`): n_sc <= 16 independent pendulum
    DuSt episodes — per-scenario true parameters, seeds, Silverman
    bandwidths and MPF posteriors — advance in lockstep inside ONE
    Pallas program. The pod-scale sweep path: vmap/scan over groups
    for larger sweeps; n_sc=16 is the throughput layout (r4 — the
    group-step is latency-bound, BASELINE.md), n_sc=8 the r1-r3 one.
    Returns sweep(seed [2] int32, true_lengths [n_sc],
    true_masses [n_sc]) -> per-scenario logs.

    svmpc_only=True degenerates the dual loop into the SV-MPC
    single-posterior case (`pendulum_example.py:191-215` semantics:
    model default parameters, no dynamics inference) with NO kernel
    changes: one MPF particle at the model's default (length, mass),
    zero prior bandwidth and zero MPF steps make every dynamics draw
    exactly the default parameters and freeze the posterior."""
    from .ops.pallas_sweep_episode import fused_pendulum_sweep_episode

    exp = exp_params
    dstate = stack.controller.init_state(stack.init_policies)
    # the sweep kernel drops the a_seq term from the DISCO delta: only
    # valid while the controller plan is zero (SVMPC never calls
    # controller.step, so the initial zeros persist)
    import numpy as _np

    if _np.any(_np.asarray(dstate.a_seq)):
        raise ValueError("sweep megakernel requires a zero controller "
                         "a_seq (SVMPC demo semantics)")
    # the kernel's policy-prior mixture weight is a single scalar
    # log(1/m) held constant across the episode (pallas_sweep_episode
    # `log_mix`); a weighted prior would need a per-particle log-weight
    # column refreshed on every roll — reject rather than silently
    # diverge from SVMPC(weighted_prior=True) semantics
    if exp.get("weighted_prior", False):
        raise ValueError("sweep megakernel supports the unweighted "
                         "policy prior only (pendulum demo semantics)")
    # host-side numpy check (device log_softmax carries TPU ulp noise
    # and would add a tunnel roundtrip to adapter construction)
    _lg = _np.asarray(stack.policies_prior.logits, dtype=_np.float64)
    _lsm = _lg - (_np.log(_np.sum(_np.exp(_lg - _lg.max()))) + _lg.max())
    if _np.abs(_lsm + _np.log(exp["n_particles"])).max() > 1e-5:
        raise ValueError("sweep megakernel requires uniform initial "
                         "prior mixture weights")
    theta0 = stack.init_policies[..., 0]
    locs0 = stack.policies_prior.locs[..., 0]
    amat0 = dstate.a_mat[..., 0]
    g_model = float(stack.model.params_dict["g"])
    if svmpc_only:
        mpf_init = jnp.array([[
            float(stack.model.params_dict["length"]),
            float(stack.model.params_dict["mass"]),
        ]], jnp.float32)
        # mpf_fixed_bw=0 keeps the PRIOR bandwidth at exactly zero on
        # every step (the Silverman fallback has a 1e-6 floor that
        # would re-inject draw noise); with mpf_steps=0 the Stein
        # division by bw^2 it would otherwise feed never runs
        mpf_cfg = dict(m_mpf=1, mpf_steps=0, mpf_log_space=False,
                       mpf_fixed_bw=0.0)
        prior_bw0 = jnp.float32(0.0)
        n_params = 1
    else:
        mstate = stack.mpf.init_state(stack.mpf_init, stack.init_state,
                                      1)
        mpf_init = stack.mpf_init
        mpf_cfg = dict(m_mpf=exp["mpf_n_particles"],
                       mpf_steps=exp["mpf_steps"],
                       mpf_log_space=exp["mpf_log_space"],
                       mpf_fixed_bw=exp.get("mpf_bandwidth"))
        prior_bw0 = mstate.prior_bw
        n_params = exp["params_samples"]

    def sweep(seed, true_lengths, true_masses, host_eps=None,
              host_pdz=None, host_pdu=None):
        return fused_pendulum_sweep_episode(
            seed, stack.init_state, theta0, locs0, amat0,
            mpf_init, prior_bw0, true_lengths, true_masses,
            exp["ctrl_sigma"], exp["learning_rate"], exp["alpha"],
            1.0 / exp["alpha"], exp["prior_sigma"],
            exp["mpf_learning_rate"], exp["mpf_obs_std"],
            n_sc=n_sc, steps=steps, warm_up=warm_up, hz=exp["horizon"],
            m=exp["n_particles"], n_params=n_params,
            n_act=exp["action_samples"], g_model=g_model, g_sim=10.0,
            exp_util=exp.get("likelihood", "ExponentiatedUtility")
            == "ExponentiatedUtility",
            mpf_bw_scale=exp["mpf_bandwidth_scaling"],
            unroll=unroll, interpret=interpret, n_chains=n_chains,
            host_eps=host_eps, host_pdz=host_pdz, host_pdu=host_pdu,
            **mpf_cfg,
        )

    return sweep


def megakernel_particle_episode_fn(stack, exp_params, steps, warm_up=0,
                                   unroll=True, interpret=False,
                                   success_dist=1.0):
    """Particle-navigation counterpart of
    `megakernel_pendulum_episode_fn` (`ops/pallas_particle_episode.py`):
    the whole obstacle-navigation episode — SVMPC solves, simulator with
    the mid-episode mass change, crash/goal termination masks, gated MPF
    mass-posterior updates — is ONE Pallas program. Requires the demo
    config's fixed MPF bandwidth (`mpf_bandwidth` set)."""
    from .ops.pallas_particle_episode import fused_particle_episode
    from .ops.pallas_particle_rollout import particle_kernel_statics

    exp = exp_params
    if stack.mpf_bw is None:
        raise ValueError("particle megakernel expects a fixed "
                         "mpf_bandwidth (the demo config sets 0.5)")
    statics = particle_kernel_statics(stack.model)
    mstate = stack.mpf.init_state(
        stack.mpf_init, stack.init_state, 2, bw=stack.mpf_init_bw
    )
    dstate = stack.controller.init_state()
    log_mix0 = jax.nn.log_softmax(stack.policies_prior.logits)

    def episode(seed, base_mass=None):
        return fused_particle_episode(
            seed, stack.init_state, stack.init_policies,
            stack.policies_prior.locs, log_mix0, dstate.a_mat,
            dstate.a_seq, stack.mpf_init, mstate.prior_bw,
            jnp.float32(stack.model.params_dict["mass"])
            if base_mass is None else base_mass,
            jnp.float32(stack.load),
            exp["ctrl_sigma"], exp["learning_rate"], exp["alpha"],
            1.0 / exp["alpha"], exp["prior_sigma"],
            exp["mpf_learning_rate"], exp["mpf_obs_std"],
            jnp.float32(stack.mpf_bw),
            steps=steps, warm_up=warm_up, hz=exp["horizon"],
            m=exp["n_particles"], n_params=exp["params_samples"],
            n_act=exp["action_samples"], m_mpf=exp["mpf_n_particles"],
            mpf_steps=exp["mpf_steps"], dt=float(stack.model.dt),
            max_acc=float(stack.model.max_acc),
            max_speed=float(stack.model.max_speed),
            change_at=steps // 4, success_dist=success_dist,
            exp_util=exp.get("likelihood", "ExponentiatedUtility")
            == "ExponentiatedUtility",
            weighted_prior=exp.get("weighted_prior", False),
            mpf_log_space=exp["mpf_log_space"], use_fixed_mpf_bw=True,
            mpf_bw_scale=exp["mpf_bandwidth_scaling"], unroll=unroll,
            interpret=interpret, **statics,
        )

    return episode


def megakernel_particle_sweep_fn(stack, exp_params, steps, n_sc,
                                 warm_up=0, unroll=True,
                                 interpret=False, success_dist=1.0,
                                 probe_skip=(), n_chains=1):
    """Scenario-batched particle sweep megakernel adapter
    (`ops/pallas_particle_sweep_episode.py`): n_sc <= 16 independent
    obstacle-navigation DuSt episodes — per-scenario seeds, true
    simulator masses, crash/goal termination, weighted priors and MPF
    mass posteriors — advance in lockstep inside ONE Pallas program
    (n_sc <= 8 compiles to the r1-r3 one-vreg scenario tiles
    bit-identically; n_sc > 8 uses the r4 widened 16-sublane tiles);
    vmap/scan over groups for larger sweeps. Returns
    sweep(seed [2] int32, true_masses [n_sc]) -> per-scenario logs.

    Same restrictions discipline as the pendulum sweep adapter: the
    controller a_seq must be zero (SVMPC demo semantics) and the MPF
    bandwidth fixed (the demo config sets 0.5)."""
    from .ops.pallas_particle_rollout import particle_kernel_statics
    from .ops.pallas_particle_sweep_episode import (
        fused_particle_sweep_episode,
    )

    exp = exp_params
    if stack.mpf_bw is None:
        raise ValueError("particle sweep megakernel expects a fixed "
                         "mpf_bandwidth (the demo config sets 0.5)")
    statics = particle_kernel_statics(stack.model)
    mstate = stack.mpf.init_state(
        stack.mpf_init, stack.init_state, 2, bw=stack.mpf_init_bw
    )
    dstate = stack.controller.init_state()
    import numpy as _np

    if _np.any(_np.asarray(dstate.a_seq)):
        raise ValueError("particle sweep megakernel requires a zero "
                         "controller a_seq (SVMPC demo semantics)")
    log_mix0 = jax.nn.log_softmax(stack.policies_prior.logits)

    def sweep(seed, true_masses, host_eps=None, host_pdz=None,
              host_pdu=None):
        return fused_particle_sweep_episode(
            seed, stack.init_state, stack.init_policies,
            stack.policies_prior.locs, log_mix0, dstate.a_mat,
            stack.mpf_init, mstate.prior_bw, true_masses,
            jnp.float32(stack.load),
            exp["ctrl_sigma"], exp["learning_rate"], exp["alpha"],
            1.0 / exp["alpha"], exp["prior_sigma"],
            exp["mpf_learning_rate"], exp["mpf_obs_std"],
            jnp.float32(stack.mpf_bw),
            n_sc=n_sc, steps=steps, warm_up=warm_up,
            hz=exp["horizon"], m=exp["n_particles"],
            n_params=exp["params_samples"],
            n_act=exp["action_samples"],
            m_mpf=exp["mpf_n_particles"], mpf_steps=exp["mpf_steps"],
            dt=float(stack.model.dt),
            max_acc=float(stack.model.max_acc),
            max_speed=float(stack.model.max_speed),
            change_at=steps // 4, success_dist=success_dist,
            exp_util=exp.get("likelihood", "ExponentiatedUtility")
            == "ExponentiatedUtility",
            weighted_prior=exp.get("weighted_prior", False),
            mpf_log_space=exp["mpf_log_space"], use_fixed_mpf_bw=True,
            mpf_bw_scale=exp["mpf_bandwidth_scaling"], unroll=unroll,
            interpret=interpret, host_eps=host_eps, host_pdz=host_pdz,
            host_pdu=host_pdu, probe_skip=probe_skip,
            n_chains=n_chains, **statics,
        )

    return sweep


def particle_episode_fn(model, controller, svmpc=None, mpf=None,
                        dyn_dist=None, load=0.0, steps=400, warm_up=30,
                        mpf_bw=None, mpf_steps=None, use_svmpc=True,
                        success_dist=1.0):
    """Build the jittable particle-navigation episode
    (`dust/utils/simulations.py:197-260` + `demo/particle_example.py:177-242`):
    the model doubles as the simulator, the simulator mass gains `load` at
    steps//4, collisions terminate with infinite cost, reaching within
    `success_dist` of the target terminates successfully. Runs the full
    `steps` scan with a done-mask (state freezes after termination).

    Returns episode(key, state0, dstate, svstate, mstate, sim_mass) ->
    (final_state, done, crashed, cum_cost, logs). `sim_mass` is the
    simulator's true mass before the load change — traced, so scenario
    sweeps vary it per lane.
    """
    ctrl = controller
    target = model.target
    change_at = steps // 4
    has_map = model.with_obstacle and model.obst_map is not None

    def episode(key, state0, dstate, svstate, mstate, sim_mass):
        base_mass = jnp.asarray(sim_mass, jnp.float32)
        def step_fn(carry, t):
            key, state, dstate, svstate, mstate, done, crashed, cum = carry
            key, k_opt, k_fwd = jax.random.split(key, 3)
            dyn_dist_t = mstate.prior if mpf is not None else dyn_dist

            if use_svmpc:
                svstate, dstate, costs = svmpc.optimize(
                    svstate, dstate, state[None], dyn_dist_t, k_opt
                )

                def act_fn(op):
                    sv, c = op
                    sv2, a_seq, _ = svmpc.forward(sv, c, key=k_fwd)
                    return sv2, a_seq[0]

                def warm_fn(op):
                    return op[0], jnp.zeros((ctrl.dim_a,))

                svstate, action = jax.lax.cond(
                    t >= warm_up, act_fn, warm_fn, (svstate, costs)
                )
            else:
                dstate, _, _, _, _, _ = ctrl.forward(
                    dstate, state[None], model, dyn_dist_t, k_opt
                )
                dstate, next_actions = ctrl.step(dstate, strategy="argmax")
                action = next_actions.reshape(-1)

            sim_mass = jnp.where(t >= change_at, base_mass + load, base_mass)
            new_state = model.step(
                state[None], action[None], {"mass": sim_mass}
            )[0]
            state = jnp.where(done, state, new_state)

            if mpf is not None:
                def mpf_fn(ms):
                    ms2, _, _ = mpf.optimize(
                        ms, action, state, bw=mpf_bw, n_steps=mpf_steps
                    )
                    return ms2

                mstate = jax.lax.cond(
                    (t >= warm_up) & ~done, mpf_fn, lambda ms: ms, mstate
                )

            cost = ctrl.inst_cost_fn(state[None])[0]
            cum = jnp.where(done, cum, cum + cost)

            crash_now = (
                (model.obst_map.get_collisions(state[:2]) > 0)
                if has_map else jnp.bool_(False)
            )
            success_now = jnp.linalg.norm(target - state) <= success_dist
            crashed = crashed | (crash_now & ~done)
            done = done | crash_now | success_now

            dyn_log = mstate.x if mpf is not None else jnp.zeros((1, 1))
            log = (state, action, cost, dyn_log, done)
            return (key, state, dstate, svstate, mstate, done, crashed,
                    cum), log

        carry0 = (key, state0, dstate, svstate, mstate, jnp.bool_(False),
                  jnp.bool_(False), jnp.float32(0.0))
        carry, logs = jax.lax.scan(step_fn, carry0, jnp.arange(steps))
        _, state, _, _, _, done, crashed, cum = carry
        return state, done, crashed, cum, logs

    return episode


def run_particle_episode(key, model, controller, svmpc=None, svstate=None,
                         mpf=None, mstate=None, dyn_dist=None,
                         init_state=None, load=0.0, steps=400, warm_up=30,
                         mpf_bw=None, mpf_steps=None, use_svmpc=True,
                         success_dist=1.0):
    """Run one particle episode end to end; returns a dict of outcome
    scalars + logged arrays (trajectory truncated at termination, cum_cost
    = inf on crash, matching `simulations.py:250-257`)."""
    episode = jax.jit(particle_episode_fn(
        model, controller, svmpc=svmpc, mpf=mpf, dyn_dist=dyn_dist,
        load=load, steps=steps, warm_up=warm_up, mpf_bw=mpf_bw,
        mpf_steps=mpf_steps, use_svmpc=use_svmpc, success_dist=success_dist,
    ))
    state0 = (
        jnp.asarray(init_state, jnp.float32)
        if init_state is not None else model.init_state
    )
    dstate = controller.init_state()
    state, done, crashed, cum, logs = episode(
        key, state0, dstate,
        svstate if use_svmpc else (),
        mstate if mpf is not None else (),
        jnp.float32(model.params_dict["mass"]),
    )
    states, actions, costs, dyn_parts, dones = map(np.asarray, logs)
    n_steps = int(dones.argmax() + 1) if bool(dones.any()) else int(steps)
    return {
        "cum_cost": float(np.inf) if bool(crashed) else float(cum),
        "crashed": bool(crashed),
        "success": bool(done) and not bool(crashed),
        "steps": n_steps,
        "trajectory": states[:n_steps],
        "actions": actions[:n_steps],
        "costs": costs[:n_steps],
        "dyn_particles": dyn_parts[:n_steps],
        "final_state": np.asarray(state),
    }
