"""Full benchmark table: every BASELINE.json config on the current device.

Run: python bench/bench_all.py [--quick]
Emits one JSON line per config; paste results into BASELINE.md.

Configs:
  pendulum_dust   — dual inference at demo shapes (headline, = bench.py:
                    fused-Pallas rollout+cost and MPF kernels; _plain =
                    all-XLA path)
  pendulum_svmpc  — SV-MPC single posterior (no MPF; fused rollout+cost,
                    _plain = all-XLA)
  pendulum_dust_mega / particle_dust_mega — whole-episode megakernels
                    (ONE Pallas program per episode, in-kernel RNG;
                    the headline paths)
  particle_dust   — particle navigation w/ obstacles + dual inference
                    (fused-Pallas rollout+cost and mass-posterior
                    kernels; _plain = all-XLA path)
  mpf_large       — dynamics posterior at large particle counts (m=2048)
  sweep           — pod-style scenario sweep: N episodes batched on-chip
  sweep_mega      — scenario-batched sweep megakernel (8 episodes per
                    Pallas program, scanned groups — the sweep headline)
  particle_sweep  — same at the particle task (per-lane true masses)
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from dust_tpu.experiments import (
    build_particle_stack,
    build_pendulum_stack,
    load_config,
)
from dust_tpu.simulation import PendulumSimulation, particle_episode_fn
from dust_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

ROOT = Path(__file__).resolve().parent.parent


def _time_best(fn, repeats=3):
    out = fn(0)
    jax.block_until_ready(out)
    times = []
    for i in range(repeats):
        t0 = time.perf_counter()
        out = fn(i + 1)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return min(times)


# Episodes chained inside one device program per timed dispatch: the axon
# tunnel charges a flat per-dispatch overhead (measured 2-28 ms depending
# on server load), which at chain=1 tracks tunnel weather, not the
# solver. See bench.py CHAIN for details.
CHAIN = int(os.environ.get("BENCH_CHAIN", "4"))


def _time_chained_episodes(episode_scalar, repeats, chain=None):
    """Time `chain` episodes per dispatch; episode_scalar(key) must
    return a scalar (forces the episode's computation). Returns the
    best per-episode seconds."""
    chain = CHAIN if chain is None else chain

    @jax.jit
    def chained(keys):
        def body(acc, k):
            return acc + episode_scalar(k), ()

        tot, _ = jax.lax.scan(body, jnp.float32(0.0), keys)
        return tot

    def run(i):
        return chained(jax.random.split(jax.random.key(i), chain))

    return _time_best(run, repeats) / chain


def bench_pendulum(case, steps, repeats, fused_mpf=False,
                   fused_rollout=False, fused_solve=False):
    config = load_config(ROOT / "demo/pendulum_config.yaml")
    config["exp_params"]["fused_rollout"] = fused_rollout
    config["exp_params"]["fused_solve"] = fused_solve
    stack = build_pendulum_stack(config, jax.random.key(0), case=case)
    if fused_mpf and stack.mpf is not None:
        # dynamics-posterior update as one Pallas program per solve
        # (bench.py's default — see ops/pallas_mpf.py)
        from dust_tpu.inference.mpf import FusedPendulumMPF

        exp = config["exp_params"]
        stack.mpf = FusedPendulumMPF(
            likelihood=stack.mpf.likelihood,
            lr=exp["mpf_learning_rate"],
            n_steps=exp["mpf_steps"],
            bw_scale=exp["mpf_bandwidth_scaling"],
            interpret=jax.default_backend() != "tpu",
        )
    harness = PendulumSimulation(
        controller=stack.controller, svmpc=stack.svmpc, mpf=stack.mpf,
        model=stack.model, steps=steps, warm_up=0,
        mpf_bw=stack.mpf_bw, mpf_steps=stack.mpf_steps,
    )
    episode = harness.episode_fn(stack.dynamics_prior)
    true_params = {"length": jnp.float32(1.0), "mass": jnp.float32(1.0)}
    init_obs = stack.init_state.reshape(1, -1)
    dstate = stack.controller.init_state(stack.init_policies)
    svstate = stack.svmpc.init_state(stack.init_policies, stack.policies_prior)
    mstate = (
        stack.mpf.init_state(stack.mpf_init, stack.init_state, 1)
        if stack.mpf is not None else ()
    )

    def episode_scalar(key):
        _, logs = episode(key, true_params, init_obs, dstate, svstate,
                          mstate)
        return logs[2].sum()

    best = _time_chained_episodes(episode_scalar, repeats)
    return steps / best


def bench_particle(steps, repeats, fused_mpf=False, fused_rollout=False,
                   fused_solve=False):
    config = load_config(ROOT / "demo/particle_config.yaml")
    config["exp_params"]["fused_rollout"] = fused_rollout
    config["exp_params"]["fused_solve"] = fused_solve
    stack = build_particle_stack(config, jax.random.key(0))
    if fused_mpf:
        # mass-posterior update as one Pallas program per solve
        from dust_tpu.inference.mpf import FusedParticleMPF

        exp = config["exp_params"]
        stack.mpf = FusedParticleMPF(
            likelihood=stack.mpf.likelihood,
            lr=exp["mpf_learning_rate"],
            bw_scale=exp["mpf_bandwidth_scaling"],
            n_steps=exp["mpf_steps"],
        )
    episode = particle_episode_fn(
        stack.model, stack.controller, svmpc=stack.svmpc, mpf=stack.mpf,
        dyn_dist=stack.dynamics_prior, load=stack.load, steps=steps,
        warm_up=0, mpf_bw=stack.mpf_bw, mpf_steps=stack.mpf_steps,
    )
    svstate = stack.svmpc.init_state(stack.init_policies, stack.policies_prior)
    mstate = stack.mpf.init_state(
        stack.mpf_init, stack.init_state, 2, bw=stack.mpf_init_bw
    )
    dstate = stack.controller.init_state()
    mass = jnp.float32(stack.model.params_dict["mass"])

    def episode_scalar(key):
        out = episode(key, stack.init_state, dstate, svstate, mstate, mass)
        return out[3]

    best = _time_chained_episodes(episode_scalar, repeats)
    return steps / best


def bench_mpf_large(m, inner_steps, outer, repeats, fused=False):
    """Dynamics posterior at large particle counts (BASELINE config #4):
    `outer` conditioned optimize calls x `inner_steps` SVGD steps on
    [m, 2] particles, all in one device program. `fused=True` uses the
    streaming Pallas kernels (FusedMPF)."""
    import optax

    from dust_tpu.inference import GaussianLikelihood, MPF
    from dust_tpu.inference.mpf import FusedMPF
    from dust_tpu.models import PendulumModel

    model = PendulumModel(uncertain_params=("length", "mass"))
    lik = GaussianLikelihood(obs_std=0.1, model=model)
    cls = FusedMPF if fused else MPF
    mpf = cls(likelihood=lik, optimizer=optax.sgd(1e-3))
    particles = jax.random.uniform(jax.random.key(0), (m, 2),
                                   minval=0.6, maxval=1.3)
    obs0 = jnp.array([3.0, 0.0])
    mstate = mpf.init_state(particles, obs0, dim_a=1, bw=0.2)

    @jax.jit
    def run_outer(key, ms):
        def body(carry, k):
            ms = carry
            action = jax.random.uniform(k, (1,), minval=-2.0, maxval=2.0)
            obs = jax.random.normal(k, (2,)) * 0.1 + obs0
            ms, _, _ = mpf.optimize(ms, action, obs, bw=0.3,
                                    n_steps=inner_steps)
            return ms, ()

        ms, _ = jax.lax.scan(body, ms, jax.random.split(key, outer))
        return ms.x

    def run(i):
        return run_outer(jax.random.key(i), mstate)

    best = _time_best(run, repeats)
    return outer / best  # conditioned posterior updates (solves)/s


def bench_particle_large(steps, repeats):
    """BASELINE config #4 at scale: particle navigation with 16 policy
    particles x 512 action samples x 8 param samples rollouts per solve
    and a 2048-particle dynamics posterior (FusedMPF streaming kernels)."""
    import optax

    from dust_tpu.inference.mpf import FusedMPF

    config = load_config(ROOT / "demo/particle_config.yaml")
    config["exp_params"].update(
        n_particles=16, action_samples=512, params_samples=8,
        mpf_n_particles=2048, mpf_steps=20,
    )
    stack = build_particle_stack(config, jax.random.key(0))
    stack.mpf = FusedMPF(
        likelihood=stack.mpf.likelihood,
        optimizer=optax.sgd(config["exp_params"]["mpf_learning_rate"]),
        n_steps=20,
    )
    episode = jax.jit(particle_episode_fn(
        stack.model, stack.controller, svmpc=stack.svmpc, mpf=stack.mpf,
        dyn_dist=stack.dynamics_prior, load=stack.load, steps=steps,
        warm_up=0, mpf_bw=stack.mpf_bw, mpf_steps=20,
    ))
    svstate = stack.svmpc.init_state(stack.init_policies, stack.policies_prior)
    mstate = stack.mpf.init_state(
        stack.mpf_init, stack.init_state, 2, bw=stack.mpf_init_bw
    )
    dstate = stack.controller.init_state()

    def run(i):
        out = episode(jax.random.key(i), stack.init_state, dstate, svstate,
                      mstate, jnp.float32(2.0))
        return out[3]

    best = _time_best(run, repeats)
    return steps / best


def bench_sweep(n_scenarios, steps, repeats, fused=False):
    """Scenario-sweep throughput: N full episodes batched on this chip.
    `fused=True` vmaps the fused-Pallas rollout+cost and MPF kernels over
    the scenario axis (each lifts to a leading Mosaic grid dimension)."""
    from dust_tpu.parallel.sweep import ScenarioSweep, broadcast_scenarios

    # NB: sweeps use the fused ROLLOUT kernel, not the whole-solve kernel
    # — measured at n=128-256 the solve kernel LOSES (40.0k vs 42.2k
    # pendulum, 38.3k vs 50.9k particle): with 100+ scenarios vmapped,
    # XLA batches the inter-kernel glue into wide ops and the launch gaps
    # the solve kernel exists to remove are already amortized, while its
    # per-particle unrolled matmuls serialize. Whole-solve fusion is a
    # latency optimization (single episode), not a throughput one.
    config = load_config(ROOT / "demo/pendulum_config.yaml")
    if fused:
        config["exp_params"]["fused_rollout"] = True
    stack = build_pendulum_stack(config, jax.random.key(0), case="dust")
    if fused:
        from dust_tpu.inference.mpf import FusedPendulumMPF

        exp = config["exp_params"]
        stack.mpf = FusedPendulumMPF(
            likelihood=stack.mpf.likelihood,
            lr=exp["mpf_learning_rate"],
            n_steps=exp["mpf_steps"],
            bw_scale=exp["mpf_bandwidth_scaling"],
            interpret=jax.default_backend() != "tpu",
        )
    harness = PendulumSimulation(
        controller=stack.controller, svmpc=stack.svmpc, mpf=stack.mpf,
        model=stack.model, steps=steps, warm_up=0,
        mpf_bw=stack.mpf_bw, mpf_steps=stack.mpf_steps,
    )
    sweep = ScenarioSweep(harness, stack.dynamics_prior, mesh=None)
    n = n_scenarios
    true_params = {
        "length": jnp.linspace(0.7, 1.2, n),
        "mass": jnp.linspace(1.2, 0.7, n),
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

    def run(i):
        keys = jax.random.split(jax.random.key(i), n)
        return sweep.run(keys, true_params, init_obs, dstate, svstate,
                         mstate)["avg_cum_cost"]

    best = _time_best(run, repeats)
    return n * steps / best, n / best  # solves/s, episodes/s


def bench_particle_sweep(n_scenarios, steps, repeats, fused=False):
    """Particle scenario-sweep throughput: N full obstacle-navigation
    episodes (per-lane true masses) batched on this chip. `fused=True`
    vmaps the fused-Pallas rollout+cost and mass-posterior kernels over
    the scenario axis."""
    from dust_tpu.parallel.sweep import (
        ParticleScenarioSweep,
        broadcast_scenarios,
    )

    # fused rollout, not fused solve — see bench_sweep's note
    config = load_config(ROOT / "demo/particle_config.yaml")
    if fused:
        config["exp_params"]["fused_rollout"] = True
    stack = build_particle_stack(config, jax.random.key(0))
    if fused:
        from dust_tpu.inference.mpf import FusedParticleMPF

        exp = config["exp_params"]
        stack.mpf = FusedParticleMPF(
            likelihood=stack.mpf.likelihood,
            lr=exp["mpf_learning_rate"],
            bw_scale=exp["mpf_bandwidth_scaling"],
            n_steps=exp["mpf_steps"],
        )
    episode = particle_episode_fn(
        stack.model, stack.controller, svmpc=stack.svmpc, mpf=stack.mpf,
        dyn_dist=stack.dynamics_prior, load=stack.load, steps=steps,
        warm_up=0, mpf_bw=stack.mpf_bw, mpf_steps=stack.mpf_steps,
    )
    sweep = ParticleScenarioSweep(episode, mesh=None)
    n = n_scenarios
    keys = jax.random.split(jax.random.key(0), n)
    state0 = jnp.broadcast_to(stack.init_state, (n, 4))
    dstate = broadcast_scenarios(stack.controller.init_state(), n)
    svstate = broadcast_scenarios(
        stack.svmpc.init_state(stack.init_policies, stack.policies_prior), n
    )
    mstate = broadcast_scenarios(
        stack.mpf.init_state(stack.mpf_init, stack.init_state, 2,
                             bw=stack.mpf_init_bw), n
    )
    masses = jnp.linspace(1.5, 3.0, n)

    def run(i):
        ks = jax.random.split(jax.random.key(i), n)
        return sweep.run(ks, state0, dstate, svstate, mstate,
                         masses)["cum_cost"]

    best = _time_best(run, repeats)
    return n * steps / best, n / best  # solves/s, episodes/s


def bench_generic_scan(model, inst_cost, dim_s, dim_a, a_cov, obs0,
                       steps, repeats, m=3, hz=30, n_act=128, lr=0.5):
    """Generic-path episode scan on a NON-demo model (VERDICT r1 #6):
    the same SVMPC + MultiDisco machinery the demo tasks use, with NO
    hand-fused kernels — whole closed-loop episodes as one lax.scan
    device program, CHAIN episodes chained per dispatch. Proves the
    framework's throughput is architectural (jit + scan + batched
    rollouts), not two hand-tuned megakernels. Shapes match the
    pendulum demo scale (m x n_act x hz rollouts per solve)."""
    import optax

    from dust_tpu.controllers import MultiDisco
    from dust_tpu.distributions import GMM
    from dust_tpu.inference import ExponentiatedUtility, SVMPC
    from dust_tpu.spaces import Box

    ctrl = MultiDisco(
        observation_space=Box(dim=dim_s),
        action_space=Box(dim=dim_a, low=-1.0, high=1.0),
        hz_len=hz, n_policies=m, action_samples=n_act,
        a_cov=a_cov * jnp.eye(dim_a),
        inst_cost_fn=inst_cost, term_cost_fn=inst_cost,
        params_sampling="none",
    )
    lik = ExponentiatedUtility(alpha=1.0, n_samples=n_act,
                               controller=ctrl, model=model)
    svmpc = SVMPC(likelihood=lik, n_particles=m, ctrl_dim=dim_a,
                  optimizer=optax.sgd(lr))
    theta0 = jnp.zeros((m, hz, dim_a))
    prior = GMM.from_cov(theta0, jnp.ones(m), a_cov * jnp.eye(dim_a))
    sv0 = svmpc.init_state(theta0, prior)
    ds0 = ctrl.init_state()
    obs0 = jnp.asarray(obs0, jnp.float32).reshape(1, dim_s)

    def episode_scalar(key):
        def step_fn(carry, _):
            key, obs, sv, ds = carry
            key, k_opt, k_fwd = jax.random.split(key, 3)
            sv, ds, costs = svmpc.optimize(sv, ds, obs, None, k_opt)
            sv, a_seq, _ = svmpc.forward(sv, costs, key=k_fwd)
            obs = model.step(obs, a_seq[0][None])
            return (key, obs, sv, ds), jnp.min(costs)

        (_, obs, _, _), cmin = jax.lax.scan(
            step_fn, (key, obs0, sv0, ds0), None, length=steps
        )
        return jnp.sum(cmin) + jnp.sum(obs) * 0.0

    best = _time_chained_episodes(episode_scalar, repeats)
    return steps / best


def bench_cartpole_scan(steps, repeats):
    """CartPole balance through the generic episode-scan stack (the
    reference's cartpole cannot run at all — SURVEY §7.2.2)."""
    from dust_tpu.models import CartPoleModel

    def inst(s, a=None, **_):
        return (10.0 * s[..., 2] ** 2 + 0.1 * s[..., 0] ** 2
                + 0.1 * s[..., 3] ** 2)

    return bench_generic_scan(
        CartPoleModel(dt=0.02), inst, dim_s=4, dim_a=1, a_cov=0.25,
        obs0=[0.0, 0.0, 0.15, 0.0], steps=steps, repeats=repeats,
    )


def bench_skid_steer_scan(steps, repeats):
    """Skid-steer waypoint drive through the generic episode-scan
    stack (2-D control)."""
    from dust_tpu.models import SkidSteerRobot

    target = jnp.array([1.0, 0.5])

    def inst(s, a=None, **_):
        return jnp.sum((s[..., :2] - target) ** 2, axis=-1)

    return bench_generic_scan(
        SkidSteerRobot(delta_t=0.1), inst, dim_s=5, dim_a=2,
        a_cov=0.04, obs0=[0.0] * 5, steps=steps, repeats=repeats,
        hz=15,
    )


def bench_particle_sweep_mega(n_scenarios, steps, repeats):
    """Scenario-batched particle sweep megakernel
    (ops/pallas_particle_sweep_episode.py, r2): groups of S
    obstacle-navigation episodes per Pallas program, lax.scan over
    groups — the particle-task counterpart of bench_sweep_mega.
    S = 16 since r4 (widened scenario tiles, measured +3.5-6% over
    S = 8 at n >= 256; BENCH_SWEEP_S=8 restores the r1-r3 layout)."""
    from dust_tpu.simulation import megakernel_particle_sweep_fn

    # r5 multi-chain (ported from the pendulum sweep kernel): CH
    # independent episode-chains per Pallas program. The particle
    # ladder's winner is S=8 x CH=4 — S=8 x CH=4 beats S=16 at every n
    # (433.9k vs 403.3k at n=2048) and S=16 x CH=4 exceeds the remote
    # compiler's ceiling; BASELINE "r5 multi-chain verdict (particle)"
    # has the measured ladder.
    S = min(int(os.environ.get("BENCH_SWEEP_S", "8")), n_scenarios)
    CH = int(os.environ.get("BENCH_SWEEP_CHAINS", "4"))
    while S * CH > n_scenarios and CH > 1:
        CH //= 2
    groups = max(1, n_scenarios // (S * CH))
    n = S * CH * groups
    config = load_config(ROOT / "demo/particle_config.yaml")
    stack = build_particle_stack(config, jax.random.key(0))
    sweep = megakernel_particle_sweep_fn(
        stack, config["exp_params"], steps=steps, n_sc=S, unroll=True,
        n_chains=CH,
    )
    masses = jnp.linspace(1.6, 2.4, S)

    @jax.jit
    def run_groups(seeds):
        return jax.lax.scan(
            lambda _, sd: (0, sweep(sd, masses)["cum"]), 0, seeds
        )[1]

    def run(i):
        seeds = jnp.stack(
            [jnp.full((groups,), i, jnp.int32),
             jnp.arange(groups, dtype=jnp.int32) * 1000], axis=1
        )
        return run_groups(seeds)

    best = _time_best(run, repeats)
    return n * steps / best, n / best


def bench_pendulum_mega(steps, repeats):
    """Whole-episode megakernel (ops/pallas_episode.py): the entire
    dual-inference episode is ONE Pallas program with in-kernel
    hardware-PRNG noise — the bench.py headline path."""
    from dust_tpu.simulation import megakernel_pendulum_episode_fn

    config = load_config(ROOT / "demo/pendulum_config.yaml")
    stack = build_pendulum_stack(config, jax.random.key(0), case="dust")
    episode = megakernel_pendulum_episode_fn(
        stack, config["exp_params"], steps=steps, warm_up=0
    )

    def episode_scalar(seed2):
        return episode(seed2)["cost"][-1]

    best = _time_chained_episodes_seeded(episode_scalar, repeats)
    return steps / best


def bench_particle_mega(steps, repeats):
    """Particle-navigation whole-episode megakernel
    (ops/pallas_particle_episode.py)."""
    from dust_tpu.simulation import megakernel_particle_episode_fn

    config = load_config(ROOT / "demo/particle_config.yaml")
    stack = build_particle_stack(config, jax.random.key(0))
    episode = megakernel_particle_episode_fn(
        stack, config["exp_params"], steps=steps, warm_up=0
    )

    def episode_scalar(seed2):
        return episode(seed2)["cum"][-1]

    best = _time_chained_episodes_seeded(episode_scalar, repeats)
    return steps / best


def _time_chained_episodes_seeded(episode_scalar, repeats, chain=None):
    """`_time_chained_episodes` for megakernel episodes, which take an
    int32 [2] seed instead of a jax PRNG key."""
    chain = CHAIN if chain is None else chain

    @jax.jit
    def chained(seeds):
        def body(acc, s):
            return acc + episode_scalar(s), ()

        tot, _ = jax.lax.scan(body, jnp.float32(0.0), seeds)
        return tot

    def run(i):
        seeds = jnp.stack(
            [jnp.full((chain,), i, jnp.int32),
             jnp.arange(chain, dtype=jnp.int32)], axis=1
        )
        return chained(seeds)

    return _time_best(run, repeats) / chain


def bench_sweep_mega(n_scenarios, steps, repeats, svmpc_only=False):
    """Scenario-batched sweep megakernel (ops/pallas_sweep_episode.py):
    groups of 8 episodes per Pallas program, lax.scan over groups —
    the sweep-scale counterpart of pendulum_dust_mega. svmpc_only
    degenerates to the SV-MPC single-posterior case (BASELINE.json
    config #1 at sweep scale)."""
    from dust_tpu.simulation import megakernel_pendulum_sweep_fn

    S = min(8, n_scenarios)
    groups = max(1, n_scenarios // S)
    n = S * groups
    config = load_config(ROOT / "demo/pendulum_config.yaml")
    stack = build_pendulum_stack(
        config, jax.random.key(0),
        case="svmpc" if svmpc_only else "dust",
    )
    # unroll=True matches bench.py headline conditions (r1 measured
    # this config rolled at n=64 — both confounds behind the apparent
    # svmpc-only-slower-than-dual inversion, resolved by
    # bench/probes/inversion_probe.py r2: back-to-back unrolled at
    # n=256, dual 296.4k < dual_np1 366.0k < dual_mpf0 476.4k <
    # svmpc_only 760.8k solves/s — monotone in work). The rolled body
    # also no longer compiles on TPU (Mosaic relayout error on the
    # fori_loop carry); it remains CPU/interpret-only for tests.
    sweep = megakernel_pendulum_sweep_fn(
        stack, config["exp_params"], steps=steps, n_sc=S,
        unroll=True, svmpc_only=svmpc_only,
    )
    lens = jnp.linspace(0.8, 1.2, S)
    mass = jnp.linspace(0.9, 1.1, S)

    @jax.jit
    def run_groups(seeds):
        def body(_, s):
            return 0, sweep(s, lens, mass)["cost"]

        _, costs = jax.lax.scan(body, 0, seeds)
        return costs

    def run(i):
        seeds = jnp.stack(
            [jnp.full((groups,), i, jnp.int32),
             jnp.arange(groups, dtype=jnp.int32) * 1000], axis=1
        )
        return run_groups(seeds)

    best = _time_best(run, repeats)
    return n * steps / best, n / best


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true")
    parser.add_argument("--only", default=None)
    args = parser.parse_args()
    steps = 50 if args.quick else 200
    repeats = 2 if args.quick else 3
    dev = str(jax.devices()[0])

    runs = {
        "pendulum_dust_mega": lambda: bench_pendulum_mega(steps, repeats),
        "particle_dust_mega": lambda: bench_particle_mega(steps, repeats),
        "pendulum_dust": lambda: bench_pendulum(
            "dust", steps, repeats, fused_mpf=True, fused_solve=True
        ),
        "pendulum_dust_plain": lambda: bench_pendulum("dust", steps, repeats),
        "pendulum_svmpc": lambda: bench_pendulum(
            "svmpc", steps, repeats, fused_solve=True
        ),
        "pendulum_svmpc_plain": lambda: bench_pendulum(
            "svmpc", steps, repeats
        ),
        "particle_dust": lambda: bench_particle(
            steps, repeats, fused_mpf=True, fused_solve=True
        ),
        "particle_dust_plain": lambda: bench_particle(steps, repeats),
        "mpf_large_m2048": lambda: bench_mpf_large(
            2048, 20, 20 if args.quick else 50, repeats
        ),
        "mpf_large_m2048_fused": lambda: bench_mpf_large(
            2048, 20, 20 if args.quick else 50, repeats, fused=True
        ),
        "mpf_large_m8192_fused": lambda: bench_mpf_large(
            8192, 20, 10 if args.quick else 20, repeats, fused=True
        ),
        "mpf_large_m8192": lambda: bench_mpf_large(
            8192, 20, 10 if args.quick else 20, repeats
        ),
        "mpf_large_m32768_fused": lambda: bench_mpf_large(
            32768, 20, 3 if args.quick else 6, repeats, fused=True
        ),
        "particle_large": lambda: bench_particle_large(
            20 if args.quick else 50, repeats
        ),
        "cartpole_scan": lambda: bench_cartpole_scan(steps, repeats),
        "skid_steer_scan": lambda: bench_skid_steer_scan(steps, repeats),
    }
    for name, fn in runs.items():
        if args.only and name not in args.only.split(","):
            continue
        try:
            solves = fn()
        except Exception as exc:  # one config must not kill the run
            print(json.dumps({"config": name, "error":
                              f"{type(exc).__name__}: {exc}"[:400],
                              "device": dev}))
            continue
        print(json.dumps({"config": name,
                          "solves_per_s": round(solves, 2),
                          "device": dev}))

    n = 16 if args.quick else 64
    sweeps = {
        f"sweep_mega_n{n}": lambda: bench_sweep_mega(n, steps, repeats),
        f"svmpc_sweep_mega_n{n}": lambda: bench_sweep_mega(
            n, steps, repeats, svmpc_only=True
        ),
        f"sweep_n{n}": lambda: bench_sweep(n, steps, repeats, fused=True),
        f"sweep_n{n}_plain": lambda: bench_sweep(n, steps, repeats),
        f"particle_sweep_mega_n{n}": lambda: bench_particle_sweep_mega(
            n, steps, repeats
        ),
        f"particle_sweep_n{n}": lambda: bench_particle_sweep(
            n, steps, repeats, fused=True
        ),
        f"particle_sweep_n{n}_plain": lambda: bench_particle_sweep(
            n, steps, repeats
        ),
    }
    for name, fn in sweeps.items():
        if args.only and not name.startswith(args.only):
            continue
        try:
            solves, episodes = fn()
        except Exception as exc:  # one config must not kill the run
            print(json.dumps({"config": name, "error":
                              f"{type(exc).__name__}: {exc}"[:400],
                              "device": dev}))
            continue
        print(json.dumps({
            "config": name,
            "solves_per_s": round(solves, 2),
            "episodes_per_s": round(episodes, 3),
            "device": dev,
        }))


if __name__ == "__main__":
    main()
