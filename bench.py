"""Benchmark: DuSt-MPC dual-inference solves/s on one TPU chip.

Headline workload = BASELINE.json config #3 at the reference demo shapes
(`demo/pendulum_config.yaml`): per MPC solve, 1 SVMPC SVGD step over
8 params x 128 action samples x 3 policies x horizon-30 batched rollouts
plus selection/roll/prior refresh, then 20 MPF SVGD steps on 50 dynamics
particles — the exact per-step work `bench/reference_bench.py` times for
the torch reference on CPU (measured there: see BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "solves/s", "vs_baseline": N}

Modes timed:
  * sweep megakernel (headline, BENCH_EPISODE=sweep default): the
    scenario-batched whole-episode megakernel — 8 independent episodes
    (per-scenario true parameters and seeds) advance in lockstep inside
    ONE Pallas program (ops/pallas_sweep_episode.py), lax.scan over
    BENCH_SWEEP_N/8 groups per dispatch — the chip-throughput view;
  * episode megakernel (BENCH_EPISODE=mega): one closed-loop episode —
    every SVMPC solve, simulator step and MPF update — per Pallas
    program with in-kernel hardware-PRNG noise (ops/pallas_episode.py)
    — the single-episode latency view;
  * episode-scan (BENCH_EPISODE=scan): per-step fused kernels chained by
    a lax.scan — the bitwise path the equivalence tests pin;
  * per-step dispatch (opt-in: BENCH_PER_STEP=1, costs a second ~4-min
    compile): one jitted solve per host call — the real-time replanning
    latency view.

MPF implementation knob: BENCH_MPF=fused (default, single-Pallas-kernel
posterior update — 1.4x end-to-end) | plain (jax.grad VJP path) | cf
(closed-form jnp gradient). BENCH_MPF_UNROLL only affects plain|cf (the
fused kernel has no scan to unroll).
"""

import json
import os
import time

import jax
import jax.numpy as jnp

from dust_tpu.experiments import build_pendulum_stack, load_config
from dust_tpu.simulation import PendulumSimulation
from dust_tpu.utils.cache import enable_persistent_cache

# Megakernel compiles cost 8-15 min on the remote AOT compiler; the
# persistent cache turns re-runs of unchanged programs into disk loads.
enable_persistent_cache()

# torch CPU reference, measured by bench/reference_bench.py on this
# machine (anomaly detection off; best of 20/60/120-step runs — the
# most conservative denominator). Override with BASELINE_SOLVES.
REFERENCE_SOLVES_PER_S = float(os.environ.get("BASELINE_SOLVES", "5.082"))

STEPS = int(os.environ.get("BENCH_STEPS", "200"))
REPEATS = int(os.environ.get("BENCH_REPEATS", "3"))
# Episodes chained inside ONE device program per timed dispatch. The
# axon tunnel charges a flat per-dispatch overhead (measured 2-28 ms
# depending on server load — a trivial 1-leaf jit call pays the same),
# which at CHAIN=1 is mixed into the throughput number and tracks
# tunnel weather, not the solver. CHAIN=4 amortizes it to <2% of the
# measurement. BENCH_CHAIN=1 restores the per-dispatch view.
CHAIN = int(os.environ.get("BENCH_CHAIN", "4"))

# set by bench_episode_sweep: wall time of the first (compiling) dispatch
FIRST_COMPILE_S = None


def build(key):
    config = load_config(
        os.path.join(os.path.dirname(__file__), "demo/pendulum_config.yaml")
    )
    if "BENCH_UNROLL" in os.environ:
        config["exp_params"]["scan_unroll"] = int(os.environ["BENCH_UNROLL"])
    if "BENCH_MPF_UNROLL" in os.environ:
        config["exp_params"]["mpf_scan_unroll"] = int(
            os.environ["BENCH_MPF_UNROLL"]
        )
    # Pallas fused rollout+cost kernel (ops/pallas_rollout.py) instead of
    # the lax.scan rollout — measured 3510 vs 3247 solves/s with the
    # fused MPF. BENCH_ROLLOUT=plain restores the scan path.
    config["exp_params"]["fused_rollout"] = (
        os.environ.get("BENCH_ROLLOUT", "fused") == "fused"
    )
    # whole-SVMPC-solve Pallas kernel (ops/pallas_solve.py): sampling
    # epilogue, rollouts, costs, DISCO update, Stein step, selection and
    # roll in ONE program (subsumes the fused rollout on its path).
    # BENCH_SOLVE=plain restores the per-op path.
    config["exp_params"]["fused_solve"] = (
        os.environ.get("BENCH_SOLVE", "fused") == "fused"
    )
    stack = build_pendulum_stack(config, key, case="dust")
    # MPF implementation: "fused" (default — the single-Pallas-kernel
    # posterior update wins ~1.4x end-to-end: 3.3k vs 2.3k solves/s),
    # "plain" (jax.grad VJP path), or "cf" (closed-form jnp gradient).
    mpf_impl = os.environ.get("BENCH_MPF", "fused")
    if mpf_impl not in ("fused", "plain", "cf"):
        raise SystemExit(f"BENCH_MPF must be fused|plain|cf, got {mpf_impl!r}")
    if os.environ.get("BENCH_CF_MPF") == "1":       # legacy knobs
        mpf_impl = "cf"
    if os.environ.get("BENCH_FUSED_MPF") == "1":
        mpf_impl = "fused"
    if mpf_impl == "cf":
        from dust_tpu.inference.mpf import ClosedFormPendulumMPF

        stack.mpf = ClosedFormPendulumMPF(
            likelihood=stack.mpf.likelihood,
            lr=config["exp_params"]["mpf_learning_rate"],
            n_steps=config["exp_params"]["mpf_steps"],
            bw_scale=config["exp_params"]["mpf_bandwidth_scaling"],
            scan_unroll=config["exp_params"].get("mpf_scan_unroll", 1),
        )
    elif mpf_impl == "fused":
        from dust_tpu.inference.mpf import FusedPendulumMPF

        stack.mpf = FusedPendulumMPF(
            likelihood=stack.mpf.likelihood,
            lr=config["exp_params"]["mpf_learning_rate"],
            n_steps=config["exp_params"]["mpf_steps"],
            bw_scale=config["exp_params"]["mpf_bandwidth_scaling"],
            interpret=jax.default_backend() != "tpu",
        )
    harness = PendulumSimulation(
        controller=stack.controller,
        svmpc=stack.svmpc,
        mpf=stack.mpf,
        model=stack.model,
        steps=STEPS,
        warm_up=0,
        mpf_bw=stack.mpf_bw,
        mpf_steps=stack.mpf_steps,
    )
    return config, stack, harness


def bench_episode_sweep(stack, config):
    """Scenario-batched sweep megakernel (ops/pallas_sweep_episode.py):
    S independent episodes per Pallas program (per-scenario true
    parameters spanning the robustness range, per-scenario seeds /
    bandwidths / MPF posteriors), lax.scan over BENCH_SWEEP_N/S groups
    in one dispatch. The headline chip-throughput view; unrolled inner
    loops are ~6% faster since the glue slimming (BENCH_SWEEP_UNROLL=0
    restores the rolled body). S defaults to 16 (r4): the group-step is
    substantially LATENCY-bound (13.3/17.3/22.8/34.0 us at S=2/4/8/16
    measured back-to-back), so the widened scenario tiles buy ~17%
    end-to-end over S=8 (470k vs 402k solves/s at 1024 episodes per
    dispatch); BENCH_SWEEP_S=8 restores the r1-r3 layout."""
    from dust_tpu.simulation import megakernel_pendulum_sweep_fn

    n_sweep = int(os.environ.get("BENCH_SWEEP_N", "256"))
    S = int(os.environ.get("BENCH_SWEEP_S", "16"))
    # Multi-chain: CH independent episode-chains per Pallas program,
    # with the chains' 20-iteration MPF loops JOINTLY interleaved at
    # iteration granularity (r5, "joint-MPF" — the dominant serial
    # section overlaps across chains). CH=2 is the measured best at
    # the n=256 headline batch (427.2k vs CH=4's 416.1k) and CH=3 the
    # n>=1024 peak (543.8k at n=4096) — full ladder in BASELINE
    # "r5 multi-chain verdict"; CH=8 uncompilable at S=16.
    # BENCH_SWEEP_CHAINS=1 restores one chain.
    CH = int(os.environ.get("BENCH_SWEEP_CHAINS", "2"))
    groups = max(1, n_sweep // (S * CH))
    sweep = megakernel_pendulum_sweep_fn(
        stack, config["exp_params"], steps=STEPS, n_sc=S, warm_up=0,
        unroll=os.environ.get("BENCH_SWEEP_UNROLL", "1") == "1",
        n_chains=CH,
    )
    lens = jnp.linspace(0.8, 1.2, S)
    mass = jnp.linspace(0.9, 1.1, S)

    @jax.jit
    def chained(seeds):
        def body(_, s):
            return 0, sweep(s, lens, mass)["cost"]

        _, costs = jax.lax.scan(body, 0, seeds)
        return costs  # [groups, STEPS, S]

    def run(i):
        seeds = jnp.stack(
            [jnp.full((groups,), i, jnp.int32),
             jnp.arange(groups, dtype=jnp.int32) * 1000], axis=1
        )
        return chained(seeds)

    global FIRST_COMPILE_S
    t0 = time.perf_counter()
    costs = run(0)
    costs.block_until_ready()  # compile + warm
    # wall time of the first dispatch = megakernel compile (minutes on
    # the remote AOT path; seconds when the persistent cache hits)
    FIRST_COMPILE_S = time.perf_counter() - t0
    times = []
    for i in range(REPEATS):
        t0 = time.perf_counter()
        costs = run(i + 1)
        costs.block_until_ready()
        times.append(time.perf_counter() - t0)
    best = min(times)
    # -> [episodes, STEPS] for the swing-up sanity check
    import numpy as np

    # [groups(, CH), STEPS, S] -> [episodes, STEPS]
    costs = np.asarray(costs)
    costs = np.moveaxis(costs, -1, -2).reshape(-1, STEPS)
    return groups * S * CH * STEPS / best, costs


def bench_episode_mega(stack, config):
    """Whole-episode megakernel (ops/pallas_episode.py): every MPC step
    of the episode — SVMPC solve, simulator, MPF update — is one Pallas
    program with in-kernel hardware-PRNG noise; CHAIN fresh episodes
    are chained per dispatch. The bench default (BENCH_EPISODE=scan
    restores the per-step-kernel episode scan)."""
    from dust_tpu.simulation import megakernel_pendulum_episode_fn

    episode = megakernel_pendulum_episode_fn(
        stack, config["exp_params"], steps=STEPS, warm_up=0
    )

    @jax.jit
    def chained(seeds):
        def body(_, s):
            return 0, episode(s)["cost"]

        _, costs = jax.lax.scan(body, 0, seeds)
        return costs  # [CHAIN, STEPS]

    def run(i):
        seeds = jnp.stack(
            [jnp.full((CHAIN,), i, jnp.int32),
             jnp.arange(CHAIN, dtype=jnp.int32)], axis=1
        )
        return chained(seeds)

    costs = run(0)
    costs.block_until_ready()  # compile + warm
    times = []
    for i in range(REPEATS):
        t0 = time.perf_counter()
        costs = run(i + 1)
        costs.block_until_ready()
        times.append(time.perf_counter() - t0)
    best = min(times)
    return CHAIN * STEPS / best, costs


def bench_episode_scan(stack, harness):
    """Whole-episode scan: STEPS MPC solves in one device program,
    CHAIN fresh episodes chained per dispatch (see CHAIN above)."""
    episode = harness.episode_fn(stack.dynamics_prior)
    true_params = {"length": jnp.float32(1.0), "mass": jnp.float32(1.0)}
    init_obs = stack.init_state.reshape(1, -1)
    dstate = stack.controller.init_state(stack.init_policies)
    svstate = stack.svmpc.init_state(stack.init_policies,
                                     stack.policies_prior)
    mstate = stack.mpf.init_state(stack.mpf_init, stack.init_state, 1)

    @jax.jit
    def chained(keys):
        def body(_, k):
            __, logs = episode(
                k, true_params, init_obs, dstate, svstate, mstate
            )
            return 0, logs[2]  # per-step costs

        _, costs = jax.lax.scan(body, 0, keys)
        return costs  # [CHAIN, STEPS]

    def run(i):
        return chained(jax.random.split(jax.random.key(i), CHAIN))

    costs = run(0)
    costs.block_until_ready()  # compile + warm
    times = []
    for i in range(REPEATS):
        t0 = time.perf_counter()
        costs = run(i + 1)
        costs.block_until_ready()
        times.append(time.perf_counter() - t0)
    best = min(times)
    return CHAIN * STEPS / best, costs


def bench_per_step_mega(stack, config):
    """Real-time replanning latency view at megakernel granularity
    (VERDICT r1 #5): a steps=1 whole-solve episode megakernel —
    SVMPC optimize + forward + simulator + 20-step MPF update in ONE
    Pallas program — measured two ways:

    * device_us_per_solve: DEVICE_REPS fresh solves chained by lax.scan
      inside one dispatch — the on-chip per-solve latency, tunnel
      excluded (the deployment-relevant number for a co-located host);
    * per_step_dispatch_solves_per_s: one host dispatch per solve —
      the through-the-tunnel replanning rate (dominated by the axon
      tunnel's flat 2-28 ms per-dispatch overhead; on a co-located host
      PCIe dispatch is ~100 us).

    Compile cost is seconds (steps=1), vs ~4 min for the full per-step
    jit program the opt-in BENCH_PER_STEP=1 view times — so this runs
    in the default bench.
    """
    from dust_tpu.simulation import megakernel_pendulum_episode_fn

    episode = megakernel_pendulum_episode_fn(
        stack, config["exp_params"], steps=1, warm_up=0
    )
    reps = int(os.environ.get("BENCH_DEVICE_REPS", "512"))

    @jax.jit
    def chained(seeds):
        def body(_, s):
            return 0, episode(s)["cost"]

        _, costs = jax.lax.scan(body, 0, seeds)
        return costs  # [reps, 1]

    def run(i):
        seeds = jnp.stack(
            [jnp.full((reps,), i, jnp.int32),
             jnp.arange(reps, dtype=jnp.int32)], axis=1
        )
        return chained(seeds)

    run(0).block_until_ready()  # compile + warm
    best = float("inf")
    for i in range(REPEATS):
        t0 = time.perf_counter()
        run(i + 1).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    device_us = best / reps * 1e6

    @jax.jit
    def one(seed):
        return episode(seed)["cost"]

    one(jnp.array([0, 0], jnp.int32)).block_until_ready()
    n = 50
    t0 = time.perf_counter()
    for i in range(n):
        one(jnp.array([1, i], jnp.int32)).block_until_ready()
    dispatch_rate = n / (time.perf_counter() - t0)
    return device_us, dispatch_rate


def bench_per_step(stack, harness):
    """One jitted solve per host dispatch (replanning latency view)."""

    @jax.jit
    def solve(key, true_params, obs, dstate, svstate, mstate):
        # one full solve: svmpc optimize + forward + sim step + mpf update
        k_opt, k_fwd = jax.random.split(key)
        svstate2, dstate2, costs = stack.svmpc.optimize(
            svstate, dstate, obs, mstate.prior, k_opt
        )
        svstate2, a_seq, _ = stack.svmpc.forward(svstate2, costs, key=k_fwd)
        action = a_seq[0]
        obs2 = harness.sim_model.step(obs, action[None], true_params)
        mstate2, _, _ = stack.mpf.optimize(
            mstate, action, obs2[0], bw=stack.mpf_bw,
            n_steps=stack.mpf_steps,
        )
        return obs2, dstate2, svstate2, mstate2

    true_params = {"length": jnp.float32(1.0), "mass": jnp.float32(1.0)}
    obs = stack.init_state.reshape(1, -1)
    dstate = stack.controller.init_state(stack.init_policies)
    svstate = stack.svmpc.init_state(stack.init_policies, stack.policies_prior)
    mstate = stack.mpf.init_state(stack.mpf_init, stack.init_state, 1)

    key = jax.random.key(0)
    obs2, dstate, svstate, mstate = solve(
        key, true_params, obs, dstate, svstate, mstate
    )
    obs2.block_until_ready()
    n = 50
    t0 = time.perf_counter()
    for i in range(n):
        key, k = jax.random.split(key)
        obs, dstate, svstate, mstate = solve(
            k, true_params, obs, dstate, svstate, mstate
        )
    obs.block_until_ready()
    return n / (time.perf_counter() - t0)


def main():
    key = jax.random.key(0)
    config, stack, harness = build(key)

    # BENCH_EPISODE=sweep (default): scenario-batched sweep megakernel;
    # BENCH_EPISODE=mega: single whole-episode megakernel;
    # BENCH_EPISODE=scan: per-step-kernel episode scan (the BENCH_MPF /
    # BENCH_SOLVE / BENCH_ROLLOUT knobs apply to this mode)
    mode = os.environ.get("BENCH_EPISODE", "sweep")
    if mode == "sweep":
        try:
            scan_solves, costs = bench_episode_sweep(stack, config)
        except Exception as e:  # pragma: no cover - device-side fallback
            # never let the headline bench die on a kernel-lowering
            # regression: fall back to the single-episode megakernel
            import sys

            print(f"sweep mode failed ({type(e).__name__}: {e}); "
                  "falling back to mega", file=sys.stderr)
            mode = "mega(fallback)"
            scan_solves, costs = bench_episode_mega(stack, config)
    elif mode == "mega":
        scan_solves, costs = bench_episode_mega(stack, config)
    elif mode == "scan":
        scan_solves, costs = bench_episode_scan(stack, harness)
    else:
        raise SystemExit(
            f"BENCH_EPISODE must be sweep|mega|scan, got {mode!r}"
        )
    # real-time latency views. The megakernel one (steps=1 program,
    # seconds of compile) runs by default; the full per-step jit program
    # (~4 min compile) stays opt-in behind BENCH_PER_STEP=1.
    device_us = dispatch_rate = None
    if os.environ.get("BENCH_LATENCY", "1") == "1":
        try:
            device_us, dispatch_rate = bench_per_step_mega(stack, config)
        except Exception as e:  # pragma: no cover - keep headline alive
            import sys

            print(f"latency view failed ({type(e).__name__}: {e})",
                  file=sys.stderr)
    step_solves = (
        bench_per_step(stack, harness)
        if os.environ.get("BENCH_PER_STEP") == "1" else None
    )

    import numpy as np

    costs_np = np.asarray(costs).reshape(-1, STEPS)
    # robust control-sanity: the swing-up must reach near-zero cost at
    # some point in the second half (single-episode tail means are noisy
    # — the chaotic loop occasionally ends mid-swing)
    swingup_cost = float(costs_np[:, STEPS // 2:].min())
    result = {
        "metric": "pendulum_dust_solves_per_s_per_chip",
        "value": round(scan_solves, 2),
        "unit": "solves/s",
        "vs_baseline": round(scan_solves / REFERENCE_SOLVES_PER_S, 2),
        "device_us_per_solve": (
            round(device_us, 2) if device_us is not None else "skipped"
        ),
        "per_step_dispatch_solves_per_s": (
            round(step_solves, 2) if step_solves is not None
            else round(dispatch_rate, 2) if dispatch_rate is not None
            else "skipped"
        ),
        "reference_solves_per_s_cpu": REFERENCE_SOLVES_PER_S,
        "episode_steps": STEPS,
        "episode_mode": mode,
        "swingup_min_cost_sanity": round(swingup_cost, 4),
        "first_compile_s": (
            round(FIRST_COMPILE_S, 1) if FIRST_COMPILE_S is not None
            else "n/a"
        ),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
