"""Per-phase timing breakdown of one DuSt solve on the current device.

Times each phase of the solve dispatch-amortized (N iterations chained
inside one jit per phase) so the breakdown reflects device time, not the
tunnel roundtrip:

  * svmpc_optimize  — 1 SVGD step: action sampling, 3072x30 rollouts,
                      costs, analytic gradients, kernel phi, SGD update
  * svmpc_forward   — weights, selection, roll, prior refresh
  * mpf_optimize    — 20 MPF SVGD steps on 50 dynamics particles
  * sim_step        — simulator transition

Run: python bench/bench_phases.py
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from dust_tpu.experiments import build_pendulum_stack, load_config
from dust_tpu.simulation import PendulumSimulation

ROOT = Path(__file__).resolve().parent.parent
ITERS = 500


def chained(step_fn, init_carry):
    @jax.jit
    def run(key, carry):
        def body(c, k):
            return step_fn(c, k), ()

        carry2, _ = jax.lax.scan(body, carry, jax.random.split(key, ITERS))
        return carry2

    out = run(jax.random.key(0), init_carry)
    jax.block_until_ready(out)
    best = 1e9
    for i in range(3):
        t0 = time.perf_counter()
        out = run(jax.random.key(i + 1), init_carry)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best / ITERS


def main():
    import os

    config = load_config(ROOT / "demo/pendulum_config.yaml")
    # BENCH_PHASES=fused (default) measures the bench-default stack
    # (fused-Pallas rollout+cost and MPF kernels); =plain the all-XLA one.
    fused = os.environ.get("BENCH_PHASES", "fused") == "fused"
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
        model=stack.model, steps=1, warm_up=0,
        mpf_bw=stack.mpf_bw, mpf_steps=stack.mpf_steps,
    )
    obs = stack.init_state.reshape(1, -1)
    dstate = stack.controller.init_state(stack.init_policies)
    svstate = stack.svmpc.init_state(stack.init_policies, stack.policies_prior)
    mstate = stack.mpf.init_state(stack.mpf_init, stack.init_state, 1)
    tp = {"length": jnp.float32(1.0), "mass": jnp.float32(1.0)}

    def opt_step(carry, key):
        sv, ds = carry
        sv, ds, _ = stack.svmpc.optimize(sv, ds, obs, mstate.prior, key)
        return (sv, ds)

    def fwd_step(carry, key):
        sv, costs = carry
        sv, a_seq, _ = stack.svmpc.forward(sv, costs, key=key)
        return (sv, costs + 1e-6 * a_seq.sum())

    def mpf_step(ms, key):
        action = jax.random.uniform(key, (1,), minval=-2.0, maxval=2.0)
        ms, _, _ = stack.mpf.optimize(
            ms, action, obs[0], bw=stack.mpf_bw, n_steps=stack.mpf_steps
        )
        return ms

    def sim_step(o, key):
        a = jax.random.uniform(key, (1, 1), minval=-2.0, maxval=2.0)
        return harness.sim_model.step(o, a, tp)

    _, _, costs0 = stack.svmpc.optimize(
        svstate, dstate, obs, mstate.prior, jax.random.key(9)
    )

    times = {
        "svmpc_optimize_us": chained(opt_step, (svstate, dstate)),
        "svmpc_forward_us": chained(fwd_step, (svstate, costs0)),
        "mpf_optimize_us": chained(mpf_step, mstate),
        "sim_step_us": chained(sim_step, obs),
    }
    total = sum(times.values())
    out = {k: round(v * 1e6, 1) for k, v in times.items()}
    out["total_us"] = round(total * 1e6, 1)
    out["implied_solves_per_s"] = round(1.0 / total, 1)
    out["device"] = str(jax.devices()[0])
    print(json.dumps(out))


if __name__ == "__main__":
    main()
