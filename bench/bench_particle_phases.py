"""Per-phase timing breakdown of one particle-navigation DuSt solve.

Same methodology as `bench_phases.py` (dispatch-amortized: N iterations
chained inside one jit per phase), for the particle workload
(`demo/particle_config.yaml`: 4 params x 64 action samples x 6 policies
= 1536 rollouts x horizon 40, occupancy-grid collision gathers in the
dynamics and in both cost functions):

  * svmpc_optimize   — 1 SVGD step: rollouts, costs, gradients, phi
  * svmpc_forward    — weights, selection, roll, prior refresh
  * mpf_optimize     — 20 MPF SVGD steps on 50 mass particles
  * sim_step         — simulator transition
  * svmpc_optimize_noobst — same solve with obstacles disabled in the
    model AND costs: isolates what the grid gathers cost per solve.

Run: python bench/bench_particle_phases.py
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from dust_tpu.experiments import build_particle_stack, load_config

ROOT = Path(__file__).resolve().parent.parent
ITERS = 200


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


def phases(stack, only_optimize=False):
    obs = stack.init_state
    dstate = stack.controller.init_state()
    svstate = stack.svmpc.init_state(stack.init_policies,
                                     stack.policies_prior)
    mstate = stack.mpf.init_state(
        stack.mpf_init, stack.init_state, 2, bw=stack.mpf_init_bw
    )

    def opt_step(carry, key):
        sv, ds = carry
        sv, ds, _ = stack.svmpc.optimize(sv, ds, obs[None], mstate.prior,
                                         key)
        return (sv, ds)

    def fwd_step(carry, key):
        sv, costs = carry
        sv, a_seq, _ = stack.svmpc.forward(sv, costs, key=key)
        return (sv, costs + 1e-6 * a_seq.sum())

    def mpf_step(ms, key):
        action = jax.random.uniform(key, (2,), minval=-5.0, maxval=5.0)
        ms, _, _ = stack.mpf.optimize(
            ms, action, obs, bw=stack.mpf_bw, n_steps=stack.mpf_steps
        )
        return ms

    def sim_step(o, key):
        a = jax.random.uniform(key, (1, 2), minval=-10.0, maxval=10.0)
        return stack.model.step(o, a, {"mass": jnp.float32(2.0)})

    if only_optimize:
        return {"svmpc_optimize_us": chained(opt_step, (svstate, dstate))}
    _, _, costs0 = stack.svmpc.optimize(
        svstate, dstate, obs[None], mstate.prior, jax.random.key(9)
    )
    return {
        "svmpc_optimize_us": chained(opt_step, (svstate, dstate)),
        "svmpc_forward_us": chained(fwd_step, (svstate, costs0)),
        "mpf_optimize_us": chained(mpf_step, mstate),
        "sim_step_us": chained(sim_step, obs[None]),
    }


def main():
    config = load_config(ROOT / "demo/particle_config.yaml")
    stack = build_particle_stack(config, jax.random.key(0))
    times = phases(stack)
    total = sum(times.values())

    noobst = load_config(ROOT / "demo/particle_config.yaml")
    noobst["env_params"]["with_obstacle"] = False
    noobst["env_params"]["can_crash"] = False
    stack2 = build_particle_stack(noobst, jax.random.key(0))
    times["noobst_svmpc_optimize_us"] = phases(
        stack2, only_optimize=True
    )["svmpc_optimize_us"]

    out = {k: round(v * 1e6, 1) for k, v in times.items()}
    out["total_us"] = round(total * 1e6, 1)
    out["implied_solves_per_s"] = round(1.0 / total, 1)
    out["device"] = str(jax.devices()[0])
    print(json.dumps(out))


if __name__ == "__main__":
    main()
