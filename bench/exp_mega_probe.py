"""One-off probe: whole-episode megakernel (ops/pallas_episode.py) at
the bench.py headline config — solves/s + swing-up sanity on TPU."""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from dust_tpu.experiments import build_pendulum_stack, load_config
from dust_tpu.ops.pallas_episode import fused_pendulum_episode

STEPS = int(os.environ.get("BENCH_STEPS", "200"))
CHAIN = int(os.environ.get("BENCH_CHAIN", "4"))
REPEATS = 3


def main():
    config = load_config(
        os.path.join(os.path.dirname(__file__), "..",
                     "demo/pendulum_config.yaml")
    )
    exp = config["exp_params"]
    stack = build_pendulum_stack(config, jax.random.key(0), case="dust")
    m = exp["n_particles"]
    hz = exp["horizon"]

    mstate = stack.mpf.init_state(stack.mpf_init, stack.init_state, 1)
    dstate = stack.controller.init_state(stack.init_policies)

    theta0 = stack.init_policies[..., 0]
    locs0 = stack.policies_prior.locs[..., 0]
    amat0 = dstate.a_mat[..., 0]
    aseq0 = dstate.a_seq[..., 0]
    g_model = float(stack.model.params_dict["g"])

    def episode(seed):
        return fused_pendulum_episode(
            seed, stack.init_state, theta0, locs0, amat0, aseq0,
            stack.mpf_init, mstate.prior_bw,
            1.0, 1.0,  # true length/mass
            exp["ctrl_sigma"], exp["learning_rate"], exp["alpha"],
            1.0 / exp["alpha"], exp["prior_sigma"],
            exp["mpf_learning_rate"], exp["mpf_obs_std"],
            steps=STEPS, warm_up=0, hz=hz, m=m,
            n_params=exp["params_samples"],
            n_act=exp["action_samples"], m_mpf=exp["mpf_n_particles"],
            mpf_steps=exp["mpf_steps"], g_model=g_model, g_sim=10.0,
            exp_util=exp.get("likelihood", "ExponentiatedUtility")
            == "ExponentiatedUtility",
            mpf_log_space=exp["mpf_log_space"],
            mpf_fixed_bw=exp.get("mpf_bandwidth"),
            mpf_bw_scale=exp["mpf_bandwidth_scaling"],
            unroll=int(os.environ.get("MEGA_UNROLL", "1")),
        )

    @jax.jit
    def chained(seeds):
        def body(_, s):
            out = episode(s)
            return 0, out["cost"]
        _, costs = jax.lax.scan(body, 0, seeds)
        return costs

    def run(i):
        seeds = jnp.stack(
            [jnp.full((CHAIN,), i, jnp.int32),
             jnp.arange(CHAIN, dtype=jnp.int32)], axis=1
        )
        return chained(seeds)

    t0 = time.perf_counter()
    costs = run(0)
    costs.block_until_ready()
    print(f"compile+warm: {time.perf_counter() - t0:.1f} s")
    times = []
    for i in range(REPEATS):
        t0 = time.perf_counter()
        costs = run(i + 1)
        costs.block_until_ready()
        times.append(time.perf_counter() - t0)
    best = min(times)
    c = np.asarray(costs)
    print(f"megakernel: {CHAIN * STEPS / best:.0f} solves/s "
          f"({best / (CHAIN * STEPS) * 1e6:.1f} us/solve), times={times}")
    print(f"swingup min cost 2nd half: {c[:, STEPS // 2:].min():.4f}")
    print(f"final costs per episode: {c[:, -5:].mean(axis=1)}")


if __name__ == "__main__":
    main()
