import os, time, sys
import jax, jax.numpy as jnp, numpy as np
from dust_tpu.experiments import build_pendulum_stack, load_config
from dust_tpu.ops.pallas_sweep_episode import fused_pendulum_sweep_episode

STEPS, S, GROUPS = 200, 8, 32
config = load_config("demo/pendulum_config.yaml")
exp = config["exp_params"]
stack = build_pendulum_stack(config, jax.random.key(0), case="dust")
mstate = stack.mpf.init_state(stack.mpf_init, stack.init_state, 1)
theta0 = stack.init_policies[..., 0]
locs0 = stack.policies_prior.locs[..., 0]
dstate = stack.controller.init_state(stack.init_policies)
g_model = float(stack.model.params_dict["g"])
lens = jnp.linspace(0.8, 1.2, S)
mass = jnp.linspace(0.9, 1.1, S)

def mk(mpf_steps, n_params, n_act):
    def group(seed):
        return fused_pendulum_sweep_episode(
            seed, stack.init_state, theta0, locs0, dstate.a_mat[..., 0],
            stack.mpf_init, mstate.prior_bw, lens, mass,
            exp["ctrl_sigma"], exp["learning_rate"], exp["alpha"],
            1.0 / exp["alpha"], exp["prior_sigma"],
            exp["mpf_learning_rate"], exp["mpf_obs_std"],
            n_sc=S, steps=STEPS, hz=exp["horizon"], m=exp["n_particles"],
            n_params=n_params, n_act=n_act,
            m_mpf=exp["mpf_n_particles"], mpf_steps=mpf_steps,
            g_model=g_model, mpf_log_space=exp["mpf_log_space"],
            unroll=os.environ.get("UNROLL", "1") == "1",
        )["cost"]
    @jax.jit
    def sweep(seeds):
        def body(_, s):
            return 0, group(s)
        _, costs = jax.lax.scan(body, 0, seeds)
        return costs
    def run(i):
        seeds = jnp.stack([jnp.full((GROUPS,), i, jnp.int32),
                           jnp.arange(GROUPS, dtype=jnp.int32) * 1000], axis=1)
        return sweep(seeds)
    run(0).block_until_ready()
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        run(i + 1).block_until_ready()
        ts.append(time.perf_counter() - t0)
    return min(ts)

full = mk(exp["mpf_steps"], exp["params_samples"], exp["action_samples"])
nompf = mk(0, exp["params_samples"], exp["action_samples"])
print(f"full: {full*1e6/ (GROUPS*STEPS):.1f} us/group-step "
      f"({S*GROUPS*STEPS/full:.0f} solves/s)")
print(f"mpf_steps=0: {nompf*1e6/(GROUPS*STEPS):.1f} us/group-step "
      f"({S*GROUPS*STEPS/nompf:.0f} solves/s)")
print(f"MPF share: {(full-nompf)/full*100:.1f}%")
