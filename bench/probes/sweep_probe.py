import os, time
import jax, jax.numpy as jnp, numpy as np
from dust_tpu.experiments import build_pendulum_stack, load_config
from dust_tpu.ops.pallas_sweep_episode import fused_pendulum_sweep_episode

STEPS = int(os.environ.get("BENCH_STEPS", "200"))
S = 8
GROUPS = int(os.environ.get("GROUPS", "32"))   # n = S * GROUPS

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

def group(seed):
    return fused_pendulum_sweep_episode(
        seed, stack.init_state, theta0, locs0, dstate.a_mat[..., 0],
        stack.mpf_init, mstate.prior_bw, lens, mass,
        exp["ctrl_sigma"], exp["learning_rate"], exp["alpha"],
        1.0 / exp["alpha"], exp["prior_sigma"],
        exp["mpf_learning_rate"], exp["mpf_obs_std"],
        n_sc=S, steps=STEPS, hz=exp["horizon"], m=exp["n_particles"],
        n_params=exp["params_samples"], n_act=exp["action_samples"],
        m_mpf=exp["mpf_n_particles"], mpf_steps=exp["mpf_steps"],
        g_model=g_model, mpf_log_space=exp["mpf_log_space"],
        unroll=os.environ.get("UNROLL", "1") == "1",
        mpf_drive_layout=os.environ.get("MPF_LAYOUT", "colbcast"),
    )["cost"]

@jax.jit
def sweep(seeds):
    def body(_, s):
        return 0, group(s)
    _, costs = jax.lax.scan(body, 0, seeds)
    return costs   # [GROUPS, STEPS, S]

def run(i):
    seeds = jnp.stack([jnp.full((GROUPS,), i, jnp.int32),
                       jnp.arange(GROUPS, dtype=jnp.int32) * 1000], axis=1)
    return sweep(seeds)

t0 = time.perf_counter()
costs = run(0); costs.block_until_ready()
print(f"compile+warm: {time.perf_counter()-t0:.1f} s")
times = []
for i in range(3):
    t0 = time.perf_counter()
    costs = run(i+1); costs.block_until_ready()
    times.append(time.perf_counter()-t0)
best = min(times)
n = S * GROUPS
c = np.asarray(costs)
print(f"sweep megakernel: n={n}: {n*STEPS/best:.0f} solves/s "
      f"({n/best:.1f} episodes/s), times={times}")
print(f"swingup min cost 2nd half: {c[:, STEPS//2:, :].min():.4f}")
print(f"mean final cost: {c[:, -10:, :].mean():.2f}")
