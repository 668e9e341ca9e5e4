import os, time
import jax, jax.numpy as jnp, numpy as np
from dust_tpu.experiments import build_pendulum_stack, load_config
from dust_tpu.ops.pallas_sweep_episode import fused_pendulum_sweep_episode

STEPS = 200
S = 8
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

fn = jax.jit(lambda seed: fused_pendulum_sweep_episode(
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
))
t0=time.perf_counter()
for i in range(1, 3):
    for k in range(8):
        out = fn(jnp.array([i, k * 1000], jnp.int32))
        c = np.asarray(out["cost"]); act = np.asarray(out["action"])
        bw = np.asarray(out["bw_sv"])
        badc = np.argwhere(~np.isfinite(c))
        print(f"seed=({i},{k*1000}): cost_finite={np.isfinite(c).all()} "
              f"first_bad={badc[0] if len(badc) else '-'} "
              f"max|act|={np.abs(act).max():.3g} max_bw={bw.max():.3g} "
              f"final_cost={np.nanmean(c[-10:]):.2f}", flush=True)
print(f"{time.perf_counter()-t0:.1f}s")
