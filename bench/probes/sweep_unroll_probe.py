import os, time
import jax, jax.numpy as jnp, numpy as np
from dust_tpu.experiments import build_pendulum_stack, load_config
from dust_tpu.simulation import megakernel_pendulum_sweep_fn

STEPS, S, GROUPS = 200, 8, 32
config = load_config("demo/pendulum_config.yaml")
stack = build_pendulum_stack(config, jax.random.key(0), case="dust")
sweep = megakernel_pendulum_sweep_fn(stack, config["exp_params"],
                                     steps=STEPS, n_sc=S, unroll=False)
lens = jnp.linspace(0.8, 1.2, S)
mass = jnp.linspace(0.9, 1.1, S)

@jax.jit
def run_groups(seeds):
    def body(_, s):
        return 0, sweep(s, lens, mass)["cost"]
    _, costs = jax.lax.scan(body, 0, seeds)
    return costs

def run(i):
    seeds = jnp.stack([jnp.full((GROUPS,), i, jnp.int32),
                       jnp.arange(GROUPS, dtype=jnp.int32) * 1000], axis=1)
    return run_groups(seeds)

t0 = time.perf_counter()
c = run(0); c.block_until_ready()
print(f"compile+warm: {time.perf_counter()-t0:.1f} s")
times = []
for i in range(3):
    t0 = time.perf_counter()
    c = run(i + 1); c.block_until_ready()
    times.append(time.perf_counter() - t0)
n = S * GROUPS
best = min(times)
print(f"unroll=False sweep: n={n}: {n*STEPS/best:.0f} solves/s, times={times}")
print("finite:", bool(np.isfinite(np.asarray(c)).all()))
