"""Measure the persistent-compilation-cache effect on TPU compiles.

Usage (TPU env, ONE process at a time):

    timeout 1800 python bench/probes/cache_probe.py --what mpf
    timeout 1800 python bench/probes/cache_probe.py --what mpf   # second run: cache hit?

Prints one JSON line with the wall-clock lower+compile time for a real
FusedMPF streaming-kernel program (m=2048, 20 SVGD steps, the
BASELINE config #4 shape). Run the same invocation twice in separate
processes — the compile_s delta is the cache's saving. `--no-cache`
disables the cache for a deliberate cold-compile measurement. For the
sweep MEGAKERNEL the equivalent test is simply running `bench.py`
twice and comparing its compile phase.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--what", default="mpf", choices=["mpf"])
    p.add_argument("--no-cache", action="store_true")
    p.add_argument("--m", type=int, default=2048)
    args = p.parse_args()

    cache_dir = None
    if not args.no_cache:
        from dust_tpu.utils.cache import enable_persistent_cache

        cache_dir = enable_persistent_cache()

    import jax
    import jax.numpy as jnp
    import optax

    from dust_tpu.inference import GaussianLikelihood
    from dust_tpu.inference.mpf import FusedMPF
    from dust_tpu.models import PendulumModel

    model = PendulumModel(uncertain_params=("length", "mass"))
    lik = GaussianLikelihood(obs_std=0.1, model=model)
    mpf = FusedMPF(likelihood=lik, optimizer=optax.sgd(1e-3))
    particles = jax.random.uniform(jax.random.key(0), (args.m, 2),
                                   minval=0.6, maxval=1.3)
    obs0 = jnp.array([3.0, 0.0])
    mstate = mpf.init_state(particles, obs0, dim_a=1, bw=0.2)

    def run_outer(key, ms):
        def body(carry, k):
            ms = carry
            action = jax.random.uniform(k, (1,), minval=-2.0, maxval=2.0)
            obs = jax.random.normal(k, (2,)) * 0.1 + obs0
            ms, _, _ = mpf.optimize(ms, action, obs, bw=0.3, n_steps=20)
            return ms, ()

        ms, _ = jax.lax.scan(body, ms, jax.random.split(key, 4))
        return ms.x

    t0 = time.perf_counter()
    lowered = jax.jit(run_outer).lower(jax.random.key(1), mstate)
    t1 = time.perf_counter()
    compiled = lowered.compile()
    t2 = time.perf_counter()
    out = compiled(jax.random.key(1), mstate)
    jax.block_until_ready(out)
    t3 = time.perf_counter()
    print(
        json.dumps(
            {
                "what": args.what,
                "m": args.m,
                "cache_dir": cache_dir,
                "lower_s": round(t1 - t0, 3),
                "compile_s": round(t2 - t1, 3),
                "first_run_s": round(t3 - t2, 3),
                "backend": jax.default_backend(),
            }
        )
    )


if __name__ == "__main__":
    main()
