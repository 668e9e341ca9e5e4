"""FusedMPF fuse_streams A/B (r5, VERDICT r4 #2).

Measures end-to-end FusedMPF optimize updates/s (bench_all
methodology: `outer` conditioned 20-step optimize calls in one
lax.scan program) for the shipping two-kernel packed path vs the
fused-stream path (ops/pallas_mpf_stream.py: ONE program per SVGD
iteration, phi_t + gp_{t+1} row-pipelined, shared packed j-stream).

Run on real TPU: timeout 2400 python bench/probes/mpf_stream_probe.py
Env: STREAM_M="2048,8192,32768"
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from dust_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp


def time_best(fn, repeats=3):
    jax.block_until_ready(fn(0))
    times = []
    for i in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(i + 1))
        times.append(time.perf_counter() - t0)
    return min(times)


def bench_e2e(m, fuse, outer, repeats=3):
    import optax

    from dust_tpu.inference import GaussianLikelihood
    from dust_tpu.inference.mpf import FusedMPF
    from dust_tpu.models import PendulumModel

    model = PendulumModel(uncertain_params=("length", "mass"))
    lik = GaussianLikelihood(obs_std=0.1, model=model)
    mpf = FusedMPF(likelihood=lik, optimizer=optax.sgd(1e-3),
                   fuse_streams=fuse,
                   fused_lr=1e-3 if fuse else None)
    particles = jax.random.uniform(jax.random.key(0), (m, 2),
                                   minval=0.6, maxval=1.3)
    obs0 = jnp.array([3.0, 0.0])
    mstate = mpf.init_state(particles, obs0, dim_a=1, bw=0.2)

    @jax.jit
    def run_outer(key, ms):
        def body(ms, k):
            action = jax.random.uniform(k, (1,), minval=-2.0,
                                        maxval=2.0)
            obs = jax.random.normal(k, (2,)) * 0.1 + obs0
            ms, _, _ = mpf.optimize(ms, action, obs, bw=0.3, n_steps=20)
            return ms, ()

        ms, _ = jax.lax.scan(body, ms, jax.random.split(key, outer))
        return ms.x

    best = time_best(lambda i: run_outer(jax.random.key(i), mstate),
                     repeats)
    return outer / best


def main():
    ms = [int(v) for v in
          os.environ.get("STREAM_M", "2048,8192,32768").split(",")]
    for m in ms:
        outer = 10 if m >= 8192 else 50
        row = {"m": m}
        for fuse in (False, True):
            tag = "fusedstream" if fuse else "twokernel"
            try:
                row[tag] = round(bench_e2e(m, fuse, outer), 2)
            except Exception as e:
                row[tag] = f"{type(e).__name__}: {e}"[:160]
        if isinstance(row.get("fusedstream"), float) and \
                isinstance(row.get("twokernel"), float):
            row["speedup"] = round(row["fusedstream"]
                                   / row["twokernel"], 3)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
