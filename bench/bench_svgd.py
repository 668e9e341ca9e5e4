"""Micro-benchmark: fused Pallas SVGD phi vs naive jnp path on TPU.

Run: python bench/bench_svgd.py
Emits one JSON line per (m, d) with both timings and the speedup.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from dust_tpu.ops.pallas_svgd import svgd_phi_pallas, svgd_phi_reference


ITERS = 100  # chained phi applications inside one jit — amortizes the
             # host->device dispatch (the axon tunnel costs ~1.8 ms/call)


def chained(phi_fn):
    @jax.jit
    def run(x, score, bw):
        def body(i, xs):
            x = xs
            p = phi_fn(x, score, bw)
            return x + 1e-6 * p  # data dependence so nothing is elided

        return jax.lax.fori_loop(0, ITERS, body, x)

    return run


def timeit(fn, *args, repeats=3):
    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return min(times) / ITERS, out


def main():
    ref_run = chained(svgd_phi_reference)
    pal_run = chained(
        lambda x, s, b: svgd_phi_pallas(x, s, b)
    )
    for m, d in [(512, 2), (2048, 2), (8192, 2), (2048, 64), (8192, 64)]:
        key = jax.random.key(0)
        k1, k2 = jax.random.split(key)
        x = jax.random.normal(k1, (m, d), jnp.float32)
        score = jax.random.normal(k2, (m, d), jnp.float32) * 3.0
        bw = 0.8

        t_ref, out_ref = timeit(ref_run, x, score, bw)
        t_pal, out_pal = timeit(pal_run, x, score, bw)

        err = float(jnp.max(jnp.abs(out_ref - out_pal)))
        scale = float(jnp.max(jnp.abs(out_ref)))
        print(json.dumps({
            "m": m, "d": d,
            "jnp_us_per_phi": round(t_ref * 1e6, 1),
            "pallas_us_per_phi": round(t_pal * 1e6, 1),
            "speedup": round(t_ref / t_pal, 2),
            "final_state_rel_err": err / max(scale, 1e-30),
        }))


if __name__ == "__main__":
    main()
