"""FusedMPF kernel-layout probe (VERDICT r2 #6).

The r2 roofline (`bench/roofline.py`, BASELINE.md) put FusedMPF's
useful-MXU occupancy at 1.2-1.7%: with the MPF state dim d = 2, the
gram-identity tiles in `pallas_svgd._phi_kernel` /
`pallas_gmm._score_kernel` run THREE 128-lane MXU dispatches per
(i, j) tile — the [bm, 128] x [128, bn] distance cross-term plus two
[bm, bn] x [bn, 128] accumulations — of which 2 of 128 lanes carry
data. In RAW terms that is already ~70% of the effective f32 MXU rate
at m=8192, i.e. the kernel is MXU-bound on padding.

The packed layout (`_phi_kernel_packed` / `_score_kernel_packed`)
deletes two of the three: distances via explicit per-dimension
broadcast diffs (VPU, linear in d) and ONE matmul against
[score | x | ones] (phi) / [centers | ones] (GMM). `use_bf16`
additionally streams the K / responsibility tile in bf16 with f32
accumulation (one MXU pass instead of the f32 split-bf16 multi-pass).

Measures, per m in (2048, 8192, 32768):
  1. isolated phi kernel: gram vs packed vs packed+bf16 (20 chained
     steps per dispatch, score folded back into x to serialize);
  2. isolated GMM score kernel: same three;
  3. end-to-end FusedMPF optimize updates/s (bench_all methodology:
     `outer` conditioned 20-step optimize calls in one lax.scan
     program), gram vs packed vs packed+bf16.

Run on real TPU: timeout 1800 python bench/probes/fusedmpf_probe.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp


def time_best(fn, repeats=3):
    out = fn(0)
    jax.block_until_ready(out)
    times = []
    for i in range(repeats):
        t0 = time.perf_counter()
        out = fn(i + 1)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return min(times)


def bench_phi(m, variant, steps=20, repeats=3):
    from dust_tpu.ops.pallas_svgd import (
        svgd_phi_pallas,
        svgd_phi_pallas_packed,
    )

    d = 2
    x0 = jax.random.uniform(jax.random.key(0), (m, d), minval=0.6,
                            maxval=1.3)
    s0 = jax.random.normal(jax.random.key(1), (m, d))

    if variant == "gram":
        phi = lambda x, s: svgd_phi_pallas(x, s, 0.3)
    elif variant == "packed":
        phi = lambda x, s: svgd_phi_pallas_packed(x, s, 0.3)
    else:
        phi = lambda x, s: svgd_phi_pallas_packed(x, s, 0.3,
                                                  use_bf16=True)

    @jax.jit
    def run(x):
        def body(x, _):
            return x + 1e-3 * phi(x, s0 + 0.1 * x), ()
        x, _ = jax.lax.scan(body, x, None, length=steps)
        return x

    best = time_best(lambda i: run(x0 + 1e-6 * i), repeats)
    return steps / best


def bench_gmm(m, variant, steps=20, repeats=3):
    from dust_tpu.ops.pallas_gmm import (
        gmm_prior_score_pallas,
        gmm_prior_score_pallas_packed,
    )

    d = 2
    x0 = jax.random.uniform(jax.random.key(0), (m, d), minval=0.6,
                            maxval=1.3)
    c0 = jax.random.uniform(jax.random.key(1), (m, d), minval=0.6,
                            maxval=1.3)

    if variant == "gram":
        score = lambda x: gmm_prior_score_pallas(x, c0, 0.2)
    elif variant == "packed":
        score = lambda x: gmm_prior_score_pallas_packed(x, c0, 0.2)
    else:
        score = lambda x: gmm_prior_score_pallas_packed(x, c0, 0.2,
                                                        use_bf16=True)

    @jax.jit
    def run(x):
        def body(x, _):
            return x + 1e-4 * score(x), ()
        x, _ = jax.lax.scan(body, x, None, length=steps)
        return x

    best = time_best(lambda i: run(x0 + 1e-6 * i), repeats)
    return steps / best


def bench_e2e(m, variant, outer=10, repeats=3):
    import optax

    from dust_tpu.inference import GaussianLikelihood
    from dust_tpu.inference.mpf import FusedMPF
    from dust_tpu.models import PendulumModel

    model = PendulumModel(uncertain_params=("length", "mass"))
    lik = GaussianLikelihood(obs_std=0.1, model=model)
    mpf = FusedMPF(likelihood=lik, optimizer=optax.sgd(1e-3),
                   packed=variant != "gram",
                   use_bf16=variant == "bf16")
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
    dev = jax.devices()[0].platform
    print(f"device: {dev}")
    for m in (2048, 8192, 32768):
        for variant in ("gram", "packed", "bf16"):
            r_phi = bench_phi(m, variant)
            r_gmm = bench_gmm(m, variant)
            print(f"m={m:6d} {variant:7s} phi={r_phi:9.1f}/s "
                  f"gmm={r_gmm:9.1f}/s", flush=True)
        for variant in ("gram", "packed", "bf16"):
            outer = 10 if m >= 8192 else 50
            r = bench_e2e(m, variant, outer=outer)
            print(f"m={m:6d} {variant:7s} e2e optimize "
                  f"updates/s={r:8.2f}", flush=True)


if __name__ == "__main__":
    main()
