"""Micro-probe: which reduction strategy is fastest for the sweep
megakernel's MPF loop body?

The MPF SVGD loop is 65% of the 45.6 us group-step
(bench/probes/section_probe.py) and its per-iteration cost is six
lane-half reductions (`gredN`) over [nmr, 128] tiles plus five
pair_rows relayouts. This probe times a shape-faithful stand-in body
(nmr = n_pair*mp = 4*56 = 224 rows, two exp kernels, six reductions,
serialized feedback) under three reduction strategies:

  lane    current gredN: masked jnp.sum(axis=1) per lane half
  mxu     two pre-masked [224,128]@[128,128] dot_generals per gredN
          (half-sum matrix H; masking preserves per-scenario NaN
          isolation exactly like gredN's masked operands)
  rowsum  transposed layout: reductions become per-pair-block row sums
          [4,56,128] -> sum axis=1 -> [4,128], broadcast back

Run on real TPU: python - < bench/probes/mpf_reduce_probe.py
"""
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_PAIR, MP = 4, 56
NMR = N_PAIR * MP
ITERS = 4000          # ~10 episodes' worth of MPF iterations (20*200)


def _probe_kernel(x_ref, out_ref, *, variant):
    lane = jax.lax.broadcasted_iota(jnp.int32, (NMR, 128), 1)
    in_a = lane < 64

    if variant == "mxu":
        l128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        c128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        h_mat = ((l128 < 64) == (c128 < 64)).astype(jnp.float32)

    def red(v):
        if variant == "lane":
            ra = jnp.sum(jnp.where(in_a, v, 0.0), axis=1, keepdims=True)
            rb = jnp.sum(jnp.where(in_a, 0.0, v), axis=1, keepdims=True)
            return jnp.where(in_a, ra, rb)
        if variant == "mxu":
            va = jnp.where(in_a, v, 0.0)
            vb = jnp.where(in_a, 0.0, v)
            return (
                jax.lax.dot_general(
                    va, h_mat, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                + jax.lax.dot_general(
                    vb, h_mat, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            )
        if variant == "rowsum":
            # per-pair-block row sums -> [N_PAIR, 128] -> broadcast back
            s = jnp.sum(v.reshape(N_PAIR, MP, 128), axis=1)
            return jnp.concatenate(
                [jnp.broadcast_to(s[p:p + 1, :], (MP, 128))
                 for p in range(N_PAIR)], axis=0)
        raise ValueError(variant)

    def body(i, x):
        d2 = (x - 0.3) ** 2 + (x - 0.7) ** 2
        pz = jnp.exp(-0.5 * d2)
        r1 = red(pz)
        r2 = red(pz * x)
        r3 = red(pz * (x + 1.0))
        k = jnp.exp(-0.25 * d2)
        r4 = red(k)
        r5 = red(k * x)
        r6 = red(k * (x - 1.0))
        return x + 1e-6 * ((r2 + r3) / jnp.maximum(r1, 1e-6)
                           + (r5 - r6) / jnp.maximum(r4, 1e-6))

    out_ref[:] = jax.lax.fori_loop(0, ITERS, body, x_ref[:])


@functools.partial(jax.jit, static_argnames=("variant",))
def probe(x, variant):
    return pl.pallas_call(
        functools.partial(_probe_kernel, variant=variant),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NMR, 128), jnp.float32),
    )(x)


def main():
    x = jax.random.normal(jax.random.key(0), (NMR, 128))
    for variant in ("lane", "mxu", "rowsum"):
        probe(x, variant).block_until_ready()
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            probe(x, variant).block_until_ready()
            ts.append(time.perf_counter() - t0)
        ns = min(ts) / ITERS * 1e9
        print(f"{variant:7s}: {ns:8.1f} ns/iter "
              f"({min(ts) * 1e3:.2f} ms total)")


if __name__ == "__main__":
    main()
