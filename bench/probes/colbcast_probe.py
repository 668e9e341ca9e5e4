"""Probe colbcast implementations inside the transposed MPF body.

Roofline accounting (bench/roofline.py, r2) shows the four colbcast
rebuilds are ~92% of the sweep-megakernel group-step FLOPs — each is a
[nmr, 128] @ [128, 128] MXU matmul that performs PURE DATA MOVEMENT
(broadcast each row particle's own value across its lane half). The MPF
loop is therefore MXU-dispatch-bound on broadcasts that do no math.
Variants (same shape-faithful body as mpf_transpose_probe.py "new"):

  matmul4   the shipped body: four separate colbcast matmuls per
            iteration (x0, x1, t0, t1)
  stacked   ONE [4*nmr, 128] @ [128, 128] matmul per iteration: the
            four diagonal-selected operands stack on the sublane axis
            (all four are available simultaneously: x0N/x1N at
            iteration start, t0/t1 right after the prior section,
            before the Stein section consumes any colbcast), paying one
            MXU dispatch + pipeline drain instead of four
  lanered   no MXU: per colbcast, two half-masked lane reductions
            (the single nonzero per row-half sums to the exact value)
            recombined with a half select
  reshape   no MXU: extract [nmr, 1] A/B columns from ROW space with a
            whole-tile reshape (pure movement) and let consumers
            broadcast; the column pair substitutes for the full
            column-broadcast tile via a lane-half select

All variants produce bitwise-identical colbcast results (single-term
sums / pure movement), checked before timing.

Run on real TPU: timeout 900 python bench/probes/colbcast_probe.py
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_PAIR, MP = 4, 56
NMR = N_PAIR * MP


def _kernel(x_ref, out_ref, *, variant, iters):
    lane = jax.lax.broadcasted_iota(jnp.int32, (NMR, 128), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (NMR, 128), 0)
    in_a = lane < 64
    r_in_pair = row - (row // MP) * MP
    mdiag = jnp.where(in_a, lane, lane - 64) == r_in_pair
    l128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    c128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    h_mat = ((l128 < 64) == (c128 < 64)).astype(jnp.float32)

    def brs(v):
        s = jnp.sum(v.reshape(N_PAIR, MP, 128), axis=1)
        return jnp.concatenate(
            [s, jnp.zeros((8 - N_PAIR, 128), jnp.float32)], axis=0)

    def to_blocks(r8):
        return jnp.concatenate(
            [jnp.broadcast_to(r8[p:p + 1, :], (MP, 128))
             for p in range(N_PAIR)], axis=0)

    def pair_rows(col_a, col_b):
        zs = jnp.zeros((N_PAIR, 128 - MP), jnp.float32)
        ra = jnp.concatenate([col_a[:, 0:1].reshape(N_PAIR, MP), zs],
                             axis=1)
        rb = jnp.concatenate([col_b[:, 0:1].reshape(N_PAIR, MP), zs],
                             axis=1)
        rows = ra + pltpu.roll(rb, shift=64, axis=1)
        return jnp.concatenate(
            [rows, jnp.zeros((8 - N_PAIR, 128), jnp.float32)], axis=0)

    def sel(blocks):
        return jnp.where(mdiag,
                         jnp.where(blocks - blocks == 0.0, blocks, 0.0),
                         0.0)

    def cb_matmul(blocks):
        return jax.lax.dot_general(
            sel(blocks), h_mat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + blocks * 0.0

    def cb_lanered(blocks):
        d = sel(blocks)
        ra = jnp.sum(jnp.where(in_a, d, 0.0), axis=1, keepdims=True)
        rb = jnp.sum(jnp.where(in_a, 0.0, d), axis=1, keepdims=True)
        return jnp.where(in_a, ra, rb) + blocks * 0.0

    def cb_reshape(r8):
        """ROW tile [8, 128] -> column-broadcast tile, no matmul:
        reshape the A lanes (0..MP-1) and B lanes (64..64+MP-1) of the
        n_pair rows into [nmr, 1] columns (pure movement)."""
        a = r8[0:N_PAIR, 0:MP].reshape(NMR, 1)
        b = pltpu.roll(r8, shift=64, axis=1)[0:N_PAIR, 0:MP] \
            .reshape(NMR, 1)
        return jnp.where(in_a, a, b)

    c0 = jnp.where(in_a, 0.3, -0.2)
    imbw = 0.25

    def make_body(colbcast4):
        def body(i, carry):
            x0r, x1r = carry
            x0N = to_blocks(x0r)
            x1N = to_blocks(x1r)
            d2c = (x0N - c0) ** 2 + (x1N - c0) ** 2
            pz = jnp.exp(-0.5 * d2c)
            psum_r = brs(pz)
            num0 = brs(pz * c0)
            num1 = brs(pz * c0 * 0.5)
            pc0r = num0 / psum_r
            pc1r = num1 / psum_r
            gl0 = jnp.tanh(pc0r) * 0.1 + pc1r * 0.01
            gl1 = jnp.tanh(pc1r) * 0.1 + pc0r * 0.01
            s0r = gl0 + (pc0r - x0r) * 0.5
            s1r = gl1 + (pc1r - x1r) * 0.5
            t0r = s0r - x0r * imbw
            t1r = s1r - x1r * imbw
            x0c, x1c, t0c, t1c = colbcast4(x0N, x1N, t0r, t1r)
            d2 = (x0c - x0N) ** 2 + (x1c - x1N) ** 2
            k = jnp.exp(-0.5 * d2 * imbw)
            rows_k = brs(k)
            dr0 = brs(k * t0c)
            dr1 = brs(k * t1c)
            phi0 = (dr0 + rows_k * x0r * imbw) * (1.0 / MP)
            phi1 = (dr1 + rows_k * x1r * imbw) * (1.0 / MP)
            return (x0r + 1e-3 * phi0, x1r + 1e-3 * phi1)

        return body

    if variant == "matmul4":
        def colbcast4(x0N, x1N, t0r, t1r):
            return (cb_matmul(x0N), cb_matmul(x1N),
                    cb_matmul(to_blocks(t0r)), cb_matmul(to_blocks(t1r)))
    elif variant == "stacked":
        def colbcast4(x0N, x1N, t0r, t1r):
            t0N = to_blocks(t0r)
            t1N = to_blocks(t1r)
            d = jnp.concatenate(
                [sel(x0N), sel(x1N), sel(t0N), sel(t1N)], axis=0)
            o = jax.lax.dot_general(
                d, h_mat, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return (o[0:NMR] + x0N * 0.0,
                    o[NMR:2 * NMR] + x1N * 0.0,
                    o[2 * NMR:3 * NMR] + t0N * 0.0,
                    o[3 * NMR:4 * NMR] + t1N * 0.0)
    elif variant == "lanered":
        def colbcast4(x0N, x1N, t0r, t1r):
            return (cb_lanered(x0N), cb_lanered(x1N),
                    cb_lanered(to_blocks(t0r)),
                    cb_lanered(to_blocks(t1r)))
    elif variant != "reshape":
        raise ValueError(variant)

    if variant == "reshape":
        def body(i, carry):
            x0r, x1r = carry
            x0N = to_blocks(x0r)
            x1N = to_blocks(x1r)
            d2c = (x0N - c0) ** 2 + (x1N - c0) ** 2
            pz = jnp.exp(-0.5 * d2c)
            psum_r = brs(pz)
            num0 = brs(pz * c0)
            num1 = brs(pz * c0 * 0.5)
            pc0r = num0 / psum_r
            pc1r = num1 / psum_r
            gl0 = jnp.tanh(pc0r) * 0.1 + pc1r * 0.01
            gl1 = jnp.tanh(pc1r) * 0.1 + pc0r * 0.01
            s0r = gl0 + (pc0r - x0r) * 0.5
            s1r = gl1 + (pc1r - x1r) * 0.5
            x0c = cb_reshape(x0r)
            x1c = cb_reshape(x1r)
            t0c = cb_reshape(s0r - x0r * imbw)
            t1c = cb_reshape(s1r - x1r * imbw)
            d2 = (x0c - x0N) ** 2 + (x1c - x1N) ** 2
            k = jnp.exp(-0.5 * d2 * imbw)
            rows_k = brs(k)
            dr0 = brs(k * t0c)
            dr1 = brs(k * t1c)
            phi0 = (dr0 + rows_k * x0r * imbw) * (1.0 / MP)
            phi1 = (dr1 + rows_k * x1r * imbw) * (1.0 / MP)
            return (x0r + 1e-3 * phi0, x1r + 1e-3 * phi1)
    else:
        body = make_body(colbcast4)

    x0 = x_ref[:]
    x0r = pair_rows(x0[:, 0:1], x0[:, 64:65])
    out = jax.lax.fori_loop(0, iters, body, (x0r, x0r * 0.5))[0]
    out_ref[:] = out


@functools.partial(jax.jit, static_argnames=("variant", "iters"))
def probe(x, variant, iters):
    return pl.pallas_call(
        functools.partial(_kernel, variant=variant, iters=iters),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(x)


def main():
    import os

    x = jax.random.normal(jax.random.key(0), (NMR, 128))
    variants = ("matmul4", "stacked", "lanered", "reshape")
    only = os.environ.get("ONLY")
    if only:
        variants = tuple(v for v in variants if v in only.split(","))

    ref = np.asarray(probe(x, variants[0], 20))
    for v in variants[1:]:
        got = np.asarray(probe(x, v, 20))
        same = np.array_equal(ref, got)
        print(f"{v} vs {variants[0]} after 20 iters: "
              f"{'bitwise equal' if same else f'MAX DIFF {np.abs(ref-got).max()}'}")

    for variant in variants:
        res = {}
        for iters in (20_000, 100_000):
            np.asarray(probe(x, variant, iters))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(probe(x, variant, iters))
                ts.append(time.perf_counter() - t0)
            res[iters] = min(ts)
        marg = (res[100_000] - res[20_000]) / 80_000 * 1e9
        print(f"{variant}: marginal {marg:7.1f} ns/iter "
              f"(totals {res[20_000]*1e3:.1f} / {res[100_000]*1e3:.1f} ms)",
              flush=True)


if __name__ == "__main__":
    main()
