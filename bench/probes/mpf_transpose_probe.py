"""Probe v2: full shape-faithful MPF-body comparison.

`mpf_reduce_probe.py` showed block-row sums are ~5x cheaper than
lane-half reductions (150 vs 773 ns marginal per probe iteration).
A transposed MPF body turns ALL 6 per-iteration reductions into
block-row sums; the column-broadcast operands it needs (x and the
Stein drive weights t, laid out value-of-ROW-particle per lane half)
are rebuilt from row space via one MXU matmul each:

    colbcast(r8) = (to_blocks(r8) * Mdiag) @ H

with Mdiag[(p,q), l] = (l % 64 == q) and H the lane-half block matrix
(H[j, l] = 1 iff half(j) == half(l)); the to_blocks operands are
already needed elsewhere, so the marginal cost is one elementwise
product and one [nmr,128]@[128,128] MXU pass. Bodies compared:

  old   6 lane-half gredN + 5 pair_rows + 4 to_blocks + elementwise
        (the current sweep megakernel structure, carries x in both
        column-broadcast and row layouts)
  new   6 block-row sums + 4 to_blocks + 4 matmul colbcasts
        + elementwise (row-space-only carry)

Both bodies compute the SAME toy dynamics, so the probe also checks
they agree numerically (reassociation-level tolerance).

Run on real TPU: python - < bench/probes/mpf_transpose_probe.py
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

    def gred(v):
        ra = jnp.sum(jnp.where(in_a, v, 0.0), axis=1, keepdims=True)
        rb = jnp.sum(jnp.where(in_a, 0.0, v), axis=1, keepdims=True)
        return jnp.where(in_a, ra, rb)

    def brs(v):
        """block-row sum -> [8, 128] row tile (pairs on rows)."""
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

    mdiag = jnp.where(in_a, lane, lane - 64) == r_in_pair
    l128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    c128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    h_mat = ((l128 < 64) == (c128 < 64)).astype(jnp.float32)

    def colbcast(blocks):
        """to_blocks(r8) -> column-broadcast tile: value of ROW particle
        (q = r_in_pair) of the scenario selected by the LANE half.
        Matches the SHIPPED kernel body (pallas_sweep_episode.py
        `colbcast`): ONE matmul whose operand is sanitized with the
        sub/compare/select finite test, with the diverged half's NaN
        re-injected afterwards via `blocks * 0.0` — so re-validating
        this probe measures the production structure. (An earlier probe
        revision used two half-masked matmuls for the same isolation;
        the 449 ns / 3.8x result was first measured on that body.)"""
        d = jnp.where(mdiag,
                      jnp.where(blocks - blocks == 0.0, blocks, 0.0),
                      0.0)
        return jax.lax.dot_general(
            d, h_mat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + blocks * 0.0

    c0 = jnp.where(in_a, 0.3, -0.2)
    c0r = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1) < 64, 0.3, -0.2)
    imbw = 0.25

    if variant == "old":
        def body(i, carry):
            x0, x1, x0r, x1r = carry
            x0N = to_blocks(x0r)
            x1N = to_blocks(x1r)
            d2c = (x0 - c0) ** 2 + (x1 - c0) ** 2
            pz = jnp.exp(-0.5 * d2c)
            psum = gred(pz)
            num0 = gred(pz * c0)
            num1 = gred(pz * c0 * 0.5)
            psum_r = pair_rows(psum[:, 0:1], psum[:, 64:65])
            pc0r = pair_rows(num0[:, 0:1], num0[:, 64:65]) / psum_r
            pc1r = pair_rows(num1[:, 0:1], num1[:, 64:65]) / psum_r
            gl0 = jnp.tanh(pc0r) * 0.1 + pc1r * 0.01
            gl1 = jnp.tanh(pc1r) * 0.1 + pc0r * 0.01
            s0r = gl0 + (pc0r - x0r) * 0.5
            s1r = gl1 + (pc1r - x1r) * 0.5
            t0N = to_blocks(s0r - x0r * imbw)
            t1N = to_blocks(s1r - x1r * imbw)
            d2 = (x0 - x0N) ** 2 + (x1 - x1N) ** 2
            k = jnp.exp(-0.5 * d2 * imbw)
            rows_k = gred(k)
            dr0 = gred(k * t0N)
            dr1 = gred(k * t1N)
            phi0 = (dr0 + rows_k * x0 * imbw) * (1.0 / MP)
            phi1 = (dr1 + rows_k * x1 * imbw) * (1.0 / MP)
            d0 = 1e-3 * phi0
            d1 = 1e-3 * phi1
            return (x0 + d0, x1 + d1,
                    x0r + pair_rows(d0[:, 0:1], d0[:, 64:65]),
                    x1r + pair_rows(d1[:, 0:1], d1[:, 64:65]))

        x0 = x_ref[:]
        x0r = pair_rows(x0[:, 0:1], x0[:, 64:65])
        out = jax.lax.fori_loop(
            0, iters, body, (x0, x0 * 0.5, x0r, x0r * 0.5))[2]
    else:
        def body(i, carry):
            x0r, x1r = carry
            x0N = to_blocks(x0r)
            x1N = to_blocks(x1r)
            x0 = colbcast(x0N)
            x1 = colbcast(x1N)
            # prior matrix transposed: rows = centers q, lanes = current
            # particles l (of the row's pair)
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
            t0c = colbcast(to_blocks(s0r - x0r * imbw))
            t1c = colbcast(to_blocks(s1r - x1r * imbw))
            d2 = (x0 - x0N) ** 2 + (x1 - x1N) ** 2
            k = jnp.exp(-0.5 * d2 * imbw)
            rows_k = brs(k)
            dr0 = brs(k * t0c)
            dr1 = brs(k * t1c)
            phi0 = (dr0 + rows_k * x0r * imbw) * (1.0 / MP)
            phi1 = (dr1 + rows_k * x1r * imbw) * (1.0 / MP)
            return (x0r + 1e-3 * phi0, x1r + 1e-3 * phi1)

        x0 = x_ref[:]
        x0r = pair_rows(x0[:, 0:1], x0[:, 64:65])
        out = jax.lax.fori_loop(0, iters, body, (x0r, x0r * 0.5))[0]

    out_ref[:] = jnp.broadcast_to(out[0:8, :], (8, 128))


@functools.partial(jax.jit, static_argnames=("variant", "iters"))
def probe(x, variant, iters):
    return pl.pallas_call(
        functools.partial(_kernel, variant=variant, iters=iters),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(x)


def main():
    x = jax.random.normal(jax.random.key(0), (NMR, 128))

    # numerical agreement (same toy math; wait for prior d2c note: the
    # old body's prior matrix couples x_r with c_l while the new body
    # couples x_l with c_q — with the probe's c0 constant per half the
    # two are NOT the same matrix, but the REDUCED quantities psum/num
    # match because c is constant within each half; real-kernel parity
    # is pinned by tests/test_pallas_sweep_episode.py instead)
    a = np.asarray(probe(x, "old", 20))
    b = np.asarray(probe(x, "new", 20))
    print("max |old-new| after 20 iters:", np.abs(a - b).max())

    for variant in ("old", "new"):
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
              f"(totals {res[20_000]*1e3:.1f} / {res[100_000]*1e3:.1f} ms)")


if __name__ == "__main__":
    main()
