"""Does Mosaic overlap INDEPENDENT serial dependency chains in one
Pallas program? (r4 — the scheduling question behind the next sweep
lever.)

The sweep megakernels are latency-bound on serial chains of small-tile
ops (S=2/4/8/16 ladder, BASELINE "r4 width verdict"). Widening tiles
(S axis) amortizes at ~1.35-1.5x time per 2x solves. A structurally
different lever is DUAL-CHAIN: run two independent episode bodies in
one program and let the scheduler interleave their instructions —
worth a >1000-line kernel refactor ONLY if the compiler actually
overlaps independent chains.

This probe isolates that question: a fori_loop whose body advances
one serial chain of cheap dependent [8, 128] vector ops (mul + roll +
add — nothing the VPU can fuse away), vs the same loop advancing TWO
(and FOUR) independent chains. If independent chains overlap, time
per chain drops toward the issue-limited floor; if the scheduler
serializes, n-chain time = n x one-chain time and the refactor is
dead.

Run on real TPU: timeout 1200 python bench/probes/dualchain_probe.py
"""

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(ROOT))

from dust_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 2048        # chain iterations per program
IT_BASE = 64        # overhead-baseline program (same structure, tiny)
PROGRAMS = 200      # scan length: amortizes the 2-28 ms tunnel dispatch
REPEATS = 5


def _kernel(x_ref, o_ref, *, n_chains, iters):
    # inner UNROLLED 64-iteration block (Mosaic supports only full
    # unroll or rolled) inside an outer rolled loop; carries are
    # VMEM-anchored tiles, safe as rolled carries
    inner = 64

    def body(i, xs):
        for _ in range(inner):
            out = []
            for x in xs:
                # serial chain step: each op depends on the previous;
                # exp + bounded recentering keeps the chain both
                # un-foldable and numerically stationary
                y = jnp.exp(x * 0.01)
                y = pltpu.roll(y, shift=1, axis=1)
                y = y * 0.5 - 0.25
                y = jnp.minimum(jnp.maximum(y, -1.0), 1.0)
                out.append(y)
            xs = tuple(out)
        return xs

    xs = tuple(x_ref[:] + jnp.float32(c) for c in range(n_chains))
    xs = jax.lax.fori_loop(0, iters // inner, body, xs)
    acc = xs[0]
    for x in xs[1:]:
        acc = acc + x
    o_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("n_chains", "iters"))
def run_chains(x, n_chains, iters):
    return pl.pallas_call(
        functools.partial(_kernel, n_chains=n_chains, iters=iters),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(x)


_CALL = [0]


def _timed_scan(n_chains, iters):
    """Best-of wall time of ONE dispatch scanning PROGRAMS
    carry-dependent chain programs. EVERY dispatch gets a fresh input:
    the axon layer returns identical repeated (program, input)
    dispatches from a result cache in ~0.1 ms (measured r4 — 0.08 ms
    "dispatches" of a 196k-iteration chain vs ~48 ms real), which
    silently invalidates any best-of-identical-repeats timing loop.
    Single-dispatch slope timing drowns in the 2-28 ms load-dependent
    dispatch noise, so the chain cost is exposed by scan-amortizing
    and subtracting a same-structure tiny-iters baseline."""

    @functools.partial(jax.jit, static_argnames=())
    def chained(x):
        def body(c, i):
            return run_chains(c, n_chains, iters), ()

        return jax.lax.scan(body, x, jnp.arange(PROGRAMS))[0]

    import numpy as np

    best = float("inf")
    for r in range(REPEATS + 1):       # first is the warm/compile call
        _CALL[0] += 1
        x = jnp.full((8, 128), 0.5 + _CALL[0] * 1e-6, jnp.float32)
        t0 = time.perf_counter()
        # np.asarray, NOT block_until_ready: on the axon backend BUR
        # returned in ~0.1 ms for this program shape while the real
        # 400k-iteration chain ran 60-365 ms (measured r4) — only a
        # host transfer truly synchronizes here. (The production sweep
        # programs DO block correctly under BUR — verified same-day,
        # 33.9 vs 36.0 us/group-step — the async fast path seems
        # specific to small-output single-buffer programs.)
        np.asarray(chained(x))
        dt = time.perf_counter() - t0
        if r > 0:
            best = min(best, dt)
    return best


def measure(n_chains):
    """ns per chain iteration, dispatch- and per-program-overhead
    subtracted via the IT_BASE baseline."""
    t_full = _timed_scan(n_chains, ITERS)
    t_base = _timed_scan(n_chains, IT_BASE)
    return (t_full - t_base) / (PROGRAMS * (ITERS - IT_BASE)) * 1e9


def _kernel_blocked(x_ref, o_ref, *, n_chains, iters, block):
    """Chains interleaved at BLOCK granularity: chain A advances
    `block` dependent iterations, then chain B, ... — the instruction
    distance between independent work grows to ~6*block ops, modeling
    a dual-chain megakernel that alternates whole sections or whole
    step bodies rather than single ops."""
    inner = 64
    assert inner % block == 0 or block % inner == 0

    def one(x, n):
        for _ in range(n):
            y = jnp.exp(x * 0.01)
            y = pltpu.roll(y, shift=1, axis=1)
            y = y * 0.5 - 0.25
            y = jnp.minimum(jnp.maximum(y, -1.0), 1.0)
            x = y
        return x

    blocks_per_outer = max(1, inner // block)
    n_eff = min(block, inner)

    def body(i, xs):
        for _ in range(blocks_per_outer):
            xs = tuple(one(x, n_eff) for x in xs)
        return xs

    xs = tuple(x_ref[:] + jnp.float32(c) for c in range(n_chains))
    xs = jax.lax.fori_loop(0, iters // inner, body, xs)
    acc = xs[0]
    for x in xs[1:]:
        acc = acc + x
    o_ref[:] = acc


@functools.partial(jax.jit,
                   static_argnames=("n_chains", "iters", "block"))
def run_blocked(x, n_chains, iters, block):
    return pl.pallas_call(
        functools.partial(_kernel_blocked, n_chains=n_chains,
                          iters=iters, block=block),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(x)


def _timed_scan_blocked(n_chains, iters, block):
    import numpy as np

    @jax.jit
    def chained(x):
        def body(c, i):
            return run_blocked(c, n_chains, iters, block), ()

        return jax.lax.scan(body, x, jnp.arange(PROGRAMS))[0]

    best = float("inf")
    for r in range(REPEATS + 1):
        _CALL[0] += 1
        x = jnp.full((8, 128), 0.5 + _CALL[0] * 1e-6, jnp.float32)
        t0 = time.perf_counter()
        np.asarray(chained(x))
        dt = time.perf_counter() - t0
        if r > 0:
            best = min(best, dt)
    return best


def measure_blocked(n_chains, block):
    t_full = _timed_scan_blocked(n_chains, ITERS, block)
    t_base = _timed_scan_blocked(n_chains, IT_BASE, block)
    return (t_full - t_base) / (PROGRAMS * (ITERS - IT_BASE)) * 1e9


def main():
    t1 = measure(1)
    t2 = measure(2)
    t4 = measure(4)
    out = {
        "ns_per_iter_1chain": round(t1, 2),
        "ns_per_iter_2chains": round(t2, 2),
        "ns_per_iter_4chains": round(t4, 2),
        "overlap_2": round(t2 / t1, 3),
        "overlap_4": round(t4 / t1, 3),
    }
    # coarse-grain interleave: does overlap survive growing the
    # independent-work distance? (block=64 ~ a section, the whole
    # inner unroll)
    for block in (16, 64):
        tb = measure_blocked(2, block)
        out[f"ns_2chains_block{block}"] = round(tb, 2)
        out[f"overlap_2_block{block}"] = round(tb / t1, 3)
    out["verdict"] = (
        "chains overlap (dual-chain kernel viable)"
        if t2 / t1 < 1.4 else
        "scheduler serializes independent chains")
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
