"""Tracing, timing and debug-mode utilities.

The reference has no profiling story (SURVEY.md §5.1 — tqdm bars only)
and leaves torch's autograd anomaly detection ON globally
(`dust/inference/svgd.py:7`, §5.2), taxing every run. Here:

* `trace(logdir)` — jax.profiler trace context (view in TensorBoard /
  xprof) around any region: one episode, one solve, one sweep.
* `Stopwatch` — per-phase wall timings with `block_until_ready`
  semantics, feeding the solves/s counters bench.py reports.
* `debug_mode(nans=..., disable_jit=...)` — the correctness-over-speed
  switches, off by default and scoped, never ambient.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir="/tmp/dust_tpu_trace"):
    """Profile a region: `with trace('/tmp/t'): run_episode(...)`."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class Stopwatch:
    """Accumulates named phase timings; `.rates(n)` converts to per-second
    throughput (e.g. solves/s)."""

    def __init__(self):
        self.totals = {}
        self.counts = {}

    @contextlib.contextmanager
    def phase(self, name):
        """Time a block. Assign the block's device output to the yielded
        holder's `.result` to make the timing include async execution:

            with sw.phase("solve") as h:
                h.result = solve(...)
        """

        class _Holder:
            result = None

        holder = _Holder()
        t0 = time.perf_counter()
        try:
            yield holder
        finally:
            if holder.result is not None:
                jax.block_until_ready(holder.result)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def timed(self, name, fn, *args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1
        return out

    def rates(self, units_per_call=1):
        return {
            name: self.counts[name] * units_per_call / total
            for name, total in self.totals.items()
            if total > 0
        }

    def summary(self):
        return {
            name: {
                "total_s": round(total, 4),
                "calls": self.counts[name],
                "mean_ms": round(1e3 * total / self.counts[name], 3),
            }
            for name, total in self.totals.items()
        }


@contextlib.contextmanager
def debug_mode(nans=True, disable_jit=False):
    """Scoped debug switches (SURVEY.md §5.2): NaN checking and optional
    jit bypass. Off in benchmark mode by construction."""
    ctxs = []
    if nans:
        ctxs.append(jax.debug_nans(True))
    if disable_jit:
        ctxs.append(jax.disable_jit())
    with contextlib.ExitStack() as stack:
        for c in ctxs:
            stack.enter_context(c)
        yield
