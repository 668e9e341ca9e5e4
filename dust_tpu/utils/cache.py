"""Persistent XLA compilation cache wiring.

Since 2026-08-20 the axon terminal's remote compiler runs a slow AOT
path: the whole-episode sweep megakernels take 8-15 MINUTES to compile
(were ~80 s), and every bench / tuning / demo session used to re-pay
that for byte-identical programs. JAX ships a persistent compilation
cache (serialized PJRT executables keyed on HLO + compile options +
backend version) that turns the second and later compiles of an
unchanged kernel into a disk load; this module is the one place that
turns it on.

Call :func:`enable_persistent_cache` BEFORE the first ``jax.jit``
dispatch (any compile performed earlier is not recorded). All TPU
entry points in this repo do so: ``bench.py``, ``bench/bench_all.py``,
the probes (via ``bench/probes/README.md``'s documented preamble),
``demo/*_tuning.py`` and the demo scripts.

Cache location: ``$DUST_TPU_CACHE_DIR`` if set, else
``<repo>/.jax_cache``. Set ``DUST_TPU_CACHE_DIR=off`` to disable (e.g.
to time a cold compile on purpose).

Measured effect (r4, one v5e chip through the axon tunnel): see
BASELINE.md "persistent compilation cache" note — the pendulum sweep
megakernel's second-process compile drops from minutes to seconds.

No reference counterpart: the torch reference (`/root/reference`) is
eager-mode and never compiles anything.
"""

from __future__ import annotations

import os

_ENABLED_DIR: str | None = None


def default_cache_dir() -> str:
    """Resolve the cache directory (repo-local unless overridden)."""
    env = os.environ.get("DUST_TPU_CACHE_DIR", "")
    if env:
        return env
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(repo_root, ".jax_cache")


def enable_persistent_cache(cache_dir: str | None = None, *, min_compile_secs: float = 1.0) -> str | None:
    """Enable JAX's persistent compilation cache; returns the dir (or None).

    * ``min_compile_secs`` keeps trivial sub-second compiles out of the
      cache (they cost more to serialize than to recompile) while every
      Pallas kernel and episode program qualifies.
    * Idempotent: repeated calls with the same dir are no-ops; JAX
      forbids flipping ``jax_compilation_cache_dir`` after first use,
      so a second call with a DIFFERENT dir logs and keeps the first.
    * ``DUST_TPU_CACHE_DIR=off`` (or ``0``/``none``) disables entirely.
    """
    global _ENABLED_DIR
    resolved = cache_dir or default_cache_dir()
    if resolved.lower() in ("off", "0", "none", "disabled"):
        return None
    if _ENABLED_DIR is not None:
        return _ENABLED_DIR
    import jax

    try:
        os.makedirs(resolved, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", resolved)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", float(min_compile_secs))
        # Cache regardless of entry size (the megakernels are a few MB).
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as exc:  # pragma: no cover - config drift across jax versions
        import warnings

        warnings.warn(f"persistent compilation cache unavailable: {exc}")
        return None
    _ENABLED_DIR = resolved
    return resolved
