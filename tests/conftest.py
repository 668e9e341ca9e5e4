"""Test configuration: run JAX on CPU with 8 virtual devices so sharding
tests exercise a multi-chip mesh without TPU hardware, and expose the
read-only torch reference implementation for numerical-equivalence tests.

DUST_TPU_TESTS=1 opts out of the CPU forcing so the
@skipif(backend != "tpu") hardware-PRNG tests can run against the real
chip (run ONLY those tests in that mode: the virtual 8-device sharding
suites need the CPU mesh).
"""

import os
import sys

_TPU_MODE = os.environ.get("DUST_TPU_TESTS") == "1"

if not _TPU_MODE:
    # Must be set before jax initializes its backends.
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax

if not _TPU_MODE:
    jax.config.update("jax_platforms", "cpu")

# The container's sitecustomize registers a remote-TPU PJRT plugin (axon) in
# every interpreter; initializing it dials a tunnel and can block the whole
# test process. Tests are CPU-only by design (virtual 8-device mesh), so we
# neuter every non-CPU backend factory before any backend is initialized.
# (The registrations themselves must stay — jax's known-platform list feeds
# MLIR lowering registration, e.g. checkify's TPU rule via optax.)
import dataclasses as _dataclasses

from jax._src import xla_bridge as _xla_bridge


def _disabled_backend_factory(*args, **kwargs):
    raise RuntimeError("non-CPU backends are disabled in the test suite")


if not _TPU_MODE:
    for _name, _reg in list(_xla_bridge._backend_factories.items()):
        if _name != "cpu":
            _xla_bridge._backend_factories[_name] = _dataclasses.replace(
                _reg, factory=_disabled_backend_factory,
                fail_quietly=True
            )

import numpy as np
import pytest

REFERENCE_PATH = "/root/reference"


@pytest.fixture(scope="session")
def reference():
    """Importer for reference modules (e.g. reference('dust.models.pendulum')).

    Skips the requesting test when the reference tree or its torch deps are
    unavailable.
    """
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)

    # shared dependency shims (numpy aliases, gpytorch RBFKernel,
    # KDEpy silvermans_rule) — one implementation with the baseline
    # measurement, see bench/shims.py
    _repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if _repo_root not in sys.path:
        sys.path.insert(0, _repo_root)
    from bench.shims import install_reference_shims

    install_reference_shims()

    def _import(module_name):
        import importlib

        try:
            return importlib.import_module(module_name)
        except ImportError as exc:  # missing optional reference dep
            pytest.skip(f"reference module {module_name} unavailable: {exc}")

    if not os.path.isdir(REFERENCE_PATH):
        pytest.skip("reference tree not mounted")
    return _import


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Release compiled executables at module boundaries.

    The full suite performs hundreds of XLA:CPU compiles (several of
    them interpret-mode Pallas megakernels with very large jaxprs) in
    ONE long-lived process that also hosts torch; by ~test 185 the
    accumulated LLVM JIT state made `backend_compile_and_load` segfault
    reproducibly (r4, 2026-08-20: three full-suite runs died at
    tests/test_properties.py::test_median_and_bandwidths_positive on a
    trivial `median_lower` compile, while every sub-suite — and the
    slightly smaller r3 tree — passes cleanly; RSS alone is not the
    limit, the box has 125 GB free). Dropping the executable caches at
    each module boundary bounds the live-JIT footprint; cross-module
    cache reuse is negligible (modules compile their own kernels), so
    suite time is unaffected.
    """
    yield
    import jax

    jax.clear_caches()
