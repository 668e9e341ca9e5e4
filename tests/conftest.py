"""Test configuration: run JAX on CPU with 8 virtual devices so sharding
tests exercise a multi-chip mesh without TPU hardware, and expose the
read-only torch reference implementation for numerical-equivalence tests.
"""

import os
import sys

# Must be set before jax initializes its backends.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

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


for _name, _reg in list(_xla_bridge._backend_factories.items()):
    if _name != "cpu":
        _xla_bridge._backend_factories[_name] = _dataclasses.replace(
            _reg, factory=_disabled_backend_factory, fail_quietly=True
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

    # numpy 2.x removed the deprecated scalar aliases the (2021-era)
    # reference still uses (e.g. `np.float` in dust/utils/helper.py).
    # (np.object is left alone — probing it emits a FutureWarning and the
    # reference never touches it.)
    for alias, target in [("float", float), ("int", int), ("bool", bool)]:
        if alias not in np.__dict__:
            np.__dict__[alias] = target

    _install_reference_dep_shims()

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


def _install_reference_dep_shims():
    """Minimal stand-ins for reference deps missing from this image
    (gpytorch, KDEpy) so `dust.inference.svmpc` / `mpf` import. They
    reproduce exactly the numerics the reference exercises:
    gpytorch RBFKernel with its default lengthscale softplus(0) = ln 2
    (the reference never successfully changes it — `svmpc.py:78` typo),
    and KDEpy's 1-D Silverman rule."""
    import math
    import types

    import torch

    if "gpytorch" not in sys.modules:
        gpytorch = types.ModuleType("gpytorch")
        kernels = types.ModuleType("gpytorch.kernels")

        class _Lazy:
            def __init__(self, t):
                self._t = t

            def evaluate(self):
                return self._t

        class RBFKernel:
            def __init__(self):
                self.lengthscale = math.log(2.0)  # softplus(0)

            def __call__(self, x, y):
                d2 = torch.cdist(x, y) ** 2
                return _Lazy(torch.exp(-d2 / (2 * self.lengthscale**2)))

        kernels.RBFKernel = RBFKernel
        gpytorch.kernels = kernels
        sys.modules["gpytorch"] = gpytorch
        sys.modules["gpytorch.kernels"] = kernels

    if "KDEpy" not in sys.modules:
        kdepy = types.ModuleType("KDEpy")
        bw_selection = types.ModuleType("KDEpy.bw_selection")

        def silvermans_rule(data, weights=None):
            data = np.asarray(data).ravel()
            sigma = np.std(data, ddof=1)
            iqr = (
                np.percentile(data, 75) - np.percentile(data, 25)
            ) / 1.3489795003921634
            if iqr > 0:
                sigma = min(sigma, iqr)
            return sigma * (len(data) * 3 / 4.0) ** (-0.2)

        bw_selection.silvermans_rule = silvermans_rule
        kdepy.bw_selection = bw_selection
        sys.modules["KDEpy"] = kdepy
        sys.modules["KDEpy.bw_selection"] = bw_selection
