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
# drop every non-CPU backend factory before any backend is initialized.
from jax._src import xla_bridge as _xla_bridge

for _name in list(_xla_bridge._backend_factories):
    if _name != "cpu":
        _xla_bridge._backend_factories.pop(_name)

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
    for alias, target in [("float", float), ("int", int), ("bool", bool),
                          ("object", object)]:
        if not hasattr(np, alias):
            setattr(np, alias, target)

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
