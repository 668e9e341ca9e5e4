"""Shared stand-ins for reference dependencies missing from this image.

Used by both the equivalence tests (tests/conftest.py) and the baseline
measurement (bench/reference_bench.py) so the numerically sensitive
constants live in exactly one place:

* numpy 2.x scalar aliases the 2021-era reference uses (np.float, ...)
* gpytorch.kernels.RBFKernel with its default lengthscale softplus(0) =
  ln 2 — the reference never successfully changes it (`svmpc.py:78` typo)
* KDEpy.bw_selection.silvermans_rule (1-D Silverman with the exact IQR
  normalizer 1.3489795003921634 and the (3n/4)^(-1/5) factor)
"""

from __future__ import annotations

import math
import sys
import types

import numpy as np


def install_reference_shims():
    import torch

    for alias, target in [("float", float), ("int", int), ("bool", bool)]:
        if alias not in np.__dict__:
            np.__dict__[alias] = target

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
