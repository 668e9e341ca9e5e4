from .svgd import SVGD
from .likelihoods import (
    CostLikelihood,
    ExpectedCost,
    ExponentiatedUtility,
    GaussianLikelihood,
    LikelihoodState,
)
from .svmpc import SVMPC, SVMPCState
from .mpf import MPF, MPFState

__all__ = [
    "SVGD",
    "CostLikelihood",
    "ExpectedCost",
    "ExponentiatedUtility",
    "GaussianLikelihood",
    "LikelihoodState",
    "SVMPC",
    "SVMPCState",
    "MPF",
    "MPFState",
]
