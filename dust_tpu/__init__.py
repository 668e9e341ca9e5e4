"""dust_tpu — a TPU-native Stein-variational MPC engine.

A brand-new JAX/XLA/Pallas framework with the capabilities of the DuSt-MPC
reference implementation (lubaroli/dust, RSS 2021): sampling-based MPC
(MPPI/DISCO), Stein variational gradient descent over control-sequence
particles (SV-MPC), and an online dynamics-parameter posterior (MPF) — the
dual Stein inference loop — designed TPU-first:

* models are pure, batched transition functions (`vmap`-able pytrees),
* horizon rollouts are `lax.scan`s inside one jitted device program,
* SVGD kernel Gram matrices + repulsion terms are fused device kernels
  (jnp reference path + Pallas TPU path for large particle counts),
* scenario / particle axes shard over a `jax.sharding.Mesh` with XLA
  collectives (psum / all_gather) over ICI.

Layer map (mirrors the reference's, see SURVEY.md §1):

    simulation.py          closed-loop MPC episode harness
      inference/           SVGD core, SVMPC, MPF, likelihoods
        controllers/       DISCO / AMPPI rollout & update engines
          models/          batched stochastic dynamics models
      ops/                 kernels, bandwidth rules, distances (+ Pallas)
      distributions.py     hand-rolled pytree distributions (MVN/GMM/…)
      parallel/            mesh + sharded scenario sweeps
"""

__version__ = "0.1.0"

from .spaces import Box
from .distributions import GMM, MVN, Normal, Uniform
from .models import (
    BaseModel,
    CartPoleModel,
    Particle,
    PendulumModel,
    SkidSteerRobot,
)
from .controllers import AMPPI, AMPPIState, DiscoState, MultiDisco
from .inference import (
    SVGD,
    SVMPC,
    SVMPCState,
    MPF,
    MPFState,
    CostLikelihood,
    ExpectedCost,
    ExponentiatedUtility,
    GaussianLikelihood,
    LikelihoodState,
)
from .simulation import PendulumSimulation, run_particle_episode

__all__ = [
    "Box", "GMM", "MVN", "Normal", "Uniform",
    "BaseModel", "CartPoleModel", "Particle", "PendulumModel",
    "SkidSteerRobot",
    "AMPPI", "AMPPIState", "DiscoState", "MultiDisco",
    "SVGD", "SVMPC", "SVMPCState", "MPF", "MPFState",
    "CostLikelihood", "ExpectedCost", "ExponentiatedUtility",
    "GaussianLikelihood", "LikelihoodState",
    "PendulumSimulation", "run_particle_episode",
]
