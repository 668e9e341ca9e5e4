from .base import BaseModel
from .pendulum import PendulumModel
from .particle import Particle
from .cartpole import CartPoleModel
from .skid_steer import SkidSteerRobot

__all__ = [
    "BaseModel",
    "PendulumModel",
    "Particle",
    "CartPoleModel",
    "SkidSteerRobot",
]
