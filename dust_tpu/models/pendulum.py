"""1-DOF inverted pendulum dynamics (gym Pendulum-style).

Pure-jnp counterpart of `dust/models/pendulum.py:9-108`: Euler update of
[theta, theta_dot] with torque clamp +-2 and speed clamp +-8. Fully
elementwise -> fuses into the rollout scan on the VPU.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from ..spaces import Box
from .base import BaseModel


class PendulumModel(BaseModel):
    MAX_SPEED = 8.0
    MAX_TORQUE = 2.0

    def __init__(self, g=9.8, mass=1.0, length=1.0, gym_v0_compat=False,
                 **kwargs):
        params_dict = {"g": g, "mass": mass, "length": length}
        super().__init__(params_dict=params_dict, **kwargs)
        bounds = [float("inf"), self.MAX_SPEED]
        self._observation_space = Box(dim=2, low=[-b for b in bounds], high=bounds)
        self._action_space = Box(dim=1, low=-self.MAX_TORQUE, high=self.MAX_TORQUE)
        # gym Pendulum-v0 (the reference's actual simulator,
        # `dust/utils/simulations.py:49-53`) advances theta with the
        # UNCLIPPED new theta_dot and clamps the speed afterwards —
        # the clamp order the reference's own model (and this one, by
        # default) reverses. PARITY #20; differs only when |theta_dot|
        # hits MAX_SPEED.
        self.gym_v0_compat = bool(gym_v0_compat)

    @property
    def observation_space(self):
        return self._observation_space

    @property
    def action_space(self):
        return self._action_space

    def step(self, states, actions, params=None, key=None):
        """Matches `dust/models/pendulum.py:82-100` numerics exactly."""
        del key  # deterministic model
        dt = self.dt
        theta = states[..., 0:1]
        theta_d = states[..., 1:2]
        g, m, length = self.resolve_params(params)

        acts = jnp.clip(actions, -self.MAX_TORQUE, self.MAX_TORQUE)
        theta_d = theta_d + dt * (
            -3.0 * g / (2.0 * length) * jnp.sin(theta + math.pi)
            + 3.0 / (m * length**2) * acts
        )
        if self.gym_v0_compat:
            # gym v0: theta advances with the unclipped speed
            theta = theta + theta_d * dt
            theta_d = jnp.clip(theta_d, -self.MAX_SPEED, self.MAX_SPEED)
        else:
            theta_d = jnp.clip(theta_d, -self.MAX_SPEED, self.MAX_SPEED)
            theta = theta + theta_d * dt  # uses the *new* theta_d
        return jnp.concatenate([theta, theta_d], axis=-1)

    @staticmethod
    def get_obs(state):
        """[theta, theta_dot] -> [cos, sin, theta_dot]
        (`dust/models/pendulum.py:102-108`)."""
        theta = state[..., 0:1]
        theta_d = state[..., 1:2]
        return jnp.concatenate([jnp.cos(theta), jnp.sin(theta), theta_d], axis=-1)
