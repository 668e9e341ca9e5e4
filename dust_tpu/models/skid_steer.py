"""Kinematic 4-wheel skid-steer robot (Kozlowski & Pazderski 2004).

Pure-jnp counterpart of `dust/models/skid_steer_robot.py:9-122`: state
[x, y, theta, v, omega], actions are right/left wheel speeds (clamped),
uncertain params are ICR x-offset, wheel radius and axial distance.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from ..spaces import Box
from .base import BaseModel


class SkidSteerRobot(BaseModel):
    def __init__(
        self,
        delta_t,
        x_icr=0.2,
        wheel_radius=0.0625,
        axial_distance=0.475,
        min_wheel_speed=-0.5,
        max_wheel_speed=0.5,
        **kwargs,
    ):
        params_dict = {
            "x_icr": x_icr,
            "wheel_radius": wheel_radius,
            "axial_distance": axial_distance,
        }
        super().__init__(dt=delta_t, params_dict=params_dict, **kwargs)
        self._observation_space = Box(dim=5)
        self._action_space = Box(dim=2, low=min_wheel_speed, high=max_wheel_speed)

    @property
    def observation_space(self):
        return self._observation_space

    @property
    def action_space(self):
        return self._action_space

    def step(self, states, actions, params=None, key=None):
        del key
        x = states[..., 0:1]
        y = states[..., 1:2]
        theta = states[..., 2:3]
        x_icr, wheel_radius, axial_distance = self.resolve_params(params)

        right = jnp.clip(
            actions[..., 0:1], self._action_space.low[0], self._action_space.high[0]
        )
        left = jnp.clip(
            actions[..., 1:2], self._action_space.low[1], self._action_space.high[1]
        )

        linear_speed = (right + left) * math.pi * wheel_radius
        angular_speed = (right - left) * 2 * math.pi * wheel_radius / axial_distance

        forward_shift = linear_speed * self.dt
        lateral_shift = -angular_speed * x_icr * self.dt

        new_x = x + forward_shift * jnp.cos(theta) - lateral_shift * jnp.sin(theta)
        new_y = y + forward_shift * jnp.sin(theta) + lateral_shift * jnp.cos(theta)
        new_theta = theta + angular_speed * self.dt
        ones = jnp.ones_like(x)
        return jnp.concatenate(
            [new_x, new_y, new_theta, linear_speed * ones, angular_speed * ones],
            axis=-1,
        )
