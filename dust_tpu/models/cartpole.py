"""Cart-pole with friction (Barto, Sutton & Anderson 1983).

Pure-jnp counterpart of `dust/models/cartpole.py:8-172`, with the
reference's two latent bugs fixed (they make its `step` unusable — SURVEY.md
§7.4.2): total mass is `mass_cart + mass_pole` (the reference computes
`m_c + m_c`, `cartpole.py:161`), and the sampled-params path works (the
reference references a name-mangled nonexistent attribute,
`cartpole.py:151,156`).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from ..spaces import Box
from .base import BaseModel


class CartPoleModel(BaseModel):
    def __init__(
        self,
        g=9.8,
        f_mag=10.0,
        mass_cart=1.0,
        mass_pole=0.1,
        length=1.0,
        mu_c=0.5e-3,
        mu_p=2e-6,
        **kwargs,
    ):
        params_dict = {
            "g": g,
            "mass_cart": mass_cart,
            "mass_pole": mass_pole,
            "length": length,
            "mu_c": mu_c,
            "mu_p": mu_p,
            "f_mag": f_mag,
        }
        super().__init__(params_dict=params_dict, **kwargs)
        self.theta_threshold_radians = 12 * 2 * math.pi / 360
        self.x_threshold = 2.4
        high = [
            self.x_threshold * 2,
            float("inf"),
            self.theta_threshold_radians * 2,
            float("inf"),
        ]
        self._action_space = Box(dim=1, low=-1, high=1)
        self._observation_space = Box(dim=4, low=[-h for h in high], high=high)

    @property
    def observation_space(self):
        return self._observation_space

    @property
    def action_space(self):
        return self._action_space

    def step(self, states, actions, params=None, key=None):
        del key
        dt = self.dt
        x_d = states[..., 1:2]
        theta = states[..., 2:3]
        theta_d = states[..., 3:4]
        g, m_c, m_p, length, mu_c, mu_p, f_mag = self.resolve_params(params)

        acts = jnp.clip(actions, -1.0, 1.0) * f_mag
        mass = m_c + m_p  # total mass (reference bug: m_c + m_c)
        pm = m_p * length
        cart_friction = mu_c * jnp.sign(x_d)
        pole_friction = (mu_p * theta_d) / pm
        factor = (acts + pm * jnp.sin(theta) * theta_d**2 - cart_friction) / mass
        tdd_num = g * jnp.sin(theta) - jnp.cos(theta) * factor - pole_friction
        tdd_den = length * (4.0 / 3 - (m_p * jnp.cos(theta) ** 2) / mass)
        theta_dd = tdd_num / tdd_den
        x_dd = factor - pm * theta_dd * jnp.cos(theta) / mass
        delta = jnp.concatenate([x_d, x_dd, theta_d, theta_dd], axis=-1) * dt
        return states + delta
