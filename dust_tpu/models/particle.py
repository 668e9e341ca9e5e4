"""2-D point-mass navigation model with occupancy-grid obstacles.

Pure-jnp counterpart of `dust/models/particle.py:11-334`: single/double
integrator (velocity or acceleration control), optional control-channel
Gaussian noise (explicit PRNG key instead of the reference's hidden
`torch.randn_like`, `particle.py:147`), crash semantics where collided
particles freeze in place (`particle.py:155-163` — already a mask there,
kept branchless here), and the built-in quadratic + obstacle cost
functions (`particle.py:170-225`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..spaces import Box
from .base import BaseModel
from .obstacle_map import generate_obstacle_map, get_obst_preset


class Particle(BaseModel):
    def __init__(
        self,
        mass=1.0,
        noise_std=(0.0, 0.0),
        control_type="acceleration",
        cost_params=None,
        with_obstacle=False,
        obst_preset=None,
        obst_width=None,
        obst_params=None,
        map_size=None,
        map_type=None,
        map_cell_size=None,
        init_state=None,
        target_state=None,
        can_crash=False,
        max_speed=None,
        max_accel=None,
        verbose=False,
        deterministic=False,
        euler_steps=1,
        **kwargs,
    ):
        params_dict = {"mass": float(np.asarray(mass))}
        super().__init__(params_dict=params_dict, **kwargs)
        self.max_speed = float("inf") if max_speed is None else float(max_speed)
        self.max_acc = float("inf") if max_accel is None else float(max_accel)
        self.control_type = control_type
        if control_type == "velocity":
            self._observation_space = Box(dim=2)
            self._action_space = Box(dim=2, low=-self.max_speed, high=self.max_speed)
        elif control_type == "acceleration":
            bounds = [np.inf, np.inf, self.max_speed, self.max_speed]
            self._observation_space = Box(
                dim=4, low=[-b for b in bounds], high=bounds
            )
            self._action_space = Box(dim=2, low=-self.max_acc, high=self.max_acc)
        else:
            raise IOError(f'control_type "{control_type}" not recognized')

        dim_s = self._observation_space.dim
        self.target = (
            jnp.zeros(dim_s)
            if target_state is None
            else jnp.asarray(target_state, dtype=jnp.float32)
        )
        self.dyn_std = jnp.asarray(noise_std, dtype=jnp.float32)
        self.init_state = (
            None if init_state is None else jnp.asarray(init_state, jnp.float32)
        )
        self.euler_steps = euler_steps
        self.deterministic = bool(deterministic)
        self.with_obstacle = bool(with_obstacle)
        self.can_crash = bool(can_crash)
        self.verbose = verbose

        self.obst_map = None
        if self.with_obstacle:
            self.obst_params = get_obst_preset(obst_preset, obst_width)
            self.obst_map = generate_obstacle_map(
                map_size, self.obst_params, map_cell_size, map_type=map_type
            )
        self.map_cell_size = map_cell_size
        self.map_size = map_size

        self.init_cost_weights(cost_params)

    @property
    def observation_space(self):
        return self._observation_space

    @property
    def action_space(self):
        return self._action_space

    def step(self, states, actions, params=None, key=None):
        """`dust/models/particle.py:117-166` numerics; `key` supplies the
        control noise when the model is stochastic."""
        (m,) = self.resolve_params(params)
        acts = actions
        if not self.deterministic and key is not None:
            acts = acts + self.dyn_std * jax.random.normal(
                key, acts.shape, dtype=acts.dtype
            )
        if self.control_type == "acceleration":
            acts = jnp.clip(acts / m, -self.max_acc, self.max_acc)
        else:
            acts = jnp.clip(acts, -self.max_speed, self.max_speed)
        x_dot = jnp.concatenate([states[..., 2:], acts], axis=-1)
        if self.can_crash and self.with_obstacle:
            # Collided particles have "crashed" and freeze in place.
            collision = self.obst_map.get_collisions(states[..., 0:2])[..., None]
            next_states = states + x_dot * self.dt * (1.0 - collision)
        else:
            next_states = states + x_dot * self.dt
        vel = jnp.clip(next_states[..., -2:], -self.max_speed, self.max_speed)
        return jnp.concatenate([next_states[..., :-2], vel], axis=-1)

    # -- built-in cost functions (`dust/models/particle.py:170-225`) -------

    def default_inst_cost(self, states, actions=0.0, **_):
        if self.with_obstacle:
            obst_cost = self.w_obs * self.obst_map.get_collisions(states[..., 0:2])
        else:
            obst_cost = 0.0
        delta = states - self.target
        state_cost = jnp.sum(delta * delta * self.w_state, axis=-1)
        control_cost = jnp.sum(
            jnp.square(jnp.asarray(actions)) * self.w_ctrl, axis=-1
        )
        return state_cost + control_cost + obst_cost

    def default_term_cost(self, states, **_):
        if self.with_obstacle:
            obst_cost = self.w_obs * self.obst_map.get_collisions(states[..., 0:2])
        else:
            obst_cost = 0.0
        delta = states - self.target
        return jnp.sum(delta * delta * self.w_term, axis=-1) + obst_cost

    def init_cost_weights(self, params):
        """Cost-weight vectors (`dust/models/particle.py:292-326`)."""
        if params is None:
            params = dict.fromkeys(
                ["w_qpos", "w_qvel", "w_qpos_T", "w_qvel_T", "w_ctrl", "w_obs"], 1.0
            )
        w_qpos = [params["w_qpos"]] * 2
        w_qvel = [params["w_qvel"]] * 2
        if self.control_type == "velocity":
            self.w_state = jnp.asarray(w_qpos, dtype=jnp.float32)
        else:
            self.w_state = jnp.asarray(w_qpos + w_qvel, dtype=jnp.float32)
        self.w_ctrl = jnp.asarray(
            [params["w_ctrl"]] * self._action_space.dim, dtype=jnp.float32
        )
        w_qpos_t = [params["w_qpos_T"]] * 2
        w_qvel_t = [params["w_qvel_T"]] * 2
        if self.control_type == "velocity":
            self.w_term = jnp.asarray(w_qpos_t, dtype=jnp.float32)
        else:
            self.w_term = jnp.asarray(w_qpos_t + w_qvel_t, dtype=jnp.float32)
        self.w_obs = jnp.float32(params["w_obs"])

    def to_map_coord(self, coord_vec):
        """World -> map-cell coordinates (`dust/models/particle.py:288-290`)."""
        return (
            jnp.asarray(self.obst_map.c_offset)
            + jnp.asarray(coord_vec) / self.map_cell_size
        )
