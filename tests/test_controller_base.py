"""Derivative helpers (jacobian/hessian/linearize) — the reference
`BaseController.get_jacobian/get_hessian` surface."""

import jax.numpy as jnp
import numpy as np

from dust_tpu.controllers.base import get_hessian, get_jacobian, linearize_model
from dust_tpu.models import PendulumModel


def test_jacobian_of_quadratic():
    a = jnp.array([[2.0, 1.0], [0.0, 3.0]])
    jac = get_jacobian(lambda x: a @ x, jnp.array([1.0, -1.0]))
    np.testing.assert_allclose(np.asarray(jac), np.asarray(a), atol=1e-6)


def test_hessian_of_quadratic():
    h = get_hessian(lambda x: jnp.sum(x**2), jnp.array([1.0, 2.0, 3.0]))
    np.testing.assert_allclose(np.asarray(h), 2 * np.eye(3), atol=1e-6)


def test_linearize_pendulum():
    model = PendulumModel()
    state = jnp.array([0.1, 0.0])
    action = jnp.array([0.5])
    a_mat, b_mat = linearize_model(model, state, action)
    assert a_mat.shape == (2, 2) and b_mat.shape == (2, 1)
    # finite-difference check on A
    eps = 1e-4
    for i in range(2):
        ds = jnp.zeros(2).at[i].set(eps)
        fd = (model.step(state + ds, action) - model.step(state - ds, action)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(a_mat[:, i]), np.asarray(fd),
                                   atol=1e-2)
