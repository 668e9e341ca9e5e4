"""Controller support utilities: derivative helpers.

The reference's `BaseController` carries autograd Jacobian/Hessian helpers
built from per-element `torch.autograd.grad` loops
(`dust/controllers/base.py:82-149`). In JAX these are one-liners over the
whole batch — provided here with the same surface for users migrating
gradient-based extensions (e.g. iLQR-style linearization of a model's
`step`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def get_jacobian(func, inputs):
    """Jacobian of `func` at `inputs`, shaped
    (out_size, in_size) over flattened input/output — the reference's
    `BaseController.get_jacobian` contract (`base.py:82-124`)."""
    inputs = jnp.asarray(inputs)

    def flat_func(x_flat):
        out = func(x_flat.reshape(inputs.shape))
        return jnp.ravel(out)

    return jax.jacobian(flat_func)(jnp.ravel(inputs))


def get_hessian(func, inputs):
    """Hessian of a scalar-valued `func` at `inputs` over the flattened
    input (`base.py:126-149`; the reference builds it row-by-row from a
    kept Jacobian graph)."""
    inputs = jnp.asarray(inputs)

    def flat_func(x_flat):
        return jnp.sum(func(x_flat.reshape(inputs.shape)))

    return jax.hessian(flat_func)(jnp.ravel(inputs))


def linearize_model(model, state, action, params=None):
    """(A, B) = d step / d (state, action) — the discrete-time
    linearization every gradient-based MPC extension needs; batched over
    leading axes via vmap if desired."""
    f_s = jax.jacobian(lambda s: model.step(s, action, params))(state)
    f_a = jax.jacobian(lambda a: model.step(state, a, params))(action)
    return f_s, f_a
