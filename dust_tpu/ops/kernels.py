"""RBF kernel Gram matrices and their analytic gradients (jnp path).

The reference has three kernel code paths (SURVEY.md §2.1 #4, #8, #9):

* `default_kernel` / gpytorch `RBFKernel`: K = exp(-d^2 / (2 bw^2)),
  gradient via autograd (`dust/inference/svgd.py:92-99`,
  `dust/inference/mpf.py:53-56`, `dust/inference/svmpc.py:76-83`).
* analytic `RBF.eval`: K = exp(-d^2 / h) with h a *squared* bandwidth
  (median trick with h / log(m+1)), and closed-form dK/dX
  (`dust/kernels/base_kernels.py:53-108`). Note the bandwidth conventions
  intentionally differ between these two families — we reproduce both.
* `iid_mp` message-passing kernel: the analytic RBF evaluated independently
  per (timestep, control-dim) slice (`dust/kernels/composite_kernels.py:33-64`
  — a Python double loop there; a single vmap here).

Everything is pure jnp and jit-safe; `pallas_svgd.py` provides a fused TPU
kernel for large particle counts with these functions as the reference
semantics.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .bandwidth import median_lower
from .distance import squared_distance


def rbf_gram(x, y, bw):
    """K = exp(-||x-y||^2 / (2 bw^2)) on row vectors; the
    `default_kernel` / gpytorch convention (`dust/inference/svgd.py:92-99`)."""
    return jnp.exp(-squared_distance(x, y) / (bw**2) / 2.0)


def rbf_gram_and_grad(x, y, bw):
    """Gram matrix K [m, n] and the gradient of sum(K) w.r.t. x, [m, d].

    Equals `torch.autograd.grad(k_xx.sum(), x)` with y detached
    (`dust/inference/mpf.py:53-54`): dsum/dx_i = sum_j K_ij (y_j - x_i)/bw^2.
    """
    k = rbf_gram(x, y, bw)
    inv = 1.0 / (bw**2)
    grad = (k @ y - jnp.sum(k, axis=1, keepdims=True) * x) * inv
    return k, grad


def rbf_analytic(x, y, ell=-1.0, ell_scale=1.0, minimum_bw=1e-5):
    """Analytic RBF with reference `RBF.eval` semantics
    (`dust/kernels/base_kernels.py:53-108`).

    h (a *squared* bandwidth) is median(d^2) when ell < 0 else ell^2, then
    divided by log(m+1) (Liu et al. 2017 variant), scaled and clamped.
    Returns (K [m, m], dK/dX [m, m, d], h).
    """
    pw = squared_distance(x, y)
    ell = jnp.asarray(ell, dtype=pw.dtype)
    # torch.median convention (lower middle element) for exact parity
    h = jnp.where(ell < 0, median_lower(pw), ell**2)
    h = h / jnp.log(x.shape[0] + 1.0)
    h = jnp.maximum(ell_scale * h, minimum_bw)
    k = jnp.exp(-pw / h)
    dk = k[:, :, None] * (x[:, None, :] - y[None, :, :]) * 2.0 / h
    return k, dk, h


def iid_mp(x, y, ctrl_dim, indep_controls=True, ell=-1.0, ell_scale=1.0,
           minimum_bw=1e-5):
    """Message-passing kernel: analytic RBF per timestep (and per control
    dim when `indep_controls`), stacked to [m, m, h*d].

    Mirrors `dust/kernels/composite_kernels.py:33-64` but replaces the
    Python double loop with one vmap over the slice axis.
    Returns (K [m, m, h*d], dK [m, m, h*d]).
    """
    m = x.shape[0]
    xs = x.reshape(m, -1, ctrl_dim)
    ys = y.reshape(m, -1, ctrl_dim)
    h = xs.shape[1]

    eval_slice = partial(
        rbf_analytic, ell=ell, ell_scale=ell_scale, minimum_bw=minimum_bw
    )

    if indep_controls:
        # [h*d] slices of scalar inputs [m, 1]
        xt = xs.reshape(m, h * ctrl_dim).T[:, :, None]   # [h*d, m, 1]
        yt = ys.reshape(m, h * ctrl_dim).T[:, :, None]
        k, dk, _ = jax.vmap(eval_slice)(xt, yt)          # [h*d, m, m(,1)]
        k = jnp.moveaxis(k, 0, -1)                        # [m, m, h*d]
        dk = jnp.moveaxis(dk[..., 0], 0, -1)              # [m, m, h*d]
    else:
        # [h] slices of [m, d] inputs; K per slice broadcast over d
        xt = jnp.moveaxis(xs, 1, 0)                       # [h, m, d]
        yt = jnp.moveaxis(ys, 1, 0)
        k, dk, _ = jax.vmap(eval_slice)(xt, yt)           # [h, m, m(,d)]
        k = jnp.repeat(k[..., None], ctrl_dim, axis=-1)   # [h, m, m, d]
        k = jnp.moveaxis(k, 0, 2).reshape(m, m, h * ctrl_dim)
        dk = jnp.moveaxis(dk, 0, 2).reshape(m, m, h * ctrl_dim)
    return k, dk
