"""Distance / bandwidth / kernel ops vs the torch reference implementations
(`dust/inference/svgd.py`, `dust/kernels/*`)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from dust_tpu.ops.bandwidth import bw_median, bw_silverman, silvermans_rule
from dust_tpu.ops.distance import squared_distance
from dust_tpu.ops.kernels import iid_mp, rbf_analytic, rbf_gram, rbf_gram_and_grad


def test_squared_distance_matches_reference(reference, rng):
    svgd = reference("dust.inference.svgd")
    x = rng.normal(size=(6, 4)).astype(np.float32)
    y = rng.normal(size=(5, 4)).astype(np.float32)
    ours = squared_distance(jnp.asarray(x), jnp.asarray(y))
    theirs = svgd.squared_distance(torch.tensor(x), torch.tensor(y))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-4)


def test_bw_median_matches_reference(reference, rng):
    svgd = reference("dust.inference.svgd")
    x = rng.normal(size=(8, 3)).astype(np.float32)
    ours = bw_median(jnp.asarray(x), bw_scale=1.7)
    theirs = svgd.bw_median(torch.tensor(x), bw_scale=1.7)
    np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-5)


def test_bw_silverman_matches_reference(reference, rng):
    svgd = reference("dust.inference.svgd")
    x = rng.normal(size=(50, 2)).astype(np.float32)
    ours = bw_silverman(jnp.asarray(x), bw_scale=1.3)
    theirs = svgd.bw_silverman(torch.tensor(x), bw_scale=1.3)
    np.testing.assert_allclose(
        np.atleast_1d(np.asarray(ours)),
        np.atleast_1d(theirs.numpy() if torch.is_tensor(theirs) else theirs),
        rtol=1e-4,
    )


def test_silvermans_rule_kdepy_convention(rng):
    """bw = min(std_ddof1, IQR/1.34898) * (3n/4)^(-1/5) — the KDEpy rule the
    reference calls per SVGD optimize (`dust/inference/svmpc.py:105`)."""
    x = rng.normal(size=300).astype(np.float32)
    sigma = min(
        np.std(x, ddof=1),
        (np.percentile(x, 75) - np.percentile(x, 25)) / 1.3489795003921634,
    )
    expected = sigma * (len(x) * 3 / 4.0) ** (-0.2)
    np.testing.assert_allclose(float(silvermans_rule(jnp.asarray(x))), expected,
                               rtol=1e-5)
    # jit-safe
    np.testing.assert_allclose(
        float(jax.jit(silvermans_rule)(jnp.asarray(x))), expected, rtol=1e-5
    )


def test_rbf_analytic_matches_reference(reference, rng):
    bk = reference("dust.kernels.base_kernels")
    x = rng.normal(size=(6, 4)).astype(np.float32)
    y = rng.normal(size=(6, 4)).astype(np.float32)

    for ell in (-1.0, 0.8):  # median trick and fixed bandwidth
        kernel = bk.RBF(bandwidth=ell, bw_scale=1.2)
        k_ref, dk_ref = kernel.eval(torch.tensor(x), torch.tensor(y))
        k, dk, _ = rbf_analytic(
            jnp.asarray(x), jnp.asarray(y), ell=ell, ell_scale=1.2
        )
        np.testing.assert_allclose(np.asarray(k), k_ref.numpy(), atol=2e-5)
        np.testing.assert_allclose(np.asarray(dk), dk_ref.numpy(), atol=2e-5)


def test_iid_mp_matches_reference(reference, rng):
    ck = reference("dust.kernels.composite_kernels")
    bk = reference("dust.kernels.base_kernels")
    m, h, d = 5, 4, 2
    x = rng.normal(size=(m, h * d)).astype(np.float32)
    y = rng.normal(size=(m, h * d)).astype(np.float32)

    for indep in (True, False):
        ref_kernel = ck.iid_mp(
            base_kernel=bk.RBF(bandwidth=-1), ctrl_dim=d, indep_controls=indep
        )
        k_ref, dk_ref = ref_kernel.eval(torch.tensor(x), torch.tensor(y))
        k, dk = iid_mp(jnp.asarray(x), jnp.asarray(y), ctrl_dim=d,
                       indep_controls=indep)
        np.testing.assert_allclose(np.asarray(k), k_ref.numpy(), atol=2e-5)
        np.testing.assert_allclose(np.asarray(dk), dk_ref.numpy(), atol=2e-5)


def test_rbf_gram_matches_default_kernel(reference, rng):
    svgd = reference("dust.inference.svgd")
    x = rng.normal(size=(7, 3)).astype(np.float32)
    bw = 0.83
    ours = rbf_gram(jnp.asarray(x), jnp.asarray(x), bw)
    theirs = svgd.default_kernel(
        torch.tensor(x), torch.tensor(x), bw=torch.tensor(bw)
    )
    np.testing.assert_allclose(np.asarray(ours), theirs.detach().numpy(), atol=1e-5)


def test_rbf_gram_grad_matches_torch_autograd(reference, rng):
    """Our closed-form grad of sum(K) == torch autograd through
    `default_kernel` with y detached (the `dust/inference/mpf.py:53-54`
    pattern)."""
    svgd = reference("dust.inference.svgd")
    x_np = rng.normal(size=(6, 3)).astype(np.float32)
    bw = 0.7

    x = torch.tensor(x_np, requires_grad=True)
    k = svgd.default_kernel(x, x.detach().clone(), bw=torch.tensor(bw))
    (grad_ref,) = torch.autograd.grad(k.sum(), x)

    k_ours, grad_ours = rbf_gram_and_grad(jnp.asarray(x_np), jnp.asarray(x_np), bw)
    np.testing.assert_allclose(np.asarray(k_ours), k.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(grad_ours), grad_ref.numpy(), atol=1e-5)


def test_rbf_gram_grad_matches_jax_autograd(rng):
    x = jnp.asarray(rng.normal(size=(5, 4)).astype(np.float32))
    bw = 1.1
    auto = jax.grad(lambda xs: rbf_gram(xs, jax.lax.stop_gradient(x), bw).sum())(x)
    _, analytic = rbf_gram_and_grad(x, x, bw)
    np.testing.assert_allclose(np.asarray(analytic), np.asarray(auto), atol=1e-5)


def test_squared_distance_far_from_origin():
    """The Gram identity loses the spread to cancellation when
    ||x|| >> spread unless the operands are centered first (the op
    centers internally; distances are translation invariant). Exact
    check: distances of offset data == distances of centered data."""
    rng = np.random.default_rng(7)
    base = rng.normal(size=(8, 6)).astype(np.float32) * 0.1
    offset = np.float32(1500.0)
    d2_near = squared_distance(jnp.asarray(base), jnp.asarray(base))
    d2_far = squared_distance(jnp.asarray(base + offset),
                              jnp.asarray(base + offset))
    # tolerance = input quantization: adding the offset rounds each
    # coordinate to ~offset * 2^-23 before the op runs; without the
    # internal centering the error would be O(1) here
    np.testing.assert_allclose(np.asarray(d2_far), np.asarray(d2_near),
                               atol=5e-3)
    # explicit-diff oracle
    diff = base[:, None, :] - base[None, :, :]
    np.testing.assert_allclose(np.asarray(d2_far),
                               (diff * diff).sum(-1), atol=5e-3)
