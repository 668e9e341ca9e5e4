"""Hypothesis property tests over the numerical core: invariants that
must hold for arbitrary shapes/values, not just the demo configurations."""

import jax
import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings, strategies as st

from dust_tpu.distributions import GMM, MVN
from dust_tpu.ops.bandwidth import bw_median, median_lower, silvermans_rule
from dust_tpu.ops.distance import squared_distance
from dust_tpu.ops.kernels import rbf_analytic, rbf_gram

_settings = settings(max_examples=25, deadline=None, derandomize=True)
# derandomize: the suite must be deterministic for CI/driver runs — a
# fresh random example failing only there would be unreproducible noise


@given(
    m=st.integers(2, 12),
    n=st.integers(2, 12),
    d=st.integers(1, 5),
    seed=st.integers(0, 2**16),
)
@_settings
def test_squared_distance_properties(m, n, d, seed):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(m, d)) * 10, jnp.float32)
    y = jnp.asarray(rng.normal(size=(n, d)) * 10, jnp.float32)
    dm = np.asarray(squared_distance(x, y))
    assert dm.shape == (m, n)
    assert (dm >= 0).all()
    # symmetry through the arguments
    dmt = np.asarray(squared_distance(y, x))
    np.testing.assert_allclose(dm, dmt.T, rtol=1e-4, atol=1e-3)
    # self-distance diagonal ~ 0
    ds = np.asarray(squared_distance(x, x))
    np.testing.assert_allclose(np.diagonal(ds), 0.0, atol=1e-3)


@given(
    m=st.integers(2, 10),
    d=st.integers(1, 4),
    bw=st.floats(0.1, 5.0),
    seed=st.integers(0, 2**16),
)
@_settings
def test_rbf_gram_properties(m, d, bw, seed):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(m, d)), jnp.float32)
    k = np.asarray(rbf_gram(x, x, bw))
    assert ((k >= 0) & (k <= 1.0 + 1e-6)).all()  # exp underflow -> exact 0
    np.testing.assert_allclose(k, k.T, atol=1e-6)          # symmetric
    np.testing.assert_allclose(np.diagonal(k), 1.0, atol=1e-5)  # gram-identity cancellation
    # PSD (Gaussian kernel): eigenvalues nonnegative up to f32 noise
    eigs = np.linalg.eigvalsh(k.astype(np.float64))
    assert eigs.min() > -1e-5


@given(
    m=st.integers(2, 10),
    d=st.integers(1, 4),
    seed=st.integers(0, 2**16),
)
@_settings
def test_rbf_analytic_gradient_is_antisymmetric(m, d, seed):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(m, d)), jnp.float32)
    k, dk, h = rbf_analytic(x, x)
    dk = np.asarray(dk)
    # dK[i,j] = K_ij (x_i - x_j) 2/h: antisymmetric in (i, j)
    np.testing.assert_allclose(dk, -np.swapaxes(dk, 0, 1), atol=1e-5)
    assert float(h) > 0


@given(seed=st.integers(0, 2**16), n=st.integers(3, 64))
@_settings
def test_median_and_bandwidths_positive(seed, n):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(n, 2)) * rng.uniform(0.1, 10),
                    jnp.float32)
    flat = np.asarray(x).ravel()
    med = float(median_lower(x))
    assert med in set(np.asarray(flat).tolist())  # an actual element
    assert float(bw_median(x)) > 0
    assert float(silvermans_rule(x)) > 0


@given(
    k=st.integers(1, 5),
    d=st.integers(1, 3),
    seed=st.integers(0, 2**16),
)
@_settings
def test_gmm_log_prob_bounded_by_components(k, d, seed):
    """Mixture density lies between min and max component density."""
    rng = np.random.default_rng(seed)
    locs = jnp.asarray(rng.normal(size=(k, d)), jnp.float32)
    gmm = GMM.from_cov(locs, jnp.ones(k), 0.5 * jnp.eye(d))
    x = jnp.asarray(rng.normal(size=(7, d)), jnp.float32)
    lp = np.asarray(gmm.log_prob(x))
    comp = np.asarray(gmm._component_log_prob(x))  # [7, k]
    assert (lp <= comp.max(axis=1) + 1e-4).all()
    assert (lp >= comp.min(axis=1) - 1e-4).all()
    # score is finite wherever log_prob is
    assert np.isfinite(np.asarray(gmm.score(x))).all()


@given(d=st.integers(1, 4), seed=st.integers(0, 2**16))
@_settings
def test_mvn_log_prob_max_at_mean(d, seed):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(d, d))
    cov = a @ a.T + d * np.eye(d)
    loc = rng.normal(size=d)
    mvn = MVN.from_cov(loc, cov)
    x = jnp.asarray(loc + rng.normal(size=(16, d)), jnp.float32)
    lp_x = np.asarray(mvn.log_prob(x))
    lp_mean = float(mvn.log_prob(jnp.asarray(loc, jnp.float32)))
    assert (lp_x <= lp_mean + 1e-4).all()


@given(seed=st.integers(0, 2**16), temp=st.floats(0.05, 5.0))
@_settings
def test_disco_forward_invariants(seed, temp):
    """Controller-update invariants for arbitrary noise/temperature:
    omega columns are probability vectors, a_mix is a probability vector,
    step() respects the action bounds."""
    from dust_tpu.controllers import MultiDisco
    from dust_tpu.models import PendulumModel
    from dust_tpu.spaces import Box

    rng = np.random.default_rng(seed)
    model = PendulumModel()

    def inst(s, a=None, **_):
        return 50.0 * (jnp.cos(s[..., 0]) - 1) ** 2 + s[..., 1] ** 2

    ctrl = MultiDisco(
        observation_space=Box(dim=2),
        action_space=Box(dim=1, low=-2.0, high=2.0),
        hz_len=6, n_policies=2, action_samples=8,
        temperature=temp, a_cov=4.0 * jnp.eye(1),
        inst_cost_fn=inst, term_cost_fn=inst, params_sampling="none",
    )
    dstate = ctrl.init_state(
        jnp.asarray(rng.normal(size=(2, 6, 1)) * 3, jnp.float32)
    )
    eps = jnp.asarray(rng.normal(size=(8, 2, 6, 1)) * 2, jnp.float32)
    state = jnp.asarray(rng.normal(size=(1, 2)) * 3, jnp.float32)

    dstate2, costs, _, _, omega, _ = ctrl.forward(
        dstate, state, model, eps_noise=eps
    )
    omega_np = np.asarray(omega)
    np.testing.assert_allclose(omega_np.sum(axis=0), 1.0, rtol=1e-3)
    assert (omega_np >= 0).all()
    np.testing.assert_allclose(float(np.asarray(dstate2.a_mix).sum()), 1.0,
                               rtol=1e-3)

    _, next_actions = ctrl.step(dstate2, strategy="argmax")
    a = np.asarray(next_actions)
    assert (a >= -2.0 - 1e-6).all() and (a <= 2.0 + 1e-6).all()
