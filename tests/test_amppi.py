"""AMPPI vs the torch reference `dust/controllers/amppi.py` with injected
actions (params_sampling='none' so no RNG is involved)."""

import jax.numpy as jnp
import numpy as np
import torch

from dust_tpu.controllers import AMPPI
from dust_tpu.models import PendulumModel
from dust_tpu.spaces import Box
from tests.test_disco import (
    inst_cost_jnp,
    inst_cost_torch,
    term_cost_jnp,
    term_cost_torch,
)

HORIZON = 10
N_SAMPLES = 32


def test_update_actions_matches_reference(reference, rng):
    ref_amppi = reference("dust.controllers.amppi")
    ref_pend = reference("dust.models.pendulum")

    model_t = ref_pend.PendulumModel()
    model_j = PendulumModel()

    theirs = ref_amppi.AMPPI(
        observation_space=model_t.observation_space,
        action_space=model_t.action_space,
        hz_len=HORIZON,
        n_samples=N_SAMPLES,
        lambda_=0.8,
        a_cov=1.5**2 * torch.eye(1),
        inst_cost_fn=inst_cost_torch,
        term_cost_fn=term_cost_torch,
        params_sampling="none",
    )
    ours = AMPPI(
        observation_space=Box(dim=2),
        action_space=Box(dim=1, low=-2.0, high=2.0),
        hz_len=HORIZON,
        n_samples=N_SAMPLES,
        lambda_=0.8,
        a_cov=1.5**2 * jnp.eye(1),
        inst_cost_fn=inst_cost_jnp,
        term_cost_fn=term_cost_jnp,
        params_sampling="none",
    )

    a_seq0 = rng.normal(size=(HORIZON, 1)).astype(np.float32)
    ext = rng.normal(size=(N_SAMPLES, HORIZON, 1)).astype(np.float32) * 1.5
    state = np.array([[2.5, -0.3]], dtype=np.float32)

    theirs.a_seq = torch.tensor(a_seq0)
    costs_t, states_t, acts_t, omega_t = theirs.update_actions(
        model_t, torch.tensor(state), actions=torch.tensor(ext)
    )

    astate = ours.init_state(a_seq0)
    astate2, costs_j, states_j, acts_j, omega_j = ours.update_actions(
        astate, jnp.asarray(state), model_j, ext_actions=jnp.asarray(ext)
    )

    np.testing.assert_allclose(np.asarray(costs_j), costs_t.numpy(), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(states_j), states_t.numpy(), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(omega_j), omega_t.exp().numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(astate2.a_seq), theirs.a_seq.numpy(), atol=1e-4
    )


def test_update_actions_sampled_params_modes(rng):
    """'extended' and 'single' parameter sampling run and broadcast
    correctly (regression: a spurious batch axis used to break the
    rollout scan carry)."""
    import jax

    from dust_tpu.distributions import Uniform
    from dust_tpu.models import PendulumModel as JPendulum

    model = JPendulum(uncertain_params=("length", "mass"))
    dist = Uniform(jnp.array([0.6, 0.6]), jnp.array([1.3, 1.3]),
                   event_ndims=1)
    for mode in ("extended", "single"):
        ours = AMPPI(
            observation_space=Box(dim=2),
            action_space=Box(dim=1, low=-2.0, high=2.0),
            hz_len=HORIZON,
            n_samples=N_SAMPLES,
            a_cov=1.5**2 * jnp.eye(1),
            inst_cost_fn=inst_cost_jnp,
            term_cost_fn=term_cost_jnp,
            params_sampling=mode,
        )
        astate = ours.init_state()
        astate, costs, states, _, omega = ours.update_actions(
            astate, jnp.array([[2.5, -0.3]]), model, params_dist=dist,
            key=jax.random.key(0),
        )
        assert states.shape == (N_SAMPLES, HORIZON + 1, 2)
        assert np.isfinite(np.asarray(costs)).all()
        np.testing.assert_allclose(float(omega.sum()), 1.0, rtol=1e-5)
