"""Closed-loop particle-navigation DuSt equivalence vs the torch
reference — the reference's second flagship experiment
(`demo/particle_example.py:177-242`): obstacle grid, crash semantics,
simulator mass change at steps//4, log-space MPF, warm-up gating,
deterministic dynamics.

Mirrors tests/test_equivalence_dual.py (all randomness injected
identically: action-sample noise via rsample patching, dynamics draws
via stub distributions; rollout dynamics frozen to the stub to sidestep
the reference's live-prior aliasing, PARITY #6; SVGD bandwidth via the
demo's KDEpy-Silverman path on both sides), with two protocol
adjustments this task REQUIRES — both verified necessary while building
the test:

1. Cost weights are the demo's scaled by 1e-3. The demo's magnitudes
   (`particle_config.yaml:48-54`: w_obs=1e6, w_qpos_T=1e3) put rollout
   costs at O(1e5), so the float32 cost arithmetic carries O(0.1)
   ABSOLUTE error into the softmax exponents (1e5 * eps_f32) — the
   per-sample weights then differ ~10% between any two float32
   implementations of the same math, and no cross-framework action
   comparison is well-posed at any tolerance. Scaling all six weights
   together preserves the cost structure (obstacles still dominate by
   1e3) and every code path; it only brings the exponents into the
   regime where float32 noise is small.
2. The small config free-runs its closed loop end to end. At the demo
   shapes (6 particles x 64 samples) near-tied particle weights appear
   within a couple of live steps and a ~1e-4 accumulated drift flips
   the argmax on one side — chaotic divergence, not a math difference
   (the flipped-to particle's weight matches to float noise). The
   demo-scale case therefore re-syncs our solver state to the
   reference's after each compared step, so every step of the full dual
   loop is compared on identical inputs across all 10 demo steps.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import torch
import yaml

from dust_tpu.controllers import MultiDisco
from dust_tpu.controllers.disco import DiscoState
from dust_tpu.distributions import GMM
from dust_tpu.inference import (
    ExponentiatedUtility,
    GaussianLikelihood,
    MPF,
    SVMPC,
)
from dust_tpu.models import Particle
from dust_tpu.ops.bandwidth import silvermans_rule

# demo/particle_config.yaml env_params (obstacle grid_4x4, 220x220-cell
# map, deterministic double integrator), cost weights scaled (see
# module docstring, point 1)
with open("/root/reference/demo/particle_config.yaml") as _f:
    _CFG = yaml.safe_load(_f)
ENV = dict(_CFG["env_params"])
ENV["cost_params"] = {k: v * 1e-3 for k, v in ENV["cost_params"].items()}

SMALL = dict(M=3, HORIZON=10, N_SAMPLES=16, N_PARAMS=2, T_STEPS=6,
             WARM_UP=1, MPF_N=12, MPF_STEPS=5, SYNC=False)
# the literal demo shapes (`demo/particle_config.yaml` exp/sim params):
# horizon 40, 6 particles, 64 action samples, 4 param draws, 50 MPF
# particles x 20 steps, steps 10, warm-up 5, mass change at 10//4 = 2
DEMO = dict(M=6, HORIZON=40, N_SAMPLES=64, N_PARAMS=4, T_STEPS=10,
            WARM_UP=5, MPF_N=50, MPF_STEPS=20, SYNC=True)

ALPHA, LR, PRIOR_SIGMA, CTRL_SIGMA = 1.0, 100.0, 5.0, 5.0
MPF_LR, MPF_BW0, MPF_BW, OBS_STD = 0.01, 0.1, 0.5, 0.1
BASE_MASS, LOAD = 2.0, 1.0
CTRL_DIM = 2


class _TorchParamStub:
    def __init__(self, draws, log_ps):
        self.draws = draws
        self.log_ps = log_ps
        self.i = 0
        self.event_shape = torch.Size([draws.shape[-1]])

    def sample(self, shape):
        return torch.tensor(self.draws[self.i % len(self.draws)])

    def log_prob(self, x):
        lp = torch.tensor(self.log_ps[self.i % len(self.log_ps)])
        self.i += 1
        return lp


class _JnpParamStub:
    def __init__(self, draws, log_ps):
        self.draws = jnp.asarray(draws)
        self.log_ps = jnp.asarray(log_ps)
        self.i = 0

    def sample(self, key, shape):
        return self.draws[self.i % len(self.draws)]

    def log_prob(self, x):
        lp = self.log_ps[self.i % len(self.log_ps)]
        self.i += 1
        return lp


def _t2j(t):
    # np.array(copy=True) is load-bearing: torch's `.numpy()` is a VIEW
    # of the tensor storage, and CPU JAX may zero-copy alias it — the
    # reference's in-place SGD updates would then mutate the synced jax
    # arrays from the outside
    return jnp.asarray(np.array(t.detach().numpy(), copy=True))


@pytest.mark.parametrize("cfg", [SMALL, DEMO],
                         ids=["small_freerun", "demo_scale_synced"])
def test_particle_dual_loop_matches_reference(reference, rng, cfg):
    M, HORIZON, N_SAMPLES, N_PARAMS = (
        cfg["M"], cfg["HORIZON"], cfg["N_SAMPLES"], cfg["N_PARAMS"]
    )
    T_STEPS, WARM_UP, MPF_STEPS = (
        cfg["T_STEPS"], cfg["WARM_UP"], cfg["MPF_STEPS"]
    )
    theta0 = rng.normal(size=(M, HORIZON, CTRL_DIM)).astype(np.float32)
    locs0 = rng.normal(size=(M, HORIZON, CTRL_DIM)).astype(np.float32)
    # log-space mass particles around log(2): Normal(2, 0.1) clamped+log
    mpf0 = np.log(
        np.clip(rng.normal(2.0, 0.1, size=(cfg["MPF_N"], 1)), 1e-6, None)
    ).astype(np.float32)
    noise_seq = rng.normal(
        size=(T_STEPS, N_SAMPLES, M, HORIZON, CTRL_DIM)
    ).astype(np.float32)
    # log-mass rollout draws near the true value
    param_draws = np.log(rng.uniform(
        1.5, 2.5, size=(T_STEPS, N_PARAMS, 1)
    )).astype(np.float32)
    param_lps = rng.normal(size=(T_STEPS, N_PARAMS)).astype(np.float32)

    # ---- reference stack ------------------------------------------------
    ref_svmpc_mod = reference("dust.inference.svmpc")
    ref_lik_mod = reference("dust.inference.likelihoods")
    ref_disco_mod = reference("dust.controllers.disco")
    ref_particle = reference("dust.models.particle")
    ref_svgd = reference("dust.inference.svgd")
    ref_mpf_mod = reference("dust.inference.mpf")
    from gpytorch.kernels import RBFKernel  # shimmed

    # mass is a tensor in the demo (`dynamics_prior.mean`), and the
    # mass-change line calls .clone() on it
    system_kwargs = {"uncertain_params": ["mass"],
                     "mass": torch.tensor(BASE_MASS)}
    system_r = ref_particle.Particle(**ENV, **system_kwargs)
    model_r = ref_particle.Particle(**ENV, **system_kwargs)
    ctrl_r = ref_disco_mod.MultiDISCO(
        model_r.observation_space,
        model_r.action_space,
        HORIZON,
        M,
        N_SAMPLES,
        temperature=1 / ALPHA,
        a_cov=CTRL_SIGMA**2 * torch.eye(CTRL_DIM),
        params_sampling=True,
        params_samples=N_PARAMS,
        params_log_space=True,
        inst_cost_fn=model_r.default_inst_cost,
        term_cost_fn=model_r.default_term_cost,
    )
    prior_r = ref_svgd.get_gmm(
        torch.tensor(locs0), torch.ones(M),
        PRIOR_SIGMA**2 * torch.eye(CTRL_DIM),
    )
    lik_r = ref_lik_mod.ExponentiatedUtility(
        ALPHA, controller=ctrl_r, model=model_r, n_samples=N_SAMPLES
    )
    svmpc_r = ref_svmpc_mod.SVMPC(
        init_particles=torch.tensor(theta0.copy()),
        prior=prior_r,
        likelihood=lik_r,
        kernel=RBFKernel(),
        n_particles=M,
        bw_scale=1.0,
        n_steps=1,
        optimizer_class=torch.optim.SGD,
        lr=LR,
        weighted_prior=True,
    )
    state_r = torch.as_tensor(ENV["init_state"]).clone().float()
    dyn_lik_r = ref_lik_mod.GaussianLikelihood(
        initial_obs=state_r,
        obs_std=OBS_STD,
        model=model_r,
        log_space=True,
    )
    mpf_r = ref_mpf_mod.MPF(
        init_particles=torch.tensor(mpf0.copy()),
        likelihood=dyn_lik_r,
        optimizer_class=torch.optim.SGD,
        lr=MPF_LR,
        bw=MPF_BW0,
        bw_scale=1.0,
    )

    # ---- our stack -------------------------------------------------------
    model_j = Particle(uncertain_params=["mass"], mass=BASE_MASS, **ENV)
    ctrl_j = MultiDisco(
        observation_space=model_j.observation_space,
        action_space=model_j.action_space,
        hz_len=HORIZON,
        n_policies=M,
        action_samples=N_SAMPLES,
        params_samples=N_PARAMS,
        temperature=1 / ALPHA,
        a_cov=CTRL_SIGMA**2 * jnp.eye(CTRL_DIM),
        inst_cost_fn=model_j.default_inst_cost,
        term_cost_fn=model_j.default_term_cost,
        params_sampling=True,
        params_log_space=True,
    )
    lik_j = ExponentiatedUtility(
        alpha=ALPHA, n_samples=N_SAMPLES, controller=ctrl_j, model=model_j
    )
    svmpc_j = SVMPC(
        likelihood=lik_j, kernel="rbf", ctrl_dim=CTRL_DIM, n_particles=M,
        n_steps=1, optimizer=optax.sgd(LR), bw_scale=1.0,
        weighted_prior=True, reference_compat=True,
    )
    svstate = svmpc_j.init_state(
        jnp.asarray(theta0),
        GMM.from_cov(jnp.asarray(locs0), jnp.ones(M),
                     PRIOR_SIGMA**2 * jnp.eye(CTRL_DIM)),
    )
    dstate = ctrl_j.init_state()
    state_j = jnp.asarray(ENV["init_state"], jnp.float32)
    dyn_lik_j = GaussianLikelihood(
        obs_std=OBS_STD,
        model=Particle(uncertain_params=["mass"], mass=BASE_MASS, **ENV),
        log_space=True,
    )
    mpf_j = MPF(likelihood=dyn_lik_j, optimizer=optax.sgd(MPF_LR),
                reference_compat=True)
    mstate = mpf_j.init_state(jnp.asarray(mpf0), state_j, dim_a=CTRL_DIM,
                              bw=MPF_BW0)

    stub_r = _TorchParamStub(param_draws, param_lps)
    stub_j = _JnpParamStub(param_draws, param_lps)
    tril = torch.linalg.cholesky(CTRL_SIGMA**2 * torch.eye(CTRL_DIM))
    step_idx = {"t": 0}

    def fake_rsample(self, shape):
        eps = torch.tensor(noise_seq[step_idx["t"]])
        return self.base_dist.loc + eps @ tril.T

    key = jax.random.key(0)  # unused: all noise injected
    mass_j = BASE_MASS
    compared = 0
    # looser tolerances for the free-running case: drift compounds
    # through the closed loop (observed max ~4e-2 on actions at step 5)
    atol_act = 5e-3 if cfg["SYNC"] else 0.15
    atol_state = 1e-3 if cfg["SYNC"] else 1e-3
    atol_mpf = 2e-2 if cfg["SYNC"] else 1e-2
    atol_w = 0.05 if cfg["SYNC"] else 0.2
    cliff_steps = 0
    orig = torch.distributions.Independent.rsample
    torch.distributions.Independent.rsample = fake_rsample
    try:
        for t in range(T_STEPS):
            if t == T_STEPS // 4:  # simulator mass change
                system_r.params_dict["mass"] = (
                    system_r.params_dict["mass"].clone() + LOAD
                )
                mass_j = mass_j + LOAD

            # --- reference step ---
            svmpc_r.optimize(state_r, stub_r)
            if t < WARM_UP:
                action_r = torch.zeros(CTRL_DIM)
                w_r = None
            else:
                a_seq_r, w_r = svmpc_r.forward(state_r, stub_r)
                action_r = a_seq_r[0]
            with torch.no_grad():
                state_r = system_r.step(state_r, action_r.squeeze())
            bw_mpf_r = None
            if t >= WARM_UP:
                _, bw_mpf_r = mpf_r.optimize(
                    action_r.squeeze(), state_r, bw=MPF_BW,
                    n_steps=MPF_STEPS,
                )
            crash_r = bool(
                system_r.obst_map.get_collisions(state_r[:2]).item()
            )

            # --- our step (same step-start state in SYNC mode) ---
            bw = silvermans_rule(svstate.theta)
            svstate, dstate, costs = svmpc_j.svgd_step(
                svstate, dstate, state_j, stub_j, key, bw=bw,
                noise=jnp.asarray(noise_seq[t]),
            )
            if t < WARM_UP:
                action_j = jnp.zeros(CTRL_DIM)
                w_j = None
            else:
                svstate, a_seq_j, w_j = svmpc_j.forward(svstate, costs)
                action_j = a_seq_j[0]
            # SYNC mode advances our simulator/MPF with the REFERENCE's
            # action so every per-step comparison below runs on
            # identical inputs (our action is still compared against it
            # whenever the selection is well-determined)
            action_app = _t2j(action_r) if cfg["SYNC"] else action_j
            state_j = model_j.step(state_j, action_app,
                                   params={"mass": mass_j})
            if t >= WARM_UP:
                mstate, _, _ = mpf_j.optimize(mstate, action_app,
                                              state_j, bw=MPF_BW,
                                              n_steps=MPF_STEPS)
            crash_j = bool(
                np.asarray(model_j.obst_map.get_collisions(state_j[:2]))
            )

            # --- compare step t ---
            cliff_step = False
            if cfg["SYNC"]:
                # rollout+cost engine comparison on identical inputs.
                # The collision penalty is a CLIFF (w_obs * binary
                # occupancy): a rollout position within float noise of a
                # cell boundary lands on different sides in the two
                # frameworks and that sample's cost jumps by ~w_obs — a
                # boundary-measure event, not a math difference. Such
                # entries must be few, and every other entry must match.
                c_ref = lik_r.last_costs.detach().numpy()
                c_ours = np.asarray(costs)
                cliff = np.abs(c_ours - c_ref) > 1.0
                np.testing.assert_allclose(
                    c_ours[~cliff], c_ref[~cliff], rtol=5e-3, atol=0.5,
                    err_msg=f"costs step {t}",
                )
                assert cliff.sum() <= 3, (
                    f"step {t}: {cliff.sum()} cost-cliff entries — more "
                    "than boundary-crossing noise can explain"
                )
                cliff_step = bool(cliff.any())
                if cliff_step:
                    cliff_steps += 1
            if w_r is not None and not cliff_step:
                w_ref_np = w_r.detach().numpy()
                w_ours_np = np.asarray(w_j)
                np.testing.assert_allclose(
                    w_ours_np, w_ref_np, atol=atol_w,
                    err_msg=f"weights step {t}",
                )
                top2 = np.sort(w_ref_np)[-2:]
                if top2[1] - top2[0] > 0.05:
                    # the argmax selection is well-determined: the
                    # actions must agree
                    np.testing.assert_allclose(
                        np.asarray(action_j), action_r.detach().numpy(),
                        rtol=5e-3, atol=atol_act,
                        err_msg=f"action step {t}",
                    )
                else:
                    # near-tied posterior weights: the argmax is not a
                    # stable statistic — require that our pick is one of
                    # the (reference-weighted) maximal particles
                    i_ours = int(w_ours_np.argmax())
                    assert w_ref_np[i_ours] >= w_ref_np.max() - 0.06, (
                        f"step {t}: picked particle {i_ours} with ref "
                        f"weight {w_ref_np[i_ours]} vs max "
                        f"{w_ref_np.max()}"
                    )
            np.testing.assert_allclose(
                np.asarray(state_j), state_r.detach().numpy(),
                rtol=5e-3, atol=atol_state, err_msg=f"state step {t}",
            )
            np.testing.assert_allclose(
                np.asarray(mstate.x), mpf_r.x.detach().numpy(),
                rtol=5e-3, atol=atol_mpf, err_msg=f"mpf step {t}",
            )
            assert crash_j == crash_r, f"crash flag step {t}"
            compared += 1

            if cfg["SYNC"]:
                # --- re-sync our solver state to the reference's ---
                # (chaos control; see module docstring, point 2)
                svstate = svstate.replace(
                    theta=_t2j(svmpc_r.theta),
                    prior=GMM.from_cov(
                        _t2j(svmpc_r.prior.component_distribution
                             .base_dist.loc),
                        _t2j(svmpc_r.prior.mixture_distribution.probs),
                        PRIOR_SIGMA**2 * jnp.eye(CTRL_DIM),
                    ),
                )
                dstate = DiscoState(
                    a_seq=_t2j(ctrl_r.a_seq),
                    a_mat=_t2j(ctrl_r.a_mat),
                    a_mix=_t2j(ctrl_r.a_mix),
                )
                state_j = _t2j(state_r)
                if bw_mpf_r is not None:
                    x_ref = _t2j(mpf_r.x)
                    mstate = mstate.replace(
                        x=x_ref,
                        prior=mpf_j.make_prior(x_ref,
                                               jnp.float32(bw_mpf_r)),
                        prior_bw=jnp.float32(bw_mpf_r),
                        lik=mstate.lik.replace(loc=state_j),
                    )
            step_idx["t"] += 1
            if crash_r:
                break
            target = jnp.asarray(ENV["target_state"], jnp.float32)
            if float(jnp.linalg.norm(target - state_j)) <= 1.0:
                break
    finally:
        torch.distributions.Independent.rsample = orig

    # every step of the demo loop was compared, cost-cliff steps are
    # rare boundary events, and the loop is live
    assert compared == T_STEPS
    assert cliff_steps <= 2, f"{cliff_steps} cliff steps"
    moved = jnp.abs(
        jnp.asarray(ENV["init_state"], jnp.float32) - state_j
    ).max()
    assert float(moved) > 0.01
