"""Experiment-stack builders: YAML config -> (model, controller, SVMPC,
MPF, priors) wiring.

This is the construction logic of the reference demo scripts
(`demo/pendulum_example.py:31-152`, `demo/particle_example.py:21-141`)
factored out so the demo entry points, the benchmark harness, and the
scenario-sweep layer all build identical stacks from the same YAML schema
(config keys documented in `demo/*_config.yaml`, mirroring the
reference's).
"""

from __future__ import annotations

from types import SimpleNamespace

import jax
import jax.numpy as jnp
import optax
import yaml

from .controllers import MultiDisco
from .distributions import GMM, Normal, Uniform
from .inference import (
    ExpectedCost,
    ExponentiatedUtility,
    GaussianLikelihood,
    MPF,
    SVMPC,
)
from .models import Particle, PendulumModel
from .utils.utf import MerweScaledUTF

_LIKELIHOODS = {
    "ExpectedCost": ExpectedCost,
    "ExponentiatedUtility": ExponentiatedUtility,
}


def load_config(path):
    with open(path) as f:
        return yaml.safe_load(f)


def pendulum_cost_fns():
    """The DuSt paper's swing-up cost (`demo/pendulum_example.py:21-28`):
    50 (cos theta - 1)^2 + theta_dot^2."""

    def inst_cost(states, actions=None, **_):
        theta = states[..., 0]
        theta_d = states[..., 1]
        return 50.0 * (jnp.cos(theta) - 1.0) ** 2 + theta_d**2

    def term_cost(states, **_):
        return inst_cost(states)

    return inst_cost, term_cost


def build_pendulum_stack(config_data, key, case="dust",
                         reference_compat=False):
    """Build one of the four pendulum experiment cases
    (`demo/pendulum_example.py:161-261`):

    * "dust"      — MultiDisco(sampled params) + SVMPC + MPF (dual loop)
    * "svmpc"     — MultiDisco(mean params) + SVMPC, no MPF
    * "mppi"      — MultiDisco(n_pol=1, exact model), no SVMPC
    * "disco_utf" — MultiDisco(n_pol=1, UTF sigma points), no SVMPC
    """
    exp = config_data["exp_params"]
    horizon = exp["horizon"]
    m = exp["n_particles"]
    alpha = exp["alpha"]
    ctrl_dim = exp["ctrl_dim"]
    ctrl_sigma = exp["ctrl_sigma"]
    prior_sigma = exp["prior_sigma"]

    k_prior, k_init, k_mpf, key = jax.random.split(key, 4)

    inst_cost, term_cost = pendulum_cost_fns()

    use_svmpc = case in ("dust", "svmpc")
    n_pol = m if use_svmpc else 1

    # policy prior + initial particles (`pendulum_example.py:66-71`)
    prior_locs = jax.random.normal(k_prior, (n_pol, horizon, ctrl_dim))
    policies_prior = GMM.from_cov(
        prior_locs, jnp.ones(n_pol), prior_sigma**2 * jnp.eye(ctrl_dim)
    )
    init_policies = policies_prior.sample(k_init, (n_pol,))

    # dynamics prior: Uniform over (length, mass)
    # (`pendulum_example.py:81-83`)
    dynamics_prior = Uniform(
        jnp.array([0.6, 0.6]), jnp.array([1.3, 1.3]), event_ndims=1
    )

    model_kwargs = (
        {"uncertain_params": ("length", "mass")}
        if case in ("dust", "disco_utf")
        else {"uncertain_params": None}
    )
    model = PendulumModel(**model_kwargs)

    if case == "disco_utf":
        params_sampling = MerweScaledUTF(
            n=config_data["utf"]["n"], alpha=config_data["utf"]["alpha"],
            correct_sqrt=config_data["utf"].get("correct_sqrt", False),
        )
    elif case == "dust":
        params_sampling = True
    else:
        params_sampling = "none"

    fused_state_costs = None
    if exp.get("fused_rollout", False) and case in ("dust", "svmpc"):
        # Pallas fused rollout+cost path (ops/pallas_rollout.py): identical
        # math, trajectories never materialized. utf excluded (sigma-point
        # weighting needs the per-point cost tensor); mppi uses
        # params_override which the hook has no column for.
        from .ops.pallas_rollout import make_fused_pendulum_state_costs

        fused_state_costs = make_fused_pendulum_state_costs(
            model, interpret=jax.default_backend() != "tpu"
        )

    controller = MultiDisco(
        observation_space=model.observation_space,
        action_space=model.action_space,
        hz_len=horizon,
        n_policies=n_pol,
        action_samples=exp["action_samples"],
        params_samples=exp["params_samples"],
        temperature=1.0 / alpha,
        a_cov=ctrl_sigma**2 * jnp.eye(ctrl_dim),
        inst_cost_fn=inst_cost,
        term_cost_fn=term_cost,
        params_sampling=params_sampling,
        params_log_space=exp["mpf_log_space"] if case == "dust" else False,
        scan_unroll=exp.get("scan_unroll", 1),
        fused_state_costs=fused_state_costs,
    )

    svmpc = None
    if use_svmpc:
        lik_cls = _LIKELIHOODS[exp.get("likelihood", "ExponentiatedUtility")]
        likelihood = lik_cls(
            alpha=alpha,
            n_samples=exp["action_samples"],
            controller=controller,
            model=model,
        )
        svmpc_kwargs = dict(
            likelihood=likelihood,
            kernel=(
                "message_passing"
                if exp["kernel"] == "message_passing"
                else "rbf"
            ),
            ctrl_dim=ctrl_dim,
            n_particles=m,
            n_steps=1,
            optimizer=optax.sgd(exp["learning_rate"]),
            bw_scale=exp["bandwidth_scaling"],
            weighted_prior=exp.get("weighted_prior", False),
            reference_compat=reference_compat,
        )
        if exp.get("fused_solve", False):
            # the whole solve as one Pallas program (ops/pallas_solve.py);
            # demo-config semantics asserted by the class
            from .inference.svmpc import FusedPendulumSVMPC

            svmpc = FusedPendulumSVMPC(
                interpret=jax.default_backend() != "tpu", **svmpc_kwargs
            )
        else:
            svmpc = SVMPC(**svmpc_kwargs)

    mpf = None
    mpf_init = None
    if case == "dust":
        mpf_init = dynamics_prior.sample(k_mpf, (exp["mpf_n_particles"],))
        if exp["mpf_log_space"]:
            mpf_init = jnp.log(jnp.clip(mpf_init, 1e-6))
        dynamics_lik = GaussianLikelihood(
            obs_std=exp["mpf_obs_std"],
            model=PendulumModel(uncertain_params=("length", "mass")),
            log_space=exp["mpf_log_space"],
        )
        mpf = MPF(
            likelihood=dynamics_lik,
            optimizer=optax.sgd(exp["mpf_learning_rate"]),
            bw_scale=exp["mpf_bandwidth_scaling"],
            n_steps=exp["mpf_steps"],
            reference_compat=reference_compat,
            scan_unroll=exp.get("mpf_scan_unroll", 1),
        )

    return SimpleNamespace(
        model=model,
        controller=controller,
        svmpc=svmpc,
        mpf=mpf,
        mpf_init=mpf_init,
        mpf_bw=exp.get("mpf_bandwidth"),
        mpf_steps=exp.get("mpf_steps"),
        policies_prior=policies_prior,
        init_policies=init_policies,
        dynamics_prior=dynamics_prior,
        init_state=jnp.asarray(exp["init_state"], jnp.float32),
        key=key,
    )


def build_particle_stack(config_data, key, reference_compat=False):
    """Particle-navigation stack (`demo/particle_example.py:21-141`)."""
    exp = config_data["exp_params"]
    env = dict(config_data["env_params"])
    horizon = exp["horizon"]
    m = exp["n_particles"]
    alpha = exp["alpha"]
    ctrl_dim = exp["ctrl_dim"]

    k_prior, k_init, k_mpf, key = jax.random.split(key, 4)

    dyn_prior_name = exp["dyn_prior"]
    if dyn_prior_name == "Normal":
        dynamics_prior = Normal(
            jnp.float32(exp["dyn_prior_arg1"]),
            jnp.float32(exp["dyn_prior_arg2"]),
        )
    elif dyn_prior_name == "Uniform":
        dynamics_prior = Uniform(
            jnp.float32(exp["dyn_prior_arg1"]),
            jnp.float32(exp["dyn_prior_arg2"]),
        )
    else:
        raise ValueError(f"Unknown dyn_prior {dyn_prior_name}")

    model = Particle(
        uncertain_params=["mass"],
        mass=float(dynamics_prior.mean),
        **env,
    )

    prior_locs = jax.random.normal(k_prior, (m, horizon, ctrl_dim))
    policies_prior = GMM.from_cov(
        prior_locs,
        jnp.ones(m),
        exp["prior_sigma"] ** 2 * jnp.eye(ctrl_dim),
    )
    init_policies = policies_prior.sample(k_init, (m,))

    fused_state_costs = None
    if exp.get("fused_rollout", False):
        # Pallas fused rollout+cost path with in-kernel rectangle
        # collisions (ops/pallas_particle_rollout.py): identical math,
        # trajectories never materialized. Deterministic models only.
        from .ops.pallas_particle_rollout import (
            make_fused_particle_state_costs,
        )

        fused_state_costs = make_fused_particle_state_costs(
            model, interpret=jax.default_backend() != "tpu"
        )

    controller = MultiDisco(
        observation_space=model.observation_space,
        action_space=model.action_space,
        hz_len=horizon,
        n_policies=m,
        action_samples=exp["action_samples"],
        params_samples=exp["params_samples"],
        temperature=1.0 / alpha,
        a_cov=exp["ctrl_sigma"] ** 2 * jnp.eye(ctrl_dim),
        inst_cost_fn=model.default_inst_cost,
        term_cost_fn=model.default_term_cost,
        params_sampling=exp["sampling"],
        params_log_space=exp["mpf_log_space"],
        fused_state_costs=fused_state_costs,
    )

    lik_cls = _LIKELIHOODS[exp["likelihood"]]
    likelihood = lik_cls(
        alpha=alpha,
        n_samples=exp["action_samples"],
        controller=controller,
        model=model,
    )
    svmpc_kwargs = dict(
        likelihood=likelihood,
        kernel=(
            "message_passing" if exp["kernel"] == "message_passing" else "rbf"
        ),
        ctrl_dim=ctrl_dim,
        n_particles=m,
        n_steps=1,
        optimizer=optax.sgd(exp["learning_rate"]),
        bw_scale=exp["bandwidth_scaling"],
        weighted_prior=exp.get("weighted_prior", False),
        reference_compat=reference_compat,
    )
    if exp.get("fused_solve", False):
        # the whole solve as one Pallas program (ops/pallas_solve.py)
        from .inference.svmpc import FusedParticleSVMPC

        svmpc = FusedParticleSVMPC(
            interpret=jax.default_backend() != "tpu", **svmpc_kwargs
        )
    else:
        svmpc = SVMPC(**svmpc_kwargs)

    mpf = None
    mpf_init = None
    if exp["use_mpf"]:
        mpf_init = dynamics_prior.sample(
            k_mpf, (exp["mpf_n_particles"], 1)
        ).reshape(exp["mpf_n_particles"], 1)
        mpf_init = jnp.clip(mpf_init, 1e-6)
        if exp["mpf_log_space"]:
            mpf_init = jnp.log(mpf_init)
        dynamics_lik = GaussianLikelihood(
            obs_std=exp["mpf_obs_std"],
            model=model,
            log_space=exp["mpf_log_space"],
        )
        mpf = MPF(
            likelihood=dynamics_lik,
            optimizer=optax.sgd(exp["mpf_learning_rate"]),
            bw_scale=exp["mpf_bandwidth_scaling"],
            n_steps=exp["mpf_steps"],
            reference_compat=reference_compat,
        )

    # MPF prior bandwidth at init: the reference computes
    # `(2 * dyn_prior_arg2) ** 1 / 2` — operator precedence makes that
    # simply dyn_prior_arg2 (`demo/particle_example.py:139`); kept verbatim.
    mpf_init_bw = (2 * exp["dyn_prior_arg2"]) ** 1 / 2

    return SimpleNamespace(
        model=model,
        controller=controller,
        svmpc=svmpc,
        mpf=mpf,
        mpf_init=mpf_init,
        mpf_init_bw=mpf_init_bw,
        mpf_bw=exp.get("mpf_bandwidth"),
        mpf_steps=exp.get("mpf_steps"),
        policies_prior=policies_prior,
        init_policies=init_policies,
        dynamics_prior=dynamics_prior,
        init_state=jnp.asarray(env["init_state"], jnp.float32),
        load=exp.get("extra_load", 0.0),
        use_svmpc=exp.get("use_svmpc", True),
        key=key,
    )
