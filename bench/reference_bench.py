"""Measure the torch reference's MPC solve throughput on CPU.

The reference publishes no numbers (BASELINE.md), so this harness times
its per-MPC-step work directly: SVMPC.optimize + SVMPC.forward (+ MPF
.optimize for the dual configs) at the demo-config workload shapes. For a
fair denominator the reference's global
`torch.autograd.set_detect_anomaly(True)` (dust/inference/svgd.py:7) is
switched off, and its missing deps (gpytorch, KDEpy) are shimmed with
numerically exact stand-ins (see tests/conftest.py rationale).

Run:  python bench/reference_bench.py [--config pendulum_dust] [--steps N]

Emits one JSON line: {"config": ..., "solves_per_s": ..., ...}
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


from bench.shims import install_reference_shims as install_shims  # noqa: E402


def build_pendulum(config, use_mpf):
    """Reference DuSt / SVMPC pendulum stack at demo-config shapes
    (demo/pendulum_example.py:61-146)."""
    import torch
    import torch.distributions as dist
    from gpytorch.kernels import RBFKernel

    from dust.controllers.disco import MultiDISCO
    from dust.inference.likelihoods import (
        ExponentiatedUtility,
        GaussianLikelihood,
    )
    from dust.inference.mpf import MPF
    from dust.inference.svgd import get_gmm
    from dust.inference.svmpc import SVMPC
    from dust.models.pendulum import PendulumModel

    exp = config["exp_params"]
    horizon, m = exp["horizon"], exp["n_particles"]
    env_model = PendulumModel(
        uncertain_params=("length", "mass") if use_mpf else None
    )

    def inst_cost(states, controls=None, n_pol=1, debug=None):
        theta, theta_d = states.chunk(2, dim=1)
        return 50.0 * (theta.cos() - 1) ** 2 + 1.0 * theta_d**2

    def term_cost(states, n_pol=1, debug=None):
        return inst_cost(states).squeeze()

    policies_prior = get_gmm(
        torch.randn(m, horizon, 1),
        torch.ones(m),
        exp["prior_sigma"] ** 2 * torch.eye(exp["ctrl_dim"]),
    )
    init_policies = policies_prior.sample([m])
    dynamics_prior = dist.Independent(
        dist.Uniform(torch.tensor([0.6, 0.6]), torch.tensor([1.3, 1.3])), 1
    )
    controller = MultiDISCO(
        env_model.observation_space,
        env_model.action_space,
        horizon,
        n_policies=m,
        action_samples=exp["action_samples"],
        params_samples=exp["params_samples"],
        temperature=1 / exp["alpha"],
        a_cov=exp["ctrl_sigma"] ** 2 * torch.eye(exp["ctrl_dim"]),
        inst_cost_fn=inst_cost,
        term_cost_fn=term_cost,
        params_sampling=True if use_mpf else None,
    )
    likelihood = ExponentiatedUtility(
        alpha=exp["alpha"],
        n_samples=exp["action_samples"],
        controller=controller,
        model=env_model,
    )
    svmpc = SVMPC(
        init_particles=init_policies.detach().clone(),
        prior=policies_prior,
        likelihood=likelihood,
        kernel=RBFKernel(),
        n_particles=m,
        n_steps=1,
        optimizer_class=torch.optim.SGD,
        lr=exp["learning_rate"],
    )
    mpf = None
    if use_mpf:
        mpf_init = dynamics_prior.sample([exp["mpf_n_particles"]])
        dynamics_lik = GaussianLikelihood(
            initial_obs=torch.tensor(exp["init_state"]),
            obs_std=exp["mpf_obs_std"],
            model=PendulumModel(uncertain_params=("length", "mass")),
            log_space=exp["mpf_log_space"],
        )
        mpf = MPF(
            init_particles=mpf_init,
            likelihood=dynamics_lik,
            optimizer_class=torch.optim.SGD,
            lr=exp["mpf_learning_rate"],
            bw=exp["mpf_bandwidth"],
        )
    return env_model, svmpc, mpf, dynamics_prior, exp


def bench_pendulum(config, use_mpf, n_warm, n_steps):
    import torch

    sim_model, svmpc, mpf, dyn_dist, exp = build_pendulum(config, use_mpf)
    state = torch.tensor([exp["init_state"]])
    if mpf is not None:
        dyn_dist = mpf.prior

    def one_step(state):
        svmpc.optimize(state, dyn_dist)
        a_seq, _ = svmpc.forward(state, dyn_dist)
        action = a_seq[0]
        with torch.no_grad():
            new_state = sim_model.step(state, action.unsqueeze(0))
        if mpf is not None:
            mpf.optimize(action, new_state.squeeze(0),
                         bw=exp["mpf_bandwidth"], n_steps=exp["mpf_steps"])
        return new_state

    for _ in range(n_warm):
        state = one_step(state)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state = one_step(state)
    dt = time.perf_counter() - t0
    return n_steps / dt


def build_particle(config):
    """Reference DuSt particle stack at demo-config shapes
    (demo/particle_example.py:46-141)."""
    import torch
    import torch.distributions as dist
    from gpytorch.kernels import RBFKernel

    from dust.controllers.disco import MultiDISCO
    from dust.inference import likelihoods
    from dust.inference.mpf import MPF
    from dust.inference.svgd import get_gmm
    from dust.inference.svmpc import SVMPC
    from dust.models.particle import Particle

    exp = config["exp_params"]
    env = dict(config["env_params"])
    env["noise_std"] = torch.tensor(env["noise_std"])
    horizon, m, ctrl_dim = exp["horizon"], exp["n_particles"], exp["ctrl_dim"]

    dynamics_prior = dist.Normal(exp["dyn_prior_arg1"], exp["dyn_prior_arg2"])
    model = Particle(
        uncertain_params=["mass"], mass=dynamics_prior.mean, **env
    )
    policies_prior = get_gmm(
        torch.randn(m, horizon, ctrl_dim),
        torch.ones(m),
        exp["prior_sigma"] ** 2 * torch.eye(ctrl_dim),
    )
    init_policies = policies_prior.sample([m])
    controller = MultiDISCO(
        model.observation_space,
        model.action_space,
        horizon,
        m,
        exp["action_samples"],
        temperature=1 / exp["alpha"],
        a_cov=exp["ctrl_sigma"] ** 2 * torch.eye(ctrl_dim),
        params_sampling=exp["sampling"],
        params_samples=exp["params_samples"],
        params_log_space=exp["mpf_log_space"],
        inst_cost_fn=model.default_inst_cost,
        term_cost_fn=model.default_term_cost,
    )
    lik = getattr(likelihoods, exp["likelihood"])(
        exp["alpha"], controller=controller, model=model,
        n_samples=exp["action_samples"],
    )
    svmpc = SVMPC(
        init_particles=init_policies.detach().clone(),
        prior=policies_prior,
        likelihood=lik,
        kernel=RBFKernel(),
        n_particles=m,
        n_steps=1,
        optimizer_class=torch.optim.SGD,
        lr=exp["learning_rate"],
        weighted_prior=exp["weighted_prior"],
    )
    state = torch.as_tensor(env["init_state"], dtype=torch.float)
    mpf_init = dynamics_prior.sample([exp["mpf_n_particles"], 1]).clamp(min=1e-6)
    mpf_init = mpf_init.log() if exp["mpf_log_space"] else mpf_init
    dynamics_lik = likelihoods.GaussianLikelihood(
        initial_obs=state,
        obs_std=exp["mpf_obs_std"],
        model=model,
        log_space=exp["mpf_log_space"],
    )
    mpf = MPF(
        init_particles=mpf_init,
        likelihood=dynamics_lik,
        optimizer_class=torch.optim.SGD,
        lr=exp["mpf_learning_rate"],
        bw=(2 * exp["dyn_prior_arg2"]) ** 1 / 2,
    )
    return model, svmpc, mpf, exp, state


def bench_particle(config, n_warm, n_steps):
    import torch

    model, svmpc, mpf, exp, state = build_particle(config)
    dyn_dist = mpf.prior

    def one_step(state):
        svmpc.optimize(state, dyn_dist)
        a_seq, _ = svmpc.forward(state, dyn_dist)
        action = a_seq[0]
        with torch.no_grad():
            new_state = model.step(state.view(1, -1), action.view(1, -1))[0]
        mpf.optimize(action, new_state, bw=exp["mpf_bandwidth"],
                     n_steps=exp["mpf_steps"])
        return new_state

    for _ in range(n_warm):
        state = one_step(state)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state = one_step(state)
    return n_steps / (time.perf_counter() - t0)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="pendulum_dust",
                        choices=["pendulum_dust", "pendulum_svmpc",
                                 "particle_dust"])
    parser.add_argument("--steps", type=int, default=30)
    parser.add_argument("--warmup", type=int, default=5)
    args = parser.parse_args()

    sys.path.insert(0, "/root/reference")
    install_shims()

    import numpy as np  # noqa: F401  (shim references np)
    import torch
    import yaml

    # fair denominator: disable the reference's global anomaly detection
    torch.autograd.set_detect_anomaly(False)

    if args.config == "particle_dust":
        with open("demo/particle_config.yaml") as f:
            config = yaml.safe_load(f)
        solves = bench_particle(config, args.warmup, args.steps)
    else:
        with open("demo/pendulum_config.yaml") as f:
            config = yaml.safe_load(f)
        use_mpf = args.config == "pendulum_dust"
        solves = bench_pendulum(config, use_mpf, args.warmup, args.steps)
    print(json.dumps({
        "config": args.config,
        "solves_per_s": round(solves, 4),
        "framework": "torch-cpu-reference",
        "anomaly_detection": False,
        "steps_timed": args.steps,
    }))


if __name__ == "__main__":
    import numpy as np  # noqa: F401
    main()
