"""SVMPC — Stein variational MPC over control-sequence particles.

TPU-native redesign of `dust/inference/svmpc.py:14-200`. Policy particles
theta [m, horizon, ctrl_dim] follow the Stein direction of the control
posterior: a GMM prior around the previous particles plus a cost
pseudo-likelihood evaluated by the DISCO controller's batched rollouts.
All mutable reference state (theta, optimizer, prior, controller plan)
lives in explicit pytrees (`SVMPCState` + the controller's `DiscoState`)
threaded through pure methods, so one MPC step jits into a single device
program — including the Silverman bandwidth the reference computes on host
via KDEpy every call (`svmpc.py:105`).

Kernel paths (mirroring `svmpc.py:63-84`):

* "rbf" — flat-particle RBF, the gpytorch path. The reference has two
  quirks here, reproduced under `reference_compat=True`:
  (1) `self.kernel.lenghtscale = bw` is a typo, so the gpytorch lengthscale
      stays at softplus(0) = ln 2 forever (`svmpc.py:78`);
  (2) the kernel-gradient term is the autograd gradient through the
      *first* argument, which for SVGD is an attraction, and it is not
      divided by m (`svmpc.py:82-83`).
  With `reference_compat=False` (default) we use the computed bandwidth
  and the standard repulsion (-grad, /m).
* "message_passing" — the iid_mp per-timestep kernel with analytic
  gradients; the reference math here is standard SVGD and is reproduced
  as-is. (Reference `svmpc.py:67` sets `.ell` on the composite kernel,
  a no-op — the base RBF keeps its median-trick bandwidth; same here.)
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..distributions import GMM
from ..ops.bandwidth import silvermans_rule
from ..ops.kernels import iid_mp, rbf_gram_and_grad

# gpytorch RBFKernel default lengthscale: softplus(raw=0) = ln 2
_GPYTORCH_DEFAULT_LENGTHSCALE = math.log(2.0)


@struct.dataclass
class SVMPCState:
    theta: jax.Array          # [m, H, A]
    opt_state: optax.OptState
    prior: GMM                # over event [H, A]
    # True once update_prior has run at least once — drives the
    # reference_compat live-prior quirk in get_weights (PARITY #19)
    prior_updated: jax.Array = struct.field(default=None)


class SVMPC:
    def __init__(
        self,
        likelihood,
        kernel="rbf",
        ctrl_dim=None,
        indep_controls=True,
        n_particles=None,
        n_steps=1,
        lr=0.1,
        optimizer=None,
        bw_scale=1.0,
        roll_strategy="repeat",
        weighted_prior=False,
        reference_compat=False,
    ):
        self.likelihood = likelihood
        self.controller = likelihood.controller
        self.kernel = kernel
        self.ctrl_dim = ctrl_dim if ctrl_dim is not None else self.controller.dim_a
        self.indep_controls = bool(indep_controls)
        self.n_particles = int(n_particles)
        self.n_steps = int(n_steps)
        self.bw_scale = float(bw_scale)
        self.roll_strategy = roll_strategy
        self.weighted_prior = bool(weighted_prior)
        self.reference_compat = bool(reference_compat)
        self.optimizer = optimizer if optimizer is not None else optax.sgd(lr)
        # sigma for the analytic likelihood gradient (`svmpc.py:108-111`)
        self.sigma = jnp.sqrt(jnp.diagonal(self.controller.a_cov))

    def init_state(self, init_particles, prior: GMM) -> SVMPCState:
        theta = jnp.asarray(init_particles, jnp.float32)
        return SVMPCState(
            theta=theta, opt_state=self.optimizer.init(theta), prior=prior,
            prior_updated=jnp.asarray(False),
        )

    # -- Stein direction (`svmpc.py:32-85`) -------------------------------

    def phi(self, svstate: SVMPCState, dstate, state, params_dist, key, bw,
            noise=None):
        """Returns (phi [m, H, A], new_dstate, costs [n_samples, m])."""
        x = svstate.theta
        m = x.shape[0]

        grad_pri = svstate.prior.score(x)  # closed form == jax.grad

        new_dstate, costs, actions, _, _ = self.likelihood.sample(
            dstate, x, state, params_dist, key, noise=noise
        )
        # analytic likelihood gradient (`svmpc.py:46-56`): per-particle
        # softmax cost weights over action samples x reparameterized score
        alpha = self.likelihood.alpha
        w = jax.nn.softmax(-costs * alpha, axis=0)          # [n_samples, m]
        d_log_pi = (actions - x) / self.sigma**2            # [n_s, m, H, A]
        grad_lik = jnp.sum(w[..., None, None] * d_log_pi, axis=0)
        score = grad_lik + grad_pri                         # [m, H, A]

        flat = x.reshape(m, -1)
        if self.kernel == "message_passing":
            k, dk = iid_mp(flat, flat, self.ctrl_dim, self.indep_controls)
            grad = jnp.mean(k * score.reshape(1, m, -1), axis=1)
            rep = jnp.mean(dk, axis=1)
            phi = (grad + rep).reshape(x.shape)
        elif self.kernel == "rbf":
            bw_eff = (
                jnp.asarray(_GPYTORCH_DEFAULT_LENGTHSCALE)
                if self.reference_compat
                else bw
            )
            k, grad_first = rbf_gram_and_grad(flat, flat, bw_eff)
            if self.reference_compat:
                grad_k = grad_first.reshape(x.shape)        # `svmpc.py:82`
                phi = grad_k + jnp.tensordot(k, score, axes=1) / m
            else:
                grad_k = -grad_first.reshape(x.shape)
                phi = (jnp.tensordot(k, score, axes=1) + grad_k) / m
        else:
            raise ValueError(f"Kernel type '{self.kernel}' is not valid.")
        return phi, new_dstate, costs

    def svgd_step(self, svstate, dstate, state, params_dist, key, bw,
                  noise=None):
        phi, new_dstate, costs = self.phi(
            svstate, dstate, state, params_dist, key, bw, noise=noise
        )
        updates, opt_state = self.optimizer.update(
            -phi, svstate.opt_state, svstate.theta
        )
        theta = optax.apply_updates(svstate.theta, updates)
        return svstate.replace(theta=theta, opt_state=opt_state), new_dstate, costs

    # -- optimize (`svmpc.py:97-126`) -------------------------------------

    def optimize(self, svstate, dstate, state, params_dist, key, bw=None,
                 n_steps=None):
        """n_steps SVGD updates. Returns (svstate, dstate, costs) with the
        last step's costs cached for the fast-path weight computation."""
        if bw is None:
            bw = silvermans_rule(svstate.theta)
        n = self.n_steps if n_steps is None else n_steps
        costs = None
        for k in jax.random.split(key, n):
            svstate, dstate, costs = self.svgd_step(
                svstate, dstate, state, params_dist, k, bw
            )
        return svstate, dstate, costs

    # -- weights / selection / roll / prior (`svmpc.py:128-200`) ----------

    def get_weights(self, svstate, costs):
        log_l = self.likelihood.log_prob(costs)             # [m]
        log_p = svstate.prior.log_prob(svstate.theta)       # [m]
        if self.reference_compat and svstate.prior_updated is not None:
            # PARITY #19: the reference's update_prior calls
            # get_gmm(self.theta, ...) (`svmpc.py:166-170`), so after the
            # first prior refresh the prior's component locs SHARE the
            # tensor that the next optimize() mutates in place — by
            # get_weights time (`svmpc.py:139`) the prior is centered on
            # the CURRENT particles, not the roll-time ones. (Exact for
            # the demos' n_steps=1; with n_steps>1 the intermediate
            # phi() prior grads alias too.)
            live = GMM(
                locs=svstate.theta,
                scale_tril=svstate.prior.scale_tril,
                logits=svstate.prior.logits,
            )
            log_p = jnp.where(svstate.prior_updated,
                              live.log_prob(svstate.theta), log_p)
        log_w = log_l + log_p
        return jnp.exp(log_w - jax.nn.logsumexp(log_w))

    def roll(self, svstate, key=None, steps=-1):
        """Shift particles along the horizon (`svmpc.py:142-158`)."""
        theta = jnp.roll(svstate.theta, steps, axis=-2)
        if self.roll_strategy == "repeat":
            theta = theta.at[..., -1, :].set(theta[..., -2, :])
        elif self.roll_strategy == "resample":
            draw = svstate.prior.sample(key, (self.n_particles,))
            theta = theta.at[..., -1, :].set(draw[..., -1, :])
        elif self.roll_strategy == "mean":
            theta = theta.at[..., -1, :].set(jnp.mean(theta, axis=-2))
        else:
            raise ValueError(
                f"{self.roll_strategy} is an invalid roll strategy."
            )
        return svstate.replace(theta=theta)

    def update_prior(self, svstate, weights=None):
        """Rebuild the GMM prior around the current particles with the
        previous component covariance (`svmpc.py:160-170`)."""
        if weights is None or not self.weighted_prior:
            logits = jnp.zeros(svstate.theta.shape[0])
        else:
            logits = jnp.log(jnp.clip(weights, 1e-37))
        prior = GMM(
            locs=svstate.theta,
            scale_tril=svstate.prior.scale_tril,
            logits=logits,
        )
        return svstate.replace(prior=prior,
                               prior_updated=jnp.asarray(True))

    def forward(self, svstate, costs, key=None, steps=-1):
        """Select the best particle, roll, refresh the prior
        (`svmpc.py:172-200`). Returns (svstate, a_seq [H, A], weights [m])."""
        weights = self.get_weights(svstate, costs)
        i_star = jnp.argmax(weights)
        a_seq = svstate.theta[i_star]
        svstate = self.roll(svstate, key=key, steps=steps)
        svstate = self.update_prior(svstate, weights)
        return svstate, a_seq, weights


@struct.dataclass
class FusedSVMPCState:
    """`SVMPCState` plus the forward-pass outputs the fused solve kernel
    computes up front (`ops/pallas_solve.py` runs optimize AND forward in
    one program; `forward` then just commits the cached results)."""

    theta: jax.Array          # [m, H, A]
    opt_state: optax.OptState
    prior: GMM
    fwd_theta: jax.Array      # [m, H, A] (rolled)
    fwd_a_seq: jax.Array      # [H, A]
    fwd_weights: jax.Array    # [m]


class _FusedSolveSVMPC(SVMPC):
    """Base for SVMPC variants whose whole solve (sample -> rollout ->
    cost -> DISCO update -> Stein step -> selection -> roll) runs as ONE
    Pallas program (`ops/pallas_solve.py`).

    Supported semantics (asserted): kernel="rbf", reference_compat=False,
    n_steps=1, roll_strategy="repeat", SGD optimizer, isotropic action
    covariance and policy prior, controller a_reg == 0 (the demo
    temperature/ctrl_penalty make the control penalty vanish). The
    optimize method reproduces the plain path's exact PRNG split sequence
    (`SVMPC.optimize` -> `CostLikelihood.sample` -> `MultiDisco.forward`),
    so outputs match the plain classes to float tolerance on identical
    keys (tests/test_pallas_solve.py)."""

    def __init__(self, likelihood, interpret=False, **kwargs):
        kwargs.setdefault("kernel", "rbf")
        super().__init__(likelihood, **kwargs)
        from .likelihoods import ExpectedCost, ExponentiatedUtility

        ctrl = self.controller
        if self.kernel != "rbf" or self.reference_compat:
            raise ValueError("fused solve: kernel='rbf', no compat mode")
        if self.n_steps != 1:
            raise ValueError("fused solve supports n_steps=1")
        if self.roll_strategy != "repeat":
            raise ValueError("fused solve: roll_strategy='repeat'")
        if abs(ctrl.a_reg) > 1e-12:
            raise ValueError(
                "fused solve requires a_reg == 0 (temperature *"
                " (1 - ctrl_penalty)); use the plain SVMPC otherwise"
            )
        if ctrl._params_mode not in ("none", "sampled"):
            raise ValueError("fused solve: params mode none|sampled")
        if not isinstance(likelihood, (ExpectedCost, ExponentiatedUtility)):
            raise ValueError("fused solve: ExpectedCost|ExponentiatedUtility")
        import numpy as np

        sig = np.asarray(self.sigma)
        if not np.allclose(sig, sig[0]):
            raise ValueError("fused solve: isotropic action covariance")
        self._exp_util = isinstance(likelihood, ExponentiatedUtility)
        self._model = likelihood.model
        self._interpret = bool(interpret)
        self._check_model(self._model)
        # the scalar step the plain path's optax SGD would apply (probe
        # once, eagerly; stateful optimizers are not supported in-kernel)
        probe = jnp.ones((1,), jnp.float32)
        upd, _ = self.optimizer.update(
            probe, self.optimizer.init(probe), probe
        )
        self._lr_cached = float(-upd[0])

    def _check_model(self, model):
        raise NotImplementedError

    def _run_kernel(self, state, theta, locs, log_mix, a_mat, a_seq,
                    actions, cols, bw, prior_scale, hz, m):
        raise NotImplementedError

    def init_state(self, init_particles, prior: GMM) -> FusedSVMPCState:
        theta = jnp.asarray(init_particles, jnp.float32)
        ps = prior.scale_tril
        a = self.ctrl_dim
        import numpy as np

        if ps.shape != (a, a) or not np.allclose(
            np.asarray(ps), np.asarray(ps[0, 0]) * np.eye(a)
        ):
            raise ValueError("fused solve: isotropic policy prior")
        return FusedSVMPCState(
            theta=theta,
            opt_state=self.optimizer.init(theta),
            prior=prior,
            fwd_theta=theta,
            fwd_a_seq=theta[0],
            fwd_weights=jnp.full((theta.shape[0],), jnp.nan),
        )

    def optimize(self, svstate, dstate, state, params_dist, key, bw=None,
                 n_steps=None):
        from ..ops.bandwidth import silvermans_rule

        if n_steps not in (None, 1):
            raise ValueError("fused solve supports n_steps=1")
        theta = svstate.theta                       # [m, H, A]
        m, hz, a = theta.shape
        ctrl = self.controller
        if bw is None:
            bw = silvermans_rule(theta)

        # exact PRNG discipline of the plain path: optimize's per-step
        # split, CostLikelihood.sample's (k_act, k_fwd), forward's
        # (k_eps, k_par, k_roll)
        (k,) = jax.random.split(key, 1)
        k_act, k_fwd = jax.random.split(k)
        noise = jax.random.normal(
            k_act, (self.likelihood.n_samples, m, hz, a)
        )
        actions = theta + noise @ ctrl.a_scale_tril.T
        _, k_par, _ = jax.random.split(k_fwd, 3)

        if ctrl._params_mode == "sampled":
            draws = params_dist.sample(k_par, (ctrl.n_params,))
            if ctrl._params_log_space:
                draws = jnp.exp(draws)
            draws = draws.reshape(ctrl.n_params, -1)
            cols = {
                k_: draws[:, i]
                for i, k_ in enumerate(self._model.uncertain_params)
            }
        else:
            cols = {}

        log_mix = jax.nn.log_softmax(svstate.prior.logits)
        (theta_opt, theta_fwd, a_mat, a_mix, a_seq_sel, weights,
         costs) = self._run_kernel(
            state, theta, svstate.prior.locs, log_mix, dstate.a_mat,
            dstate.a_seq, actions, cols, bw,
            svstate.prior.scale_tril[0, 0], hz, m,
        )

        svstate = svstate.replace(
            theta=theta_opt,
            fwd_theta=theta_fwd,
            fwd_a_seq=a_seq_sel,
            fwd_weights=weights,
        )
        dstate = dstate.replace(a_mat=a_mat, a_mix=a_mix)
        return svstate, dstate, costs

    def forward(self, svstate, costs, key=None, steps=-1):
        """Commit the kernel's precomputed selection/roll and refresh the
        prior (weighted when `weighted_prior`, `svmpc.py:160-170`).
        `costs`/`key` are accepted for interface parity; the roll is
        always the 'repeat' strategy at steps=-1."""
        if steps != -1:
            raise ValueError("fused solve supports steps=-1")
        theta = svstate.fwd_theta
        if self.weighted_prior:
            logits = jnp.log(jnp.clip(svstate.fwd_weights, 1e-37))
        else:
            logits = jnp.zeros(theta.shape[0])
        prior = GMM(
            locs=theta,
            scale_tril=svstate.prior.scale_tril,
            logits=logits,
        )
        svstate = svstate.replace(theta=theta, prior=prior)
        return svstate, svstate.fwd_a_seq, svstate.fwd_weights


class FusedPendulumSVMPC(_FusedSolveSVMPC):
    """Whole-solve-fused SVMPC for the pendulum task (ctrl_dim 1,
    unweighted prior, length/mass parameter columns)."""

    def _check_model(self, model):
        from ..models.pendulum import PendulumModel

        if self.ctrl_dim != 1:
            raise ValueError("pendulum fused solve supports ctrl_dim=1")
        if self.weighted_prior:
            raise ValueError("pendulum fused solve: unweighted prior")
        if not isinstance(model, PendulumModel):
            raise ValueError("fused solve is model-specific (pendulum)")
        if not set(model.uncertain_params or ()) <= {"length", "mass"}:
            raise ValueError("fused solve: length/mass parameters only")

    def _run_kernel(self, state, theta, locs, log_mix, a_mat, a_seq,
                    actions, cols, bw, prior_scale, hz, m):
        from ..ops.pallas_solve import fused_pendulum_solve

        ctrl = self.controller
        defaults = self._model.params_dict
        lengths = cols.get(
            "length",
            jnp.full((ctrl.n_params,), float(defaults["length"]),
                     jnp.float32),
        )
        masses = cols.get(
            "mass",
            jnp.full((ctrl.n_params,), float(defaults["mass"]),
                     jnp.float32),
        )
        (theta_opt, theta_fwd, amat, a_mix, a_seq_sel, weights,
         costs) = fused_pendulum_solve(
            jnp.reshape(state, (-1,))[:2],
            theta[..., 0], locs[..., 0], log_mix,
            a_mat[..., 0], a_seq[..., 0], actions[..., 0],
            lengths, masses, bw,
            self._lr_cached, self.likelihood.alpha, ctrl.temp,
            self.sigma[0], prior_scale,
            hz=hz, m=m, n_params=ctrl.n_params,
            n_act=self.likelihood.n_samples,
            dt=float(self._model.dt), g=float(defaults["g"]),
            exp_util=self._exp_util, interpret=self._interpret,
        )
        return (theta_opt[..., None], theta_fwd[..., None],
                amat[..., None], a_mix, a_seq_sel[:, None], weights, costs)


class FusedParticleSVMPC(_FusedSolveSVMPC):
    """Whole-solve-fused SVMPC for the particle-navigation task
    (ctrl_dim 2, optionally weighted prior, mass parameter column,
    gather-free rectangle collisions in-kernel)."""

    def _check_model(self, model):
        from ..ops.pallas_particle_rollout import particle_kernel_statics

        if self.ctrl_dim != 2:
            raise ValueError("particle fused solve supports ctrl_dim=2")
        # validates control type, determinism, uncertain params, and
        # extracts the compile-time cost/collision configuration
        self._statics = particle_kernel_statics(model)

    def _run_kernel(self, state, theta, locs, log_mix, a_mat, a_seq,
                    actions, cols, bw, prior_scale, hz, m):
        from ..ops.pallas_solve import fused_particle_solve

        ctrl = self.controller
        model = self._model
        masses = cols.get(
            "mass",
            jnp.full((ctrl.n_params,), float(model.params_dict["mass"]),
                     jnp.float32),
        )
        return fused_particle_solve(
            jnp.reshape(state, (-1,))[:4],
            theta, locs, log_mix, a_mat, a_seq, actions, masses, bw,
            self._lr_cached, self.likelihood.alpha, ctrl.temp,
            self.sigma[0], prior_scale,
            hz=hz, m=m, n_params=ctrl.n_params,
            n_act=self.likelihood.n_samples,
            dt=float(model.dt), max_acc=float(model.max_acc),
            max_speed=float(model.max_speed), exp_util=self._exp_util,
            interpret=self._interpret, **self._statics,
        )
