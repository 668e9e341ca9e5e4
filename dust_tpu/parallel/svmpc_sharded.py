"""Policy-particle sharded SVMPC: the heavy-axis sharding.

In SVMPC the compute scales as n_params x action_samples x n_particles
rollouts per SVGD step (`disco.py:137`) — for large particle counts this
is the axis to shard. Each device owns m/p policy particles and their
slice of the controller plan (`a_mat` rows are per-policy), rolls out
only its local action samples, and the few cross-particle quantities
reassemble with collectives over ICI:

* global cost minimum `beta` — `pmin` (`disco.py:380-381` order kept);
* the policy-mixture normalizer `a_mix = softmax(eta)` over *all*
  policies — max-subtracted `pmax`/`psum` logsumexp;
* the RBF kernel term — `all_gather` of the (small) flattened particles
  and scores, local row-block of the Gram;
* posterior weights and best-particle selection in `forward` operate on
  gathered [m]-sized vectors (tiny).

Semantics = `SVMPC(kernel="rbf", reference_compat=False)`; sharded ==
unsharded is asserted in tests/test_svmpc_sharded.py. The
message-passing kernel is unsupported here: its per-slice median-trick
bandwidth needs the full pairwise matrix per slice, which defeats
row-sharding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P


def _is_per_particle(leaf, m):
    """True for pytree leaves whose leading axis is the particle axis
    (the single predicate both state placement and shard_map specs use)."""
    return hasattr(leaf, "shape") and leaf.shape[:1] == (m,)


class ShardedSVMPC:
    """Wraps an `SVMPC` (rbf kernel, standard-SVGD mode) with a
    particle-sharded optimize step. States shard on the particle axis:
    `svstate.theta` [m, H, A], `dstate.a_mat` [m, H, A], `dstate.a_mix`
    [m] (n_policies == n_particles, as in every SVMPC configuration)."""

    def __init__(self, svmpc, model, mesh, axis="particle"):
        if svmpc.kernel != "rbf" or svmpc.reference_compat:
            raise ValueError(
                "ShardedSVMPC supports kernel='rbf' with "
                "reference_compat=False"
            )
        if svmpc.controller._params_mode == "utf":
            raise ValueError(
                "ShardedSVMPC does not support UTF sigma-point controllers"
                " (the sigma-weighted cost path is not sharded); use"
                " 'sampled' or 'none' parameter modes"
            )
        self.svmpc = svmpc
        self.controller = svmpc.controller
        self.model = model
        self.mesh = mesh
        self.axis = axis
        self._particle_sharding = NamedSharding(mesh, P(axis))

    def shard_states(self, svstate, dstate):
        """Place the particle-axis leaves on the mesh (prior stays
        replicated — its centers are all particles)."""
        ps = self._particle_sharding
        svstate = svstate.replace(
            theta=jax.device_put(svstate.theta, ps),
            opt_state=jax.tree_util.tree_map(
                lambda leaf: (
                    jax.device_put(leaf, ps)
                    if _is_per_particle(leaf, svstate.theta.shape[0])
                    else leaf
                ),
                svstate.opt_state,
            ),
        )
        dstate = dstate.replace(
            a_mat=jax.device_put(dstate.a_mat, ps),
            a_mix=jax.device_put(dstate.a_mix, ps),
        )
        return svstate, dstate

    def _local_step(self, theta, opt_state, a_seq, a_mat, a_mix, prior,
                    state, key, bw, params_dist, noise_l):
        """Per-device body (runs under shard_map). `noise_l` is either the
        injected local standard-normal slice or None (keyed draw)."""
        svmpc, ctrl, model, axis = (
            self.svmpc, self.controller, self.model, self.axis
        )
        n_samples = svmpc.likelihood.n_samples
        ml = theta.shape[0]
        m_total = ml * jax.lax.axis_size(axis)
        k_par, k_act, k_roll = jax.random.split(key, 3)
        k_roll = jax.random.fold_in(k_roll, jax.lax.axis_index(axis))

        # --- action samples around local particles ---
        if noise_l is None:
            idx = jax.lax.axis_index(axis)
            k_local = jax.random.fold_in(k_act, idx)
            noise_l = jax.random.normal(
                k_local, (n_samples, ml, ctrl.hz_len, ctrl.dim_a)
            )
        actions = theta + noise_l @ ctrl.a_scale_tril.T
        eps = actions - a_seq

        # --- shared dynamics-parameter draws (same key on every device) ---
        if ctrl._params_mode == "sampled":
            params, _ = ctrl._sample_params(k_par, model, params_dist)
            batched = jnp.broadcast_to(
                actions[None], (ctrl.n_params, *actions.shape)
            )
        else:
            params, batched = None, actions[None]

        states = ctrl.rollout(state, model, batched, params,
                              key=k_roll)

        # --- costs with the reference reduction order, local slice ---
        inst = ctrl.inst_cost_fn(
            states[..., :-1, :],
            jnp.broadcast_to(
                actions, states[..., :-1, :].shape[:-1] + (ctrl.dim_a,)
            ),
        )
        term = ctrl.term_cost_fn(states[..., -1, :])
        state_cost = (inst.sum(axis=-1) + term).mean(axis=0)
        ctrl_cost = ctrl.a_reg * jnp.einsum(
            "ipta,pta->ip", -(actions - a_seq), a_mat @ ctrl.a_pre
        )
        costs = state_cost + ctrl_cost                # [n_samples, ml]

        # --- information-theoretic plan update with collectives ---
        beta = jax.lax.pmin(costs.min(), axis)
        log_costs = -(costs - beta) / ctrl.temp
        eta = jax.nn.logsumexp(log_costs, axis=0)      # [ml] per policy
        omega = jnp.exp(log_costs - eta)
        a_mat = a_mat + jnp.einsum("ip,ipta->pta", omega, eps)
        eta_max = jax.lax.pmax(eta.max(), axis)
        lse = eta_max + jnp.log(
            jax.lax.psum(jnp.sum(jnp.exp(eta - eta_max)), axis)
        )
        a_mix = jnp.exp(eta - lse)

        # --- Stein direction (standard SVGD, rbf) ---
        grad_pri = prior.score(theta)
        alpha = svmpc.likelihood.alpha
        w = jax.nn.softmax(-costs * alpha, axis=0)
        d_log_pi = (actions - theta) / svmpc.sigma**2
        grad_lik = jnp.sum(w[..., None, None] * d_log_pi, axis=0)
        score = grad_lik + grad_pri

        flat_l = theta.reshape(ml, -1)
        score_l = score.reshape(ml, -1)
        flat_all = jax.lax.all_gather(flat_l, axis, tiled=True)
        score_all = jax.lax.all_gather(score_l, axis, tiled=True)
        # center by the replicated global mean before the Gram
        # identity (see ops/distance.py / parallel/stein.py: the
        # cancellation error grows with ||theta||^2; K, the repulsion
        # term and phi are translation invariant)
        mu = jax.lax.stop_gradient(jnp.mean(flat_all, axis=0,
                                            keepdims=True))
        flat_l = flat_l - mu
        flat_all = flat_all - mu
        d2 = (
            jnp.sum(flat_l**2, axis=1, keepdims=True)
            + jnp.sum(flat_all**2, axis=1)[None, :]
            - 2.0 * flat_l @ flat_all.T
        )
        kmat = jnp.exp(-jnp.maximum(d2, 0.0) / (2.0 * bw**2))
        drive = kmat @ score_all
        repel = (
            jnp.sum(kmat, axis=1, keepdims=True) * flat_l - kmat @ flat_all
        ) / bw**2
        phi = ((drive + repel) / m_total).reshape(theta.shape)

        updates, opt_state = svmpc.optimizer.update(-phi, opt_state, theta)
        theta = optax.apply_updates(theta, updates)
        return theta, opt_state, a_mat, a_mix, costs

    def svgd_step(self, svstate, dstate, state, params_dist, key, bw,
                  noise=None):
        """One particle-sharded SVGD update; same returns as
        `SVMPC.svgd_step` (costs come back particle-sharded)."""
        bw = jnp.asarray(bw, jnp.float32)
        have_noise = noise is not None
        have_params = params_dist is not None

        def body(theta, opt_state, a_seq, a_mat, a_mix, prior, state, key,
                 bw, *rest):
            rest = list(rest)
            pd = rest.pop(0) if have_params else None
            nz = rest.pop(0) if have_noise else None
            return self._local_step(theta, opt_state, a_seq, a_mat, a_mix,
                                    prior, state, key, bw, pd, nz)

        m = svstate.theta.shape[0]
        opt_specs = jax.tree_util.tree_map(
            lambda leaf: P(self.axis) if _is_per_particle(leaf, m) else P(),
            svstate.opt_state,
        )
        in_specs = [P(self.axis), opt_specs, P(), P(self.axis),
                    P(self.axis), P(), P(), P(), P()]
        operands = [svstate.theta, svstate.opt_state, dstate.a_seq,
                    dstate.a_mat, dstate.a_mix, svstate.prior,
                    jnp.asarray(state), key, bw]
        if have_params:
            in_specs.append(P())
            operands.append(params_dist)
        if have_noise:
            in_specs.append(P(None, self.axis))
            operands.append(noise)

        mapped = shard_map(
            body,
            mesh=self.mesh,
            in_specs=tuple(in_specs),
            out_specs=(P(self.axis), opt_specs, P(self.axis),
                       P(self.axis), P(None, self.axis)),
            check_vma=False,
        )
        theta, opt_state, a_mat, a_mix, costs = mapped(*operands)
        svstate = svstate.replace(theta=theta, opt_state=opt_state)
        dstate = dstate.replace(a_mat=a_mat, a_mix=a_mix)
        return svstate, dstate, costs

    def forward(self, svstate, costs, key=None, steps=-1):
        """Selection/roll/prior-refresh on gathered (tiny) per-particle
        quantities; delegates to the wrapped SVMPC."""
        return self.svmpc.forward(svstate, costs, key=key, steps=steps)
