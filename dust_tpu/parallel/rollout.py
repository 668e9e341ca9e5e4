"""Rollout-axis sharded DISCO forward.

For very large action-sample counts the `n_actions` axis of the rollout
batch (`disco.py:137` — n_params x n_actions x n_pol trajectories) shards
across the mesh: each device rolls out its slice of sampled action
sequences and the information-theoretic update reassembles with
collectives over ICI:

* global `beta = min(costs)` — `pmin` (the reference's max-subtraction
  order, `disco.py:380-381`, preserved exactly);
* per-policy normalizer `eta = logsumexp over all action samples` — local
  sum-of-exps + `psum` (`disco.py:383`);
* plan update `delta_p = sum_i omega_ip eps_ip` — local partial + `psum`
  (`disco.py:387-392`).

This is the SURVEY.md §2.2 "rollout-axis sharding" component; sharded ==
unsharded is asserted in tests/test_sharding_rollout.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P


def make_sharded_disco_forward(disco, model, mesh, axis="rollout"):
    """Returns forward(dstate, state, eps [n_actions, P, H, A],
    params) -> (new_dstate, costs, omega) with the action-sample axis
    sharded over `mesh`. `eps` is the action noise (actions = eps + a_mat);
    `params` an optional dict of sampled dynamics parameters (replicated).
    """

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P()),
        out_specs=(P(), P(axis), P(axis)),
        check_vma=False,
    )
    def forward(dstate, state, eps_local, params):
        actions = eps_local + dstate.a_mat          # [na/p, P, H, A]
        batched = (
            jnp.broadcast_to(actions[None], (disco.n_params, *actions.shape))
            if params is not None else actions[None]
        )
        states = disco.rollout(state, model, batched, params)
        costs = disco.compute_cost(dstate, states, actions)

        # Exactly TWO collectives per forward (r5 — measured on the
        # 2/4-process gloo cluster: the forward is latency-bound on
        # per-collective roundtrips, and the same holds for DCN hops on
        # a real pod; was 4 collectives):
        #
        # 1. pmin of the per-policy cost minima. The global
        #    max-subtraction beta (reference order, disco.py:380-381)
        #    is their min — min regroups exactly — and the per-policy
        #    stabilizer max_i log_costs_ip == -(pol_min_p - beta)/temp
        #    derives locally (a policy whose best cost sits far above
        #    beta would otherwise underflow exp entirely and poison eta
        #    with -inf).
        pol_min = jax.lax.pmin(jnp.min(costs, axis=0), axis)       # [P]
        beta = jnp.min(pol_min)
        log_costs = -(costs - beta) / disco.temp     # [na/p, P]
        pol_max = -(pol_min - beta) / disco.temp                   # [P]
        e = jnp.exp(log_costs - pol_max)             # [na/p, P]
        local_sum = jnp.sum(e, axis=0)                             # [P]
        # 2. one psum of the packed (normalizer | unnormalized delta)
        #    payload: delta_p = psum(sum_i e_ip eps_i) / sum_e_p
        #    (the omega normalization factors out of the einsum).
        delta_u = jnp.einsum("ip,ipta->pta", e, eps_local)
        n_pol = local_sum.shape[0]
        packed = jnp.concatenate(
            [local_sum[:, None], delta_u.reshape(n_pol, -1)], axis=1
        )
        packed = jax.lax.psum(packed, axis)
        sum_e = packed[:, 0]                                       # [P]
        delta = (packed[:, 1:] / sum_e[:, None]).reshape(delta_u.shape)
        eta = pol_max + jnp.log(sum_e)                             # [P]
        omega = jnp.exp(log_costs - eta)                           # [na/p, P]
        new_dstate = dstate.replace(
            a_mat=dstate.a_mat + delta,
            a_mix=jnp.exp(eta - jax.nn.logsumexp(eta)),
        )
        return new_dstate, costs, omega

    def call(dstate, state, eps, params=None):
        return forward(dstate, state, eps, params)

    return call
