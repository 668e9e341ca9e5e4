"""Multi-HOST runtime smoke: a real 2-process JAX cluster on CPU.

`parallel/mesh.py:initialize_distributed` + global mesh + cross-process
collectives (gloo) are exercised end-to-end: two OS processes, each
contributing 2 virtual CPU devices, form a 4-device global mesh and run
the scenario-sharded pendulum sweep. The replicated per-cluster result
must match the single-process computation on identical inputs — the
same sharded==unsharded discipline as tests/test_sharding.py, but with
the scenario axis split across PROCESS boundaries (the DCN analogue;
SURVEY.md §2.2 multi-host runtime row).

Runs its own subprocesses (the pytest process itself stays
single-process); skipped automatically if the port cannot be bound.
"""

import os
import re
import socket
import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

ROOT = Path(__file__).resolve().parent.parent

WORKER = r"""
import sys
pid, port = int(sys.argv[1]), sys.argv[2]
import jax
try:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass
from dust_tpu.parallel.mesh import initialize_distributed
assert initialize_distributed(f"localhost:{port}", num_processes=2,
                              process_id=pid)
assert jax.process_count() == 2
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
sys.path.insert(0, "__TMPROOT__")
from worker_common import build_sweep, N

devs = jax.devices()
assert len(devs) == 4
mesh = Mesh(devs, ("scenario",))
shard = NamedSharding(mesh, P("scenario"))
rep = NamedSharding(mesh, P())

fn, inputs = build_sweep()

def place(tree, sh):
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_callback(
            jnp.shape(x), sh, lambda idx, x=x: jnp.asarray(x)[idx]
        ),
        tree,
    )

inputs = place(inputs, shard)
mean_cost = jax.jit(fn, out_shardings=rep)(*inputs)
print(f"proc{pid} MEAN={float(mean_cost):.6f}", flush=True)
"""

COMMON = """
import jax
import jax.numpy as jnp

N = 4


def build_sweep():
    from dust_tpu.experiments import build_pendulum_stack, load_config
    from dust_tpu.parallel.sweep import broadcast_scenarios

    config = load_config("demo/pendulum_config.yaml")
    config["exp_params"].update(
        horizon=8, n_particles=2, action_samples=8, params_samples=2,
        mpf_n_particles=8, mpf_steps=2,
    )
    stack = build_pendulum_stack(config, jax.random.key(0), case="dust")
    from dust_tpu.simulation import PendulumSimulation

    harness = PendulumSimulation(
        controller=stack.controller, svmpc=stack.svmpc, mpf=stack.mpf,
        model=stack.model, steps=3, warm_up=0, mpf_bw=stack.mpf_bw,
        mpf_steps=stack.mpf_steps,
    )
    episode = harness.episode_fn(stack.dynamics_prior)
    keys = jax.random.split(jax.random.key(7), N)
    true_params = {
        "length": jnp.linspace(0.8, 1.2, N),
        "mass": jnp.linspace(0.9, 1.1, N),
    }
    init_obs = jnp.broadcast_to(stack.init_state.reshape(1, 1, -1),
                                (N, 1, 2))
    dstate = broadcast_scenarios(
        stack.controller.init_state(stack.init_policies), N
    )
    svstate = broadcast_scenarios(
        stack.svmpc.init_state(stack.init_policies,
                               stack.policies_prior), N
    )
    mstate = broadcast_scenarios(
        stack.mpf.init_state(stack.mpf_init, stack.init_state, 1), N
    )

    def fn(keys, true_params, init_obs, dstate, svstate, mstate):
        _, logs = jax.vmap(episode)(
            keys, true_params, init_obs, dstate, svstate, mstate
        )
        return jnp.mean(logs[2])          # mean per-step cost

    return fn, (keys, true_params, init_obs, dstate, svstate, mstate)
"""


BULK_WORKER = r"""
import sys
pid, port = int(sys.argv[1]), sys.argv[2]
import jax
try:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass
from dust_tpu.parallel.mesh import initialize_distributed
assert initialize_distributed(f"localhost:{port}", num_processes=2,
                              process_id=pid)
assert jax.process_count() == 2
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
sys.path.insert(0, "__TMPROOT__")
import bulk_common as bc

devs = jax.devices()
assert len(devs) == 4
mesh = Mesh(devs, ("particle",))
shard = NamedSharding(mesh, P("particle"))
rep = NamedSharding(mesh, P())

def place(tree, sh):
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_callback(
            jnp.shape(x), sh, lambda idx, x=x: jnp.asarray(x)[idx]
        ),
        tree,
    )

# --- particle-axis ShardedMPF: the all_gather carries the [m, d]
# particle/score payload across the PROCESS boundary ---
mpf = bc.make_sharded_mpf(mesh)
init, obs, action, new_obs = bc.mpf_inputs()
ms0 = mpf.init_state(jnp.asarray(init), jnp.asarray(obs), dim_a=1,
                     bw=0.2)
m = init.shape[0]
ms0 = jax.tree_util.tree_map(
    lambda leaf: place(
        leaf,
        shard if hasattr(leaf, "shape") and leaf.shape[:1] == (m,)
        else rep,
    ),
    ms0,
)

def run_mpf(ms, a, o):
    ms1, grads, _ = mpf.optimize(ms, a, o, bw=0.3, n_steps=5)
    return jnp.sum(ms1.x), jnp.sum(ms1.x * ms1.x), grads[-1]

s1, s2, g = jax.jit(run_mpf, out_shardings=rep)(
    ms0, place(jnp.asarray(action), rep), place(jnp.asarray(new_obs), rep)
)
print(f"proc{pid} MPF={float(s1):.6f},{float(s2):.6f},{float(g):.6f}",
      flush=True)

# --- rollout-axis DISCO forward: psum/pmin reassembly of the
# information-theoretic update across processes ---
rmesh = Mesh(devs, ("rollout",))
rshard = NamedSharding(rmesh, P("rollout"))
rrep = NamedSharding(rmesh, P())
ctrl, model, dstate, state, eps = bc.rollout_setup()
from dust_tpu.parallel.rollout import make_sharded_disco_forward
fwd = make_sharded_disco_forward(ctrl, model, rmesh)

def run_fwd(ds, st, e):
    ds1, costs, omega = fwd(ds, st, e)
    return jnp.sum(ds1.a_mat), jnp.mean(costs), jnp.sum(omega * omega)

a1, c1, o1 = jax.jit(run_fwd, out_shardings=rrep)(
    place(dstate, rrep), place(jnp.asarray(state), rrep),
    place(jnp.asarray(eps), rshard),
)
print(f"proc{pid} FWD={float(a1):.6f},{float(c1):.6f},{float(o1):.6f}",
      flush=True)

# --- particle-sharded SVMPC: the third sharding axis (VERDICT r4 #4) —
# the Stein all_gather + plan-update psum/pmin/pmax cross the PROCESS
# boundary with the [m, H*A] particle/score payloads ---
from dust_tpu.parallel.svmpc_sharded import ShardedSVMPC
model5, ctrl5, svmpc5, theta05, noise5, params5, obs5 = bc.svmpc_setup()
sh5 = ShardedSVMPC(svmpc5, model5, mesh)  # ("particle",) mesh above

def run_sv(theta0, noise, obs, key):
    from dust_tpu.distributions import GMM
    prior = GMM.from_cov(theta0, jnp.ones(bc.SVM_M), 4.0 * jnp.eye(1))
    sv = svmpc5.init_state(theta0, prior)
    ds = ctrl5.init_state()
    sv2, ds2, costs = sh5.svgd_step(sv, ds, obs, params5, key, 0.9,
                                    noise=noise)
    _, a_seq, _ = sh5.forward(sv2, costs)
    return (jnp.sum(sv2.theta), jnp.sum(sv2.theta * sv2.theta)
            + jnp.sum(ds2.a_mat), jnp.sum(a_seq))

s5 = jax.jit(run_sv, out_shardings=rep)(
    place(theta05, shard),
    place(noise5, NamedSharding(mesh, P(None, "particle"))),
    place(obs5, rep), jax.random.key(21),
)
print(f"proc{pid} SVM={float(s5[0]):.6f},{float(s5[1]):.6f},"
      f"{float(s5[2]):.6f}", flush=True)
"""

BULK_COMMON = """
import jax
import jax.numpy as jnp
import numpy as np
import optax

M = 256


def mpf_inputs():
    rng = np.random.default_rng(11)
    init = rng.uniform(0.6, 1.3, size=(M, 2)).astype(np.float32)
    obs = np.array([2.8, -0.2], dtype=np.float32)
    action = np.array([0.8], dtype=np.float32)
    new_obs = np.array([2.7, -0.5], dtype=np.float32)
    return init, obs, action, new_obs


def _likelihood():
    from dust_tpu.inference import GaussianLikelihood
    from dust_tpu.models import PendulumModel

    model = PendulumModel(uncertain_params=("length", "mass"))
    return GaussianLikelihood(obs_std=0.1, model=model)


def make_sharded_mpf(mesh):
    from dust_tpu.parallel.stein import ShardedMPF

    return ShardedMPF(likelihood=_likelihood(), mesh=mesh,
                      optimizer=optax.sgd(1e-3))


def make_plain_mpf():
    from dust_tpu.inference import MPF

    return MPF(likelihood=_likelihood(), optimizer=optax.sgd(1e-3))


from flax import struct


@struct.dataclass
class FixedParams:
    \"\"\"Deterministic params_dist pytree: both the sharded worker and the
    single-process oracle draw identical dynamics parameters.\"\"\"

    draws: jnp.ndarray

    def sample(self, key, shape):
        return self.draws

    def log_prob(self, x):
        return jnp.zeros(self.draws.shape[0])


SVM_M, SVM_HZ, SVM_NS = 8, 10, 16


def svmpc_setup():
    import optax
    from dust_tpu.controllers import MultiDisco
    from dust_tpu.inference import ExponentiatedUtility, SVMPC
    from dust_tpu.models import PendulumModel
    from dust_tpu.spaces import Box
    from tests.test_disco import inst_cost_jnp, term_cost_jnp

    rng = np.random.default_rng(17)
    model = PendulumModel(uncertain_params=("length", "mass"))
    ctrl = MultiDisco(
        observation_space=Box(dim=2),
        action_space=Box(dim=1, low=-2.0, high=2.0),
        hz_len=SVM_HZ, n_policies=SVM_M, action_samples=SVM_NS,
        params_samples=4, a_cov=4.0 * jnp.eye(1),
        inst_cost_fn=inst_cost_jnp, term_cost_fn=term_cost_jnp,
        params_sampling=True,
    )
    lik = ExponentiatedUtility(alpha=1.0, n_samples=SVM_NS,
                               controller=ctrl, model=model)
    svmpc = SVMPC(likelihood=lik, kernel="rbf", n_particles=SVM_M,
                  optimizer=optax.sgd(1.0), reference_compat=False)
    theta0 = jnp.asarray(rng.normal(size=(SVM_M, SVM_HZ, 1)) * 2,
                         jnp.float32)
    noise = jnp.asarray(
        rng.normal(size=(SVM_NS, SVM_M, SVM_HZ, 1)), jnp.float32)
    params = FixedParams(
        draws=jnp.asarray(rng.uniform(0.6, 1.3, size=(4, 2)),
                          jnp.float32))
    obs = jnp.array([[3.0, 0.0]], jnp.float32)
    return model, ctrl, svmpc, theta0, noise, params, obs


def rollout_setup():
    from dust_tpu.controllers import MultiDisco
    from dust_tpu.models import PendulumModel
    from dust_tpu.spaces import Box
    from tests.test_disco import inst_cost_jnp, term_cost_jnp

    rng = np.random.default_rng(13)
    model = PendulumModel()
    n_actions, n_pol, horizon = 64, 3, 10
    ctrl = MultiDisco(
        observation_space=Box(dim=2),
        action_space=Box(dim=1, low=-2.0, high=2.0),
        hz_len=horizon,
        n_policies=n_pol,
        action_samples=n_actions,
        temperature=0.8,
        a_cov=4.0 * jnp.eye(1),
        inst_cost_fn=inst_cost_jnp,
        term_cost_fn=term_cost_jnp,
        params_sampling="none",
    )
    a_mat0 = jnp.asarray(rng.normal(size=(n_pol, horizon, 1)),
                         jnp.float32)
    eps = jnp.asarray(
        rng.normal(size=(n_actions, n_pol, horizon, 1)) * 2, jnp.float32
    )
    state = np.array([[3.0, 0.2]], dtype=np.float32)
    dstate = ctrl.init_state(a_mat0)
    return ctrl, model, dstate, state, eps
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_cluster_matches_single_process(tmp_path):
    (tmp_path / "worker_common.py").write_text(COMMON)
    (tmp_path / "worker.py").write_text(
        WORKER.replace("__TMPROOT__", str(tmp_path))
    )
    port = _free_port()
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = str(ROOT)
    procs = [
        subprocess.Popen(
            [sys.executable, str(tmp_path / "worker.py"), str(i),
             str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd=str(ROOT), env=env, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, out

    means = []
    for out in outs:
        match = re.search(r"MEAN=([-\d.]+)", out)
        assert match, out
        means.append(float(match.group(1)))
    # both processes see the same replicated cluster-wide result
    assert means[0] == means[1], means

    # single-process oracle on identical inputs (this pytest process
    # has 8 virtual devices; run unsharded)
    sys.path.insert(0, str(tmp_path))
    try:
        import worker_common

        fn, inputs = worker_common.build_sweep()
        expected = float(jax.jit(fn)(*inputs))
    finally:
        sys.path.remove(str(tmp_path))
        sys.modules.pop("worker_common", None)
    np.testing.assert_allclose(means[0], expected, rtol=2e-5)


def test_two_process_bulk_collectives_match_single_process(tmp_path):
    """The particle-axis ShardedMPF all_gather (real [m, d] payload) and
    the rollout-axis DISCO psum/pmin cross the PROCESS boundary and
    reproduce the single-process math (VERDICT r3 #4: the DCN story was
    previously validated only for scenario-DP scalar traffic)."""
    (tmp_path / "bulk_common.py").write_text(BULK_COMMON)
    (tmp_path / "bulk_worker.py").write_text(
        BULK_WORKER.replace("__TMPROOT__", str(tmp_path))
    )
    port = _free_port()
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = str(ROOT)
    procs = [
        subprocess.Popen(
            [sys.executable, str(tmp_path / "bulk_worker.py"), str(i),
             str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd=str(ROOT), env=env, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, out

    vals = {}
    for out in outs:
        for tag in ("MPF", "FWD", "SVM"):
            match = re.search(rf"{tag}=([-\d.]+),([-\d.]+),([-\d.]+)",
                              out)
            assert match, out
            vals.setdefault(tag, []).append(
                tuple(float(g) for g in match.groups())
            )
    # both processes agree on the replicated cluster-wide digests
    assert vals["MPF"][0] == vals["MPF"][1], vals
    assert vals["FWD"][0] == vals["FWD"][1], vals
    assert vals["SVM"][0] == vals["SVM"][1], vals

    # single-process oracles on identical inputs
    sys.path.insert(0, str(tmp_path))
    try:
        import bulk_common as bc

        mpf = bc.make_plain_mpf()
        init, obs, action, new_obs = bc.mpf_inputs()
        ms0 = mpf.init_state(init, obs, dim_a=1, bw=0.2)
        ms1, grads, _ = mpf.optimize(
            ms0, jnp.asarray(action), jnp.asarray(new_obs), bw=0.3,
            n_steps=5,
        )
        exp_mpf = (float(jnp.sum(ms1.x)), float(jnp.sum(ms1.x * ms1.x)),
                   float(grads[-1]))

        ctrl, model, dstate, state, eps = bc.rollout_setup()
        ds_ref, costs_ref, _, _, omega_ref, _ = ctrl.forward(
            dstate, jnp.asarray(state), model, eps_noise=eps
        )
        exp_fwd = (float(jnp.sum(ds_ref.a_mat)),
                   float(jnp.mean(costs_ref)),
                   float(jnp.sum(omega_ref * omega_ref)))

        from dust_tpu.distributions import GMM

        model5, ctrl5, svmpc5, theta05, noise5, params5, obs5 = (
            bc.svmpc_setup()
        )
        prior5 = GMM.from_cov(theta05, jnp.ones(bc.SVM_M),
                              4.0 * jnp.eye(1))
        sv_u = svmpc5.init_state(theta05, prior5)
        ds_u = ctrl5.init_state()
        sv_u, ds_u, costs_u = svmpc5.svgd_step(
            sv_u, ds_u, obs5, params5, jax.random.key(21), 0.9,
            noise=noise5,
        )
        _, a_seq_u, _ = svmpc5.forward(sv_u, costs_u)
        exp_svm = (
            float(jnp.sum(sv_u.theta)),
            float(jnp.sum(sv_u.theta * sv_u.theta)
                  + jnp.sum(ds_u.a_mat)),
            float(jnp.sum(a_seq_u)),
        )
    finally:
        sys.path.remove(str(tmp_path))
        sys.modules.pop("bulk_common", None)

    np.testing.assert_allclose(vals["MPF"][0], exp_mpf, rtol=2e-4,
                               atol=1e-5)
    np.testing.assert_allclose(vals["FWD"][0], exp_fwd, rtol=2e-4,
                               atol=1e-5)
    np.testing.assert_allclose(vals["SVM"][0], exp_svm, rtol=2e-4,
                               atol=1e-4)
