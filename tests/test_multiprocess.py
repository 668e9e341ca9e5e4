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
