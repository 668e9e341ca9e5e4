"""Timed multi-PROCESS weak-scaling curve for the scenario-sharded sweep.

VERDICT r1 #4: `tests/test_multiprocess.py` proves 2-process gloo
*correctness*; this records the *efficiency* evidence. Real multi-host
TPU slices are unavailable this round, so this is the CPU proxy bound
for the DCN-path overhead: P OS processes (P = 1, 2, 4), each pinned to
ONE dedicated core (taskset) and contributing one single-threaded XLA
CPU device, form a P-device global mesh via
`parallel/mesh.py:initialize_distributed` + gloo collectives — the same
runtime stack a multi-host TPU pod uses across DCN (SURVEY.md §2.2
multi-host row), minus the chips.

Weak scaling: each process owns a FIXED number of scenarios (whole
closed-loop pendulum DuSt episodes; zero cross-process traffic except
the final replicated mean — exactly the production sharding layout), so
ideal scaling is rate(P) = P * rate(1) and

    efficiency(P) = rate(P) / (P * rate(1)).

The measured efficiency bounds the per-step cost of process coordination
(gloo barrier + result all-reduce) for the scenario-DP design; it does
NOT measure ICI/DCN bandwidth (no real interconnect is exercised).

Run: python bench/bench_multiprocess_scaling.py
     [--procs 1,2,4] [--per-proc 4] [--steps 20] [--repeats 3]
Prints one JSON line per P plus a summary line with efficiencies.
"""

import argparse
import json
import os
import re
import socket
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

WORKER = r"""
import sys, time, json
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
per_proc = int(sys.argv[4]); steps = int(sys.argv[5])
repeats = int(sys.argv[6])
import jax
try:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass
sys.path.insert(0, "__ROOT__")
if nproc > 1:
    from dust_tpu.parallel.mesh import initialize_distributed
    assert initialize_distributed(f"localhost:{port}",
                                  num_processes=nproc, process_id=pid)
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dust_tpu.experiments import build_pendulum_stack, load_config
from dust_tpu.parallel.sweep import broadcast_scenarios
from dust_tpu.simulation import PendulumSimulation

devs = jax.devices()
assert len(devs) == nproc, (len(devs), nproc)
mesh = Mesh(devs, ("scenario",))
shard = NamedSharding(mesh, P("scenario"))
rep = NamedSharding(mesh, P())

config = load_config("__ROOT__/demo/pendulum_config.yaml")
config["exp_params"].update(
    horizon=16, action_samples=32, params_samples=4,
    mpf_n_particles=16, mpf_steps=5, n_particles=3,
)
stack = build_pendulum_stack(config, jax.random.key(0), case="dust")
harness = PendulumSimulation(
    controller=stack.controller, svmpc=stack.svmpc, mpf=stack.mpf,
    model=stack.model, steps=steps, warm_up=0, mpf_bw=stack.mpf_bw,
    mpf_steps=5,
)
episode = harness.episode_fn(stack.dynamics_prior)

n = per_proc * nproc
keys = jax.random.split(jax.random.key(7), n)
true_params = {"length": jnp.linspace(0.8, 1.2, n),
               "mass": jnp.linspace(0.9, 1.1, n)}
init_obs = jnp.broadcast_to(stack.init_state.reshape(1, 1, -1), (n, 1, 2))
dstate = broadcast_scenarios(
    stack.controller.init_state(stack.init_policies), n)
svstate = broadcast_scenarios(
    stack.svmpc.init_state(stack.init_policies, stack.policies_prior), n)
mstate = broadcast_scenarios(
    stack.mpf.init_state(stack.mpf_init, stack.init_state, 1), n)


def place(tree, sh):
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_callback(
            jnp.shape(x), sh, lambda idx, x=x: jnp.asarray(x)[idx]
        ),
        tree,
    )


inputs = place((keys, true_params, init_obs, dstate, svstate, mstate),
               shard)


def fn(keys, true_params, init_obs, dstate, svstate, mstate):
    _, logs = jax.vmap(episode)(
        keys, true_params, init_obs, dstate, svstate, mstate
    )
    return jnp.mean(logs[2])


run = jax.jit(fn, out_shardings=rep)
out = run(*inputs)          # compile + warm (collective: all procs)
jax.block_until_ready(out)
best = float("inf")
for i in range(repeats):
    t0 = time.perf_counter()
    out = run(*inputs)
    jax.block_until_ready(out)
    best = min(best, time.perf_counter() - t0)
if pid == 0:
    rate = n * steps / best
    print(json.dumps({"procs": nproc, "episodes": n, "steps": steps,
                      "solves_per_s": round(rate, 2),
                      "mean_cost": float(out)}), flush=True)
"""


MPF_WORKER = r"""
import sys, time, json
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
m = int(sys.argv[4]); steps = int(sys.argv[5])
repeats = int(sys.argv[6])
import jax
try:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass
sys.path.insert(0, "__ROOT__")
if nproc > 1:
    from dust_tpu.parallel.mesh import initialize_distributed
    assert initialize_distributed(f"localhost:{port}",
                                  num_processes=nproc, process_id=pid)
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dust_tpu.inference import GaussianLikelihood
from dust_tpu.models import PendulumModel
from dust_tpu.parallel.stein import ShardedMPF

devs = jax.devices()
assert len(devs) == nproc, (len(devs), nproc)
mesh = Mesh(devs, ("particle",))
shard = NamedSharding(mesh, P("particle"))
rep = NamedSharding(mesh, P())

model = PendulumModel(uncertain_params=("length", "mass"))
mpf = ShardedMPF(likelihood=GaussianLikelihood(obs_std=0.1,
                                               model=model),
                 mesh=mesh, optimizer=optax.sgd(1e-3))
rng = np.random.default_rng(11)
init = rng.uniform(0.6, 1.3, size=(m, 2)).astype(np.float32)
ms0 = mpf.init_state(jnp.asarray(init),
                     jnp.asarray([2.8, -0.2], jnp.float32),
                     dim_a=1, bw=0.2)


def place(tree_leaf, sh):
    return jax.make_array_from_callback(
        jnp.shape(tree_leaf), sh,
        lambda idx, x=tree_leaf: jnp.asarray(x)[idx])


ms0 = jax.tree_util.tree_map(
    lambda leaf: place(
        leaf,
        shard if hasattr(leaf, "shape") and leaf.shape[:1] == (m,)
        else rep),
    ms0)
action = place(jnp.asarray([0.8], jnp.float32), rep)
new_obs = place(jnp.asarray([2.7, -0.5], jnp.float32), rep)


def run(ms, a, o):
    ms1, _, _ = mpf.optimize(ms, a, o, bw=0.3, n_steps=steps)
    return jnp.sum(ms1.x)


fn = jax.jit(run, out_shardings=rep)
jax.block_until_ready(fn(ms0, action, new_obs))
best = float("inf")
for i in range(repeats):
    t0 = time.perf_counter()
    jax.block_until_ready(fn(ms0, action, new_obs))
    best = min(best, time.perf_counter() - t0)
if pid == 0:
    # bulk DCN-path payload: each of the `steps` SVGD iterations
    # all_gathers the [m, 2] particles AND the [m, 2] scores (f32)
    bulk_mb = steps * 2 * m * 2 * 4 / 1e6
    print(json.dumps({"procs": nproc, "m": m, "steps": steps,
                      "solves_per_s": round(steps / best, 2),
                      "unit": "svgd_steps_per_s",
                      "bulk_mb_per_optimize": round(bulk_mb, 3)}),
          flush=True)
"""


ROLLOUT_WORKER = r"""
import sys, time, json
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
n_act = int(sys.argv[4]); steps = int(sys.argv[5])
repeats = int(sys.argv[6])
import jax
try:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass
sys.path.insert(0, "__ROOT__")
if nproc > 1:
    from dust_tpu.parallel.mesh import initialize_distributed
    assert initialize_distributed(f"localhost:{port}",
                                  num_processes=nproc, process_id=pid)
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dust_tpu.controllers import MultiDisco
from dust_tpu.models import PendulumModel
from dust_tpu.parallel.rollout import make_sharded_disco_forward
from dust_tpu.spaces import Box
from tests.test_disco import inst_cost_jnp, term_cost_jnp

devs = jax.devices()
assert len(devs) == nproc, (len(devs), nproc)
mesh = Mesh(devs, ("rollout",))
rep = NamedSharding(mesh, P())

# bench-scale rollout counts (VERDICT r4 #4): the reference pendulum
# workload is 128 actions x 3 policies x 8 params; this strong-scaling
# curve fixes a 16x action batch (2048 x 8 policies x horizon 30
# rollouts per forward) and splits the ACTION axis across processes —
# the psum/pmin/pmax reassembly of the information-theoretic update is
# the cross-process traffic (parallel/rollout.py).
n_pol, horizon = 8, 30
model = PendulumModel()
ctrl = MultiDisco(
    observation_space=Box(dim=2),
    action_space=Box(dim=1, low=-2.0, high=2.0),
    hz_len=horizon, n_policies=n_pol, action_samples=n_act,
    temperature=0.8, a_cov=4.0 * jnp.eye(1),
    inst_cost_fn=inst_cost_jnp, term_cost_fn=term_cost_jnp,
    params_sampling="none",
)
fwd = make_sharded_disco_forward(ctrl, model, mesh)
rng = np.random.default_rng(13)
a_mat0 = jnp.asarray(rng.normal(size=(n_pol, horizon, 1)), jnp.float32)
eps_np = (rng.normal(size=(steps, n_act, n_pol, horizon, 1)) * 2
          ).astype(np.float32)


def place(x, sh):
    return jax.make_array_from_callback(
        jnp.shape(x), sh, lambda idx, x=x: jnp.asarray(x)[idx])


eps = place(eps_np, NamedSharding(mesh, P(None, "rollout")))
state = place(jnp.asarray([[3.0, 0.2]], jnp.float32), rep)
dstate0 = jax.tree_util.tree_map(lambda x: place(jnp.asarray(x), rep),
                                 ctrl.init_state(a_mat0))


def run(ds, st, eps_all):
    def body(ds, e):
        ds2, costs, _ = fwd(ds, st, e)
        return ds2, jnp.mean(costs)

    ds, mc = jax.lax.scan(body, ds, eps_all)
    return jnp.sum(ds.a_mat), jnp.mean(mc)


fn = jax.jit(run, out_shardings=(rep, rep))
jax.block_until_ready(fn(dstate0, state, eps))
best = float("inf")
for i in range(repeats):
    t0 = time.perf_counter()
    jax.block_until_ready(fn(dstate0, state, eps))
    best = min(best, time.perf_counter() - t0)
if pid == 0:
    print(json.dumps({"procs": nproc, "n_act": n_act, "steps": steps,
                      "solves_per_s": round(steps / best, 2),
                      "unit": "disco_forwards_per_s",
                      "rollouts_per_s": round(
                          steps * n_act * n_pol / best, 1)}),
          flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def run_cluster(nproc, per_proc, steps, repeats, worker_path):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    # one single-threaded device per process: scaling then measures
    # coordination overhead, not core oversubscription
    env["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=1 "
                        "--xla_cpu_multi_thread_eigen=false")
    env["PYTHONPATH"] = str(ROOT)
    env["OMP_NUM_THREADS"] = "1"
    port = _free_port()
    ncores = os.cpu_count() or 1
    procs = []
    for i in range(nproc):
        cmd = [sys.executable, str(worker_path), str(i), str(nproc),
               str(port), str(per_proc), str(steps), str(repeats)]
        if os.path.exists("/usr/bin/taskset"):
            # round-robin when nproc > ncores: the summary then scores
            # such points against a compute-matched ideal (see main)
            cmd = ["taskset", "-c", str(i % ncores)] + cmd
        procs.append(subprocess.Popen(
            cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd=str(ROOT), env=env, text=True,
        ))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
        if p.returncode != 0:
            raise RuntimeError(f"worker failed:\n{out}")
    for out in outs:
        m = re.search(r'(\{"procs".*\})', out)
        if m:
            return json.loads(m.group(1))
    raise RuntimeError("no result line:\n" + "\n".join(outs))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--procs", default="1,2,4")
    parser.add_argument("--per-proc", type=int, default=4)
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--repeats", type=int, default=3)
    parser.add_argument("--mode", default="episodes",
                        choices=("episodes", "mpf", "rollout"),
                        help="episodes: scenario-DP weak scaling "
                        "(scalar cross-process traffic). mpf: "
                        "particle-axis ShardedMPF STRONG scaling at "
                        "fixed m — every SVGD step all_gathers the "
                        "[m, 2] particle/score payload across the "
                        "process boundary (the bulk DCN-path traffic "
                        "VERDICT r3 #4 asked to measure). rollout: "
                        "rollout-axis psum DISCO forward STRONG "
                        "scaling at a fixed bench-scale action batch "
                        "(VERDICT r4 #4 — the third sharding axis)")
    parser.add_argument("--m", type=int, default=4096,
                        help="mpf mode: total particle count")
    parser.add_argument("--n-act", type=int, default=2048,
                        help="rollout mode: total action samples "
                        "(x 8 policies x horizon 30 per forward)")
    args = parser.parse_args()

    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        worker_path = Path(tmp) / "scaling_worker.py"
        if args.mode == "mpf":
            worker_path.write_text(
                MPF_WORKER.replace("__ROOT__", str(ROOT)))
            size_arg = args.m
        elif args.mode == "rollout":
            worker_path.write_text(
                ROLLOUT_WORKER.replace("__ROOT__", str(ROOT)))
            size_arg = args.n_act
        else:
            worker_path.write_text(WORKER.replace("__ROOT__", str(ROOT)))
            size_arg = args.per_proc
        results = {}
        for nproc in [int(p) for p in args.procs.split(",")]:
            r = run_cluster(nproc, size_arg, args.steps,
                            args.repeats, worker_path)
            results[nproc] = r
            print(json.dumps(r), flush=True)

    base = min(results)
    base_rate = results[base]["solves_per_s"] / base
    # When P exceeds the physical core count the workers share cores
    # (2 per core at P=8 on this 4-core box), so the ideal rate is
    # compute-bound at ncores * base_rate — efficiency then measures
    # the ADDED P-way gloo coordination overhead at fixed compute,
    # not fabricated per-core scaling.
    ncores = os.cpu_count() or 1
    summary = {
        ("strong_scaling_efficiency" if args.mode in ("mpf", "rollout")
         else "weak_scaling_efficiency"): {
            str(p): round(
                r["solves_per_s"] / (min(p, ncores) * base_rate), 4)
            for p, r in results.items()
        },
        "mode": args.mode,
        "physical_cores": ncores,
        "oversubscribed_points": [p for p in results if p > ncores],
        ("m_total" if args.mode == "mpf"
         else "n_act" if args.mode == "rollout"
         else "per_proc_episodes"): size_arg,
        "steps": args.steps,
        "collectives": "gloo" if len(results) > 1 else "none",
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
