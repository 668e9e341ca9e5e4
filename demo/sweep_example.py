"""Scenario-sweep demo: robustness studies as single device programs.

No reference counterpart (the reference runs episodes sequentially —
`dust/utils/simulations.py:36`); this is the TPU-native pod-scale
surface: N independent DuSt episodes with per-scenario true dynamics
advance in lockstep inside scenario-batched whole-episode Pallas
megakernels (groups of 8 per program, lax.scan over groups).

  python demo/sweep_example.py --task pendulum --scenarios 16 --steps 100
  python demo/sweep_example.py --task particle --scenarios 16 --steps 40

Pendulum: per-scenario true (length, mass) spans the robustness range;
reports per-scenario min/tail swing-up costs. Particle: per-scenario
true base mass; reports success/crash/cost per scenario. On CPU the
kernels run in interpret mode with host noise (slow; use small sizes).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from dust_tpu.experiments import (
    build_particle_stack,
    build_pendulum_stack,
    load_config,
)
from dust_tpu.simulation import (
    megakernel_particle_sweep_fn,
    megakernel_pendulum_sweep_fn,
)
from dust_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

HERE = Path(__file__).parent


def _host_noise(key, steps, hz, smp, n_sc, channels):
    k1, k2, k3 = jax.random.split(key, 3)
    if channels == 2:
        eps = jax.random.normal(k1, (steps, hz, 2, smp, 128))
    else:
        eps = jax.random.normal(k1, (steps, hz, smp, 128))
    pdz = jax.random.normal(k2, (steps, n_sc, 8, 128))
    pdu = jax.random.uniform(k3, (steps, n_sc, 8, 128))
    return eps, pdz, pdu


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--task", choices=("pendulum", "particle"),
                        default="pendulum")
    parser.add_argument("--scenarios", type=int, default=16)
    parser.add_argument("--steps", type=int, default=100)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--tuned", action="store_true",
                        help="use the megakernel-ASHA tuned config "
                        "(particle_config_tuned.yaml / "
                        "pendulum_config_tuned.yaml)")
    args = parser.parse_args()

    on_tpu = jax.default_backend() == "tpu"
    interpret = not on_tpu
    S = 8
    groups = max(1, args.scenarios // S)
    n = groups * S

    if args.task == "pendulum":
        config = load_config(
            HERE / ("pendulum_config_tuned.yaml" if args.tuned
                    else "pendulum_config.yaml"))
        stack = build_pendulum_stack(config, jax.random.key(args.seed),
                                     case="dust")
        exp = config["exp_params"]
        sweep = megakernel_pendulum_sweep_fn(
            stack, exp, steps=args.steps, n_sc=S,
            unroll=on_tpu, interpret=interpret,
        )
        lens = jnp.linspace(0.7, 1.25, S)
        mass = jnp.linspace(1.25, 0.7, S)
        rows = []
        for g in range(groups):
            seed = jnp.array([args.seed + 1, g * 1000], jnp.int32)
            if interpret:
                smp = -(-S * exp["n_particles"] // 8) * 8
                eps, pdz, pdu = _host_noise(
                    jax.random.key(args.seed + 2 + g), args.steps,
                    exp["horizon"], smp, S, channels=1)
                out = sweep(seed, lens, mass, host_eps=eps,
                            host_pdz=pdz, host_pdu=pdu)
            else:
                out = sweep(seed, lens, mass)
            cost = np.asarray(out["cost"])            # [steps, S]
            half = args.steps // 2
            for s in range(S):
                rows.append((g * S + s, float(lens[s]), float(mass[s]),
                             cost[half:, s].min(), cost[-5:, s].mean()))
        print(f"{'scenario':>8} {'length':>7} {'mass':>6} "
              f"{'min_cost(2nd half)':>18} {'tail_cost':>10}")
        for r in rows:
            print(f"{r[0]:>8} {r[1]:>7.3f} {r[2]:>6.3f} "
                  f"{r[3]:>18.4f} {r[4]:>10.4f}")
        solved = sum(1 for r in rows if r[3] < 1.0)
        print(f"\nswing-up achieved: {solved}/{n} scenarios")
    else:
        config = load_config(
            HERE / ("particle_config_tuned.yaml" if args.tuned
                    else "particle_config.yaml"))
        stack = build_particle_stack(config, jax.random.key(args.seed))
        exp = config["exp_params"]
        sweep = megakernel_particle_sweep_fn(
            stack, exp, steps=args.steps, n_sc=S,
            unroll=on_tpu, interpret=interpret,
        )
        masses = jnp.linspace(1.5, 3.0, S)
        rows = []
        for g in range(groups):
            seed = jnp.array([args.seed + 1, g * 1000], jnp.int32)
            if interpret:
                smp = -(-S * exp["n_particles"] // 8) * 8
                eps, pdz, pdu = _host_noise(
                    jax.random.key(args.seed + 2 + g), args.steps,
                    exp["horizon"], smp, S, channels=2)
                out = sweep(seed, masses, host_eps=eps, host_pdz=pdz,
                            host_pdu=pdu)
            else:
                out = sweep(seed, masses)
            done = np.asarray(out["done"][-1])
            crashed = np.asarray(out["crashed"][-1])
            cum = np.asarray(out["cum"][-1])
            for s in range(S):
                rows.append((g * S + s, float(masses[s]),
                             bool(done[s] > 0.5 and crashed[s] < 0.5),
                             bool(crashed[s] > 0.5), cum[s]))
        print(f"{'scenario':>8} {'mass':>6} {'success':>8} "
              f"{'crashed':>8} {'cum_cost':>12}")
        for r in rows:
            print(f"{r[0]:>8} {r[1]:>6.3f} {str(r[2]):>8} "
                  f"{str(r[3]):>8} {r[4]:>12.1f}")
        ok = sum(1 for r in rows if r[2])
        cr = sum(1 for r in rows if r[3])
        print(f"\nsuccess {ok}/{n}, crashed {cr}/{n}")


if __name__ == "__main__":
    main()
