"""Pendulum swing-up experiment: the DuSt paper's 4-case comparison.

TPU-native counterpart of the reference `demo/pendulum_example.py:31-263`:
DuSt-MPC (dual inference), SVMPC (mean params), MPPI baseline (exact
model), and DISCO+UTF, all on the same sampled set of true parameters.

Usage:
    python demo/pendulum_example.py [--steps N] [--episodes N]
        [--cases dust,svmpc,mppi,disco_utf] [--seed N] [--save]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import pandas as pd

from dust_tpu.experiments import build_pendulum_stack, load_config
from dust_tpu.simulation import PendulumSimulation
from dust_tpu.utils.helper import save_progress
from dust_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

CASES = {
    "dust": "DuSt-MPC",
    "svmpc": "SVMPC",
    "mppi": "MPPI Baseline",
    "disco_utf": "DISCO",
}


def render_frames(df_ep, out_dir, fps=20):
    """Per-step pendulum frames + MP4 — the headless counterpart of the
    reference's live gym window (`/root/reference/dust/utils/
    simulations.py:105-106` calls `env.render()` every MPC step when
    `render=True`; gym-v0 pendulum draws a rod from the pivot at angle
    theta, 0 = upright). One persistent figure; only the rod/bob/torque
    artists update between frames (the particle demo's pattern,
    `demo/particle_example.py:61-82`)."""
    import math

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from dust_tpu.utils.helper import create_video_from_plots

    out_dir = Path(out_dir)
    plot_dir = out_dir / "plots"
    plot_dir.mkdir(parents=True, exist_ok=True)
    thetas = df_ep["Position"].to_numpy()
    actions = df_ep["Actions"].to_numpy()
    costs = df_ep["Cost"].to_numpy()

    fig, ax = plt.subplots(figsize=(4, 4))
    ax.set_xlim(-1.3, 1.3)
    ax.set_ylim(-1.3, 1.3)
    ax.set_aspect("equal")
    ax.axhline(0.0, color="#cccccc", lw=0.8, zorder=0)
    ax.axvline(0.0, color="#cccccc", lw=0.8, zorder=0)
    (rod,) = ax.plot([], [], lw=5, color="#8b5a2b", solid_capstyle="round")
    (bob,) = ax.plot([], [], "o", markersize=14, color="#1f77b4")
    # applied torque as a bar under the pendulum (gym draws a rotating
    # arrow; a signed bar carries the same signal headlessly)
    (torque,) = ax.plot([], [], lw=6, color="#d62728",
                        solid_capstyle="butt")
    title = ax.set_title("")
    for t in range(len(thetas)):
        x, y = math.sin(thetas[t]), math.cos(thetas[t])
        rod.set_data([0.0, x], [0.0, y])
        bob.set_data([x], [y])
        torque.set_data([0.0, actions[t] / 2.0], [-1.2, -1.2])
        title.set_text(f"t={t}  cost={costs[t]:.2f}")
        fig.savefig(plot_dir / f"frame_{t:04d}.png")
    plt.close(fig)
    video = create_video_from_plots(out_dir, plot_dir, fps=fps)
    return plot_dir, video


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default=None)
    parser.add_argument("--steps", type=int, default=None)
    parser.add_argument("--episodes", type=int, default=None)
    parser.add_argument("--cases", default="dust,svmpc,mppi,disco_utf")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--save", action="store_true")
    parser.add_argument("--render", action="store_true",
                        help="per-step pendulum frames + MP4 for each "
                        "case's episode 0 (headless stand-in for the "
                        "reference's live gym window)")
    parser.add_argument("--tuned", action="store_true",
                        help="use the robustness-tuned config "
                        "(pendulum_config_tuned.yaml, r4 --tail ASHA)")
    args = parser.parse_args()

    config_path = args.config or Path(__file__).parent / (
        "pendulum_config_tuned.yaml" if args.tuned
        else "pendulum_config.yaml")
    config_data = load_config(config_path)
    sim = config_data["sim_params"]
    steps = args.steps or sim["steps"]
    episodes = args.episodes or sim["episodes"]

    key = jax.random.key(args.seed)
    key, k_params = jax.random.split(key)

    # One true-parameter set shared by all cases
    # (`pendulum_example.py:149-152`)
    from dust_tpu.distributions import Uniform
    import jax.numpy as jnp

    dyn_prior = Uniform(
        jnp.array([0.6, 0.6]), jnp.array([1.3, 1.3]), event_ndims=1
    )
    draws = dyn_prior.sample(k_params, (episodes,))
    parameters_set = [
        {"length": float(d[0]), "mass": float(d[1])} for d in draws
    ]
    print("true parameter sets:", parameters_set)

    result_df = pd.DataFrame([])
    for case in args.cases.split(","):
        label = CASES[case]
        print(f"\nRunning {label} simulation:")
        key, k_build, k_run = jax.random.split(key, 3)
        stack = build_pendulum_stack(config_data, k_build, case=case)
        experiment_params = parameters_set
        harness = PendulumSimulation(
            controller=stack.controller,
            svmpc=stack.svmpc,
            mpf=stack.mpf,
            model=stack.model,
            steps=steps,
            warm_up=sim["warm_up"],
            use_svmpc=stack.svmpc is not None,
            mpf_bw=stack.mpf_bw,
            mpf_steps=stack.mpf_steps,
            # MPPI baseline plans with the exact per-episode model
            # (`pendulum_example.py:217-236` use_exact_model=True)
            use_exact_model=(case == "mppi"),
        )
        df = harness.run(
            k_run,
            experiment_params,
            init_state=stack.init_state,
            init_policies=stack.init_policies,
            policies_prior=stack.policies_prior,
            dyn_dist=stack.dynamics_prior,
            mpf_init=stack.mpf_init,
            verbose=True,
        )
        df["Case"] = label
        result_df = pd.concat((result_df, df), axis=0)
        tail = df.groupby("Iteration")["Cost"].apply(
            lambda s: s.tail(max(steps // 10, 1)).mean()
        )
        print(f"{label}: mean terminal cost per episode:\n{tail}")
        if args.render:
            out = save_progress(
                data=df.reset_index().to_dict(), params=config_data
            )
            frames, video = render_frames(df[df["Iteration"] == 0], out)
            n_frames = len(list(frames.glob("frame_*.png")))
            print(f"  rendered {n_frames} frames -> {video}")

    print("\nSummary (mean AvgCumCost at final step):")
    print(
        result_df[result_df["Timestep"] == steps - 1]
        .groupby("Case")["AvgCumCost"]
        .mean()
    )
    if args.save:
        path = save_progress(
            data=result_df.reset_index().to_dict(), params=config_data
        )
        print(f"saved to {path}")


if __name__ == "__main__":
    main()
