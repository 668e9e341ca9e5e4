"""Particle 2-D navigation with obstacles: DuSt with changing dynamics.

TPU-native counterpart of the reference `demo/particle_example.py:21-254`:
SVMPC + MPF dual loop navigating an occupancy-grid world; the simulator
mass increases mid-episode, the MPF posterior tracks it online.

Usage:
    python demo/particle_example.py [--steps N] [--episodes N] [--seed N]
        [--render] [--save]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

from dust_tpu.experiments import build_particle_stack, load_config
from dust_tpu.simulation import run_particle_episode
from dust_tpu.utils.helper import create_video_from_plots, save_progress
from dust_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()


def _map_axes(model):
    """Figure + axes with the occupancy map drawn, plus the world->grid
    coordinate transform (mirroring `dust/models/particle.py:227-286`)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots()
    ax.imshow(np.asarray(model.obst_map.map).T, cmap="Oranges",
              origin="lower")
    to_map = lambda xy: np.asarray(model.to_map_coord(xy))
    ax.scatter(*to_map(model.init_state[:2]), marker="o", color="r", s=200)
    ax.scatter(*to_map(model.target[:2]), marker="*", color="r", s=200)
    return fig, ax, to_map


def render_episode(model, trajectory, out_dir):
    """Whole-trajectory overlay on the obstacle map (host-side
    matplotlib)."""
    import matplotlib.pyplot as plt

    fig, ax, to_map = _map_axes(model)
    traj_m = to_map(trajectory[:, :2])
    ax.plot(traj_m[:, 0], traj_m[:, 1], "b.-", linewidth=1, markersize=2)
    out = Path(out_dir) / "trajectory.png"
    out.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out)
    plt.close(fig)
    return out


def render_frames(model, trajectory, out_dir, fps=20):
    """Per-step PNG frames + MP4, matching the reference's per-step
    render loop and moviepy assembly
    (`/root/reference/demo/particle_example.py:229-233,254`,
    `/root/reference/dust/utils/helper.py:78-87`). One persistent figure;
    only the trajectory artists update between frames."""
    import matplotlib.pyplot as plt

    out_dir = Path(out_dir)
    plot_dir = out_dir / "plots"
    plot_dir.mkdir(parents=True, exist_ok=True)
    fig, ax, to_map = _map_axes(model)
    traj_m = to_map(trajectory[:, :2])
    (line,) = ax.plot([], [], "b.-", linewidth=1, markersize=2)
    (head,) = ax.plot([], [], "bo", markersize=6)
    for t in range(len(traj_m)):
        line.set_data(traj_m[: t + 1, 0], traj_m[: t + 1, 1])
        head.set_data(traj_m[t : t + 1, 0], traj_m[t : t + 1, 1])
        fig.savefig(plot_dir / f"frame_{t:04d}.png")
    plt.close(fig)
    video = create_video_from_plots(out_dir, plot_dir, fps=fps)
    return plot_dir, video


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default=None)
    parser.add_argument("--tuned", action="store_true",
                        help="use particle_config_tuned.yaml (the "
                        "megakernel-ASHA config that reaches the "
                        "strict success test; see "
                        "demo/particle_tuning.py --sweep)")
    parser.add_argument("--steps", type=int, default=None)
    parser.add_argument("--episodes", type=int, default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--render", action="store_true")
    parser.add_argument("--save", action="store_true")
    args = parser.parse_args()

    default_cfg = ("particle_config_tuned.yaml" if args.tuned
                   else "particle_config.yaml")
    config_path = args.config or Path(__file__).parent / default_cfg
    config_data = load_config(config_path)
    sim = config_data["sim_params"]
    steps = args.steps or sim["steps"]
    episodes = args.episodes or sim["episodes"]

    key = jax.random.key(args.seed)
    for ep in range(episodes):
        key, k_build, k_run = jax.random.split(key, 3)
        stack = build_particle_stack(config_data, k_build)
        svstate = (
            stack.svmpc.init_state(stack.init_policies, stack.policies_prior)
            if stack.use_svmpc else None
        )
        mstate = (
            stack.mpf.init_state(
                stack.mpf_init, stack.init_state, stack.controller.dim_a,
                bw=stack.mpf_init_bw,
            )
            if stack.mpf is not None else None
        )
        result = run_particle_episode(
            k_run,
            model=stack.model,
            controller=stack.controller,
            svmpc=stack.svmpc,
            svstate=svstate,
            mpf=stack.mpf,
            mstate=mstate,
            dyn_dist=stack.dynamics_prior,
            init_state=stack.init_state,
            load=stack.load,
            steps=steps,
            warm_up=sim["warm_up"],
            mpf_bw=stack.mpf_bw,
            mpf_steps=stack.mpf_steps,
            use_svmpc=stack.use_svmpc,
        )
        print(
            f"episode {ep}: steps={result['steps']} "
            f"crashed={result['crashed']} success={result['success']} "
            f"cum_cost={result['cum_cost']:.1f} "
            f"final_state={np.round(result['final_state'], 2)}"
        )
        if stack.mpf is not None and len(result["dyn_particles"]):
            est = result["dyn_particles"][-1]
            if config_data["exp_params"]["mpf_log_space"]:
                est = np.exp(est)
            print(f"  MPF mass estimate: {est.mean():.3f}")

        if args.save or args.render:
            out = save_progress(
                data={k: v for k, v in result.items()
                      if k not in ("crashed", "success")},
                params=config_data,
            )
            if args.render:
                png = render_episode(stack.model, result["trajectory"], out)
                print(f"  rendered {png}")
                frames, video = render_frames(
                    stack.model, result["trajectory"], out)
                n_frames = len(list(frames.glob("frame_*.png")))
                print(f"  rendered {n_frames} frames -> {video}")


if __name__ == "__main__":
    main()
