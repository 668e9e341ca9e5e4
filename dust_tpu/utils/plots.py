"""Result plotting — host-side analysis of episode DataFrames.

Functional counterpart of `dust/utils/plots.py:71-391` on matplotlib/
seaborn (the reference's altair interactive charts aren't reproducible in
this image; the same DataFrame schema feeds everything, so the
reference's own notebooks keep working on our pickles). Functions mirror
the reference surface:

* `plot_mean_results`     — mean cost / avg-cum-cost per case over time
* `plot_stein_particles`  — policy-particle scatter with posterior weights
* `plot_part2d_cost`      — particle-task cost curves with std bands
* `plot_part2d_traj`      — trajectory overlays on the occupancy map
* `plot_dist_ridgeplot`   — MPF posterior ridgeline vs the true parameter
"""

from __future__ import annotations

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_mean_results(df, value="AvgCumCost", save_path=None, ax=None):
    """Per-case mean cost over time with a std band
    (`dust/utils/plots.py:71-163`)."""
    plt = _plt()
    ax = ax or plt.figure(figsize=(8, 5)).gca()
    for case, group in df.groupby("Case") if "Case" in df else [("run", df)]:
        stats = group.groupby("Timestep")[value].agg(["mean", "std"])
        ax.plot(stats.index, stats["mean"], label=str(case))
        ax.fill_between(
            stats.index,
            stats["mean"] - stats["std"].fillna(0),
            stats["mean"] + stats["std"].fillna(0),
            alpha=0.2,
        )
    ax.set_xlabel("Timestep")
    ax.set_ylabel(value)
    ax.legend()
    if save_path is not None:
        plt.savefig(save_path, bbox_inches="tight")
        plt.close()
    return ax


def plot_stein_particles(df, timesteps=None, save_path=None):
    """Policy-particle first-action scatter colored by posterior weight
    (`dust/utils/plots.py:166-212`)."""
    plt = _plt()
    rows = df if timesteps is None else df[df["Timestep"].isin(timesteps)]
    fig, ax = plt.subplots(figsize=(8, 5))
    sc = None
    for _, row in rows.iterrows():
        particles = np.asarray(row["PolParticles"], dtype=float)
        weights = np.asarray(row["Weights"], dtype=float)
        t = np.full_like(particles, row["Timestep"])
        sc = ax.scatter(t, particles, c=weights, cmap="viridis", s=25,
                        vmin=0.0, vmax=1.0)
    if sc is not None:
        fig.colorbar(sc, ax=ax, label="posterior weight")
    ax.set_xlabel("Timestep")
    ax.set_ylabel("first action of each particle")
    if save_path is not None:
        fig.savefig(save_path, bbox_inches="tight")
        plt.close(fig)
    return ax


def plot_part2d_cost(costs_list, labels=None, save_path=None):
    """Cost curves with std bands across runs
    (`dust/utils/plots.py:215-260`). costs_list: list of [T] arrays or a
    [N, T] array."""
    plt = _plt()
    arr = np.asarray(costs_list, dtype=float)
    if arr.ndim == 1:
        arr = arr[None]
    fig, ax = plt.subplots(figsize=(8, 5))
    mean = np.nanmean(arr, axis=0)
    std = np.nanstd(arr, axis=0)
    t = np.arange(arr.shape[1])
    label = labels if isinstance(labels, str) else None
    ax.plot(t, mean, label=label)
    ax.fill_between(t, mean - std, mean + std, alpha=0.25)
    ax.set_xlabel("step")
    ax.set_ylabel("instantaneous cost")
    if label:
        ax.legend()
    if save_path is not None:
        fig.savefig(save_path, bbox_inches="tight")
        plt.close(fig)
    return ax


def plot_part2d_traj(model, trajectories, save_path=None, rollouts=None):
    """Trajectory overlays on the occupancy map
    (`dust/utils/plots.py:263-314`). `trajectories`: list of [T, >=2]
    state arrays in world coordinates."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(6, 6))
    if model.with_obstacle:
        ax.imshow(np.asarray(model.obst_map.map).T, cmap="Oranges",
                  origin="lower")
    to_map = lambda xy: np.asarray(model.to_map_coord(np.asarray(xy)))
    if model.init_state is not None:
        ax.scatter(*to_map(model.init_state[:2]), marker="o", c="r", s=150)
    ax.scatter(*to_map(np.asarray(model.target)[:2]), marker="*", c="r",
               s=150)
    for traj in trajectories:
        m = to_map(np.asarray(traj)[:, :2])
        ax.plot(m[:, 0], m[:, 1], linewidth=1)
    if rollouts is not None:
        # rollouts: [batch, T, >=2]
        for ro in np.asarray(rollouts):
            m = to_map(ro[:, :2])
            ax.plot(m[:, 0], m[:, 1], alpha=0.25, linewidth=0.6)
    if save_path is not None:
        fig.savefig(save_path, bbox_inches="tight")
        plt.close(fig)
    return ax


def plot_dist_ridgeplot(dyn_particles, true_value=None, log_space=False,
                        every=10, save_path=None, bw_adjust=1.0):
    """MPF posterior over time as a ridgeline
    (`dust/utils/plots.py:317-391`): one KDE row per sampled step,
    optional true-parameter line. `dyn_particles`: [T, n] (first
    uncertain dim)."""
    plt = _plt()
    import seaborn as sns

    arr = np.asarray(dyn_particles, dtype=float)
    if log_space:
        arr = np.exp(arr)
    steps = list(range(0, arr.shape[0], every))
    fig, axes = plt.subplots(
        len(steps), 1, figsize=(7, 1.0 * len(steps)), sharex=True
    )
    if len(steps) == 1:
        axes = [axes]
    for ax, t in zip(axes, steps):
        sns.kdeplot(x=arr[t].ravel(), ax=ax, fill=True,
                    bw_adjust=bw_adjust)
        ax.set_ylabel(f"t={t}", rotation=0, ha="right")
        ax.set_yticks([])
        if true_value is not None:
            ax.axvline(true_value, ls="--", c="r")
    axes[-1].set_xlabel("parameter value")
    if save_path is not None:
        fig.savefig(save_path, bbox_inches="tight")
        plt.close(fig)
    return axes
