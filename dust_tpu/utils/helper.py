"""Persistence and checkpoint helpers.

Upgrades the reference's save-only persistence (`dust/utils/helper.py:12-75`
— dill session dumps + torch pickles with **no load path**) to pytree
checkpoints with deterministic save/restore: the full dual-loop carry
(policy particles, controller plan, MPF particles, priors, PRNG key, step
counter) round-trips through one file.
"""

from __future__ import annotations

import pickle
import time
from pathlib import Path

import jax
import numpy as np
import yaml


def get_project_root():
    return Path(__file__).parent.parent.parent


def save_progress(folder_name=None, data=None, params=None, fig=None,
                  fig_name="plot.pdf", root=None):
    """Timestamped results folder with optional data pickle / config yaml /
    figure, mirroring the reference layout `data/local/<ts>/`
    (`dust/utils/helper.py:12-75`)."""
    if folder_name is None:
        folder_name = time.strftime("%Y%m%d-%H%M%S")
    root_path = Path(root) if root is not None else get_project_root()
    folder_path = root_path / "data" / "local" / str(folder_name)
    folder_path.mkdir(parents=True, exist_ok=True)
    if fig is not None:
        plot_path = folder_path / "plots"
        plot_path.mkdir(exist_ok=True)
        fig.savefig(plot_path / fig_name)
    if data is not None:
        with (folder_path / "data.pkl").open("wb") as fh:
            pickle.dump(to_numpy_tree(data), fh)
    if params is not None:
        with (folder_path / "config.yaml").open("w") as fh:
            yaml.dump(params, fh)
    return folder_path


def to_numpy_tree(tree):
    """Device pytree -> numpy pytree (host transfer once, for pickling)."""
    return jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "shape") else x, tree
    )


def _encode_leaf(leaf):
    """Numpy-encode one pytree leaf; typed PRNG keys round-trip via their
    raw key data."""
    import jax.numpy as jnp

    if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jax.dtypes.prng_key):
        return ("prng", np.asarray(jax.random.key_data(leaf)))
    return ("array", np.asarray(leaf))


def _decode_leaf(tagged):
    import jax.numpy as jnp

    tag, data = tagged
    if tag == "prng":
        return jax.random.wrap_key_data(jnp.asarray(data))
    return jnp.asarray(data)


def save_checkpoint(path, carry, step=None, extra=None):
    """Checkpoint an episode carry pytree (+ metadata) for deterministic
    resume — the load path the reference lacks (SURVEY.md §5.4)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    leaves, treedef = jax.tree_util.tree_flatten(carry)
    payload = {
        "leaves": [_encode_leaf(leaf) for leaf in leaves],
        "treedef": treedef,
        "step": step,
        "extra": extra,
    }
    with path.open("wb") as fh:
        pickle.dump(payload, fh)
    return path


def load_checkpoint(path):
    """Returns (carry, step, extra). The carry comes back as the original
    pytree structure with jnp leaves."""
    with Path(path).open("rb") as fh:
        payload = pickle.load(fh)
    leaves = [_decode_leaf(t) for t in payload["leaves"]]
    carry = jax.tree_util.tree_unflatten(payload["treedef"], leaves)
    return carry, payload["step"], payload["extra"]


def create_video_from_plots(save_path, plot_path=None, fps=20):
    """Stitch per-step PNGs into an MP4 (`dust/utils/helper.py:78-87`).

    Prefers moviepy (the reference's encoder) when available; otherwise
    falls back to OpenCV's VideoWriter, which is in the base image — the
    reference hard-depends on moviepy and simply aborts without it."""
    save_path = Path(save_path)
    if plot_path is None:
        plot_path = save_path / "plots"
    out = save_path / "video.mp4"
    try:
        import moviepy.editor as mpy

        video = mpy.ImageSequenceClip(str(plot_path), fps=fps)
        video.write_videofile(str(out))
        return out
    except ImportError:
        pass
    try:
        import cv2
    except ImportError:
        print("Neither MoviePy nor OpenCV available. Aborting video "
              "creation.")
        return None
    frames = sorted(Path(plot_path).glob("*.png"))
    if not frames:
        print(f"No PNG frames in {plot_path}. Aborting video creation.")
        return None
    first = cv2.imread(str(frames[0]))
    h, w = first.shape[:2]
    writer = cv2.VideoWriter(
        str(out), cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    if not writer.isOpened():
        print("OpenCV VideoWriter failed to open. Aborting video creation.")
        return None
    for frame in frames:
        img = cv2.imread(str(frame))
        if img.shape[:2] != (h, w):
            img = cv2.resize(img, (w, h))
        writer.write(img)
    writer.release()
    return out


def to_np(x):
    if isinstance(x, list):
        return [np.asarray(v) for v in x]
    return np.asarray(x)


def from_np(x):
    import jax.numpy as jnp

    if isinstance(x, list):
        return [jnp.asarray(v) for v in x]
    return jnp.asarray(x)
