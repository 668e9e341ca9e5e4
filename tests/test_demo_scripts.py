"""Demo entry points run end to end as subprocesses (tiny workloads):
the argparse surface, config loading and output paths all execute."""

import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def _run(args, timeout=420):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # CPU-only subprocess
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable, *args], cwd=ROOT, env=env, timeout=timeout,
        capture_output=True, text=True,
    )


def test_pendulum_example_runs():
    r = _run(["demo/pendulum_example.py", "--steps", "6", "--cases",
              "svmpc,mppi", "--episodes", "1"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Summary" in r.stdout


def test_particle_example_runs():
    r = _run(["demo/particle_example.py", "--steps", "6"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "episode 0" in r.stdout


def test_particle_example_render_frames_and_video(tmp_path):
    """--render emits one PNG per executed step plus the MP4, matching the
    reference's per-step render loop
    (`/root/reference/demo/particle_example.py:229-233,254`)."""
    import re

    r = _run(["demo/particle_example.py", "--steps", "5", "--render"])
    assert r.returncode == 0, r.stderr[-2000:]
    m = re.search(r"rendered (\d+) frames -> (\S+)", r.stdout)
    assert m, r.stdout[-2000:]
    n_steps = int(re.search(r"steps=(\d+)", r.stdout).group(1))
    assert int(m.group(1)) == n_steps
    video = Path(m.group(2))
    assert video.name == "video.mp4" and video.exists()
    assert video.stat().st_size > 0
    frames = sorted(video.parent.glob("plots/frame_*.png"))
    assert len(frames) == n_steps


def test_pendulum_example_render_frames_and_video():
    """--render emits one pendulum frame per step plus the MP4 — the
    headless counterpart of the reference's live gym window
    (`/root/reference/dust/utils/simulations.py:105-106`)."""
    import re

    r = _run(["demo/pendulum_example.py", "--steps", "5", "--cases",
              "svmpc", "--episodes", "1", "--render"])
    assert r.returncode == 0, r.stderr[-2000:]
    m = re.search(r"rendered (\d+) frames -> (\S+)", r.stdout)
    assert m, r.stdout[-2000:]
    assert int(m.group(1)) == 5
    video = Path(m.group(2))
    assert video.name == "video.mp4" and video.exists()
    assert video.stat().st_size > 0
    frames = sorted(video.parent.glob("plots/frame_*.png"))
    assert len(frames) == 5


def test_pendulum_tuning_parallel_lr_runs():
    r = _run(["demo/pendulum_tuning.py", "--parallel-lr", "3",
              "--steps", "5"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "best lr" in r.stdout


def test_pendulum_tuning_asha_runs():
    r = _run(["demo/pendulum_tuning.py", "--asha", "6", "--steps", "9"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "episode-equivalents" in r.stdout
    assert "rung 0" in r.stdout and "rung 2" in r.stdout


def test_sweep_example_runs():
    r = _run(["demo/sweep_example.py", "--task", "pendulum",
              "--scenarios", "8", "--steps", "4"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "swing-up achieved" in r.stdout
    r2 = _run(["demo/sweep_example.py", "--task", "particle",
               "--scenarios", "8", "--steps", "4"])
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "success" in r2.stdout


def test_particle_example_tuned_config_runs():
    """--tuned loads particle_config_tuned.yaml (the megakernel-ASHA
    strict-success config; see demo/particle_tuning.py --sweep)."""
    r = _run(["demo/particle_example.py", "--tuned", "--steps", "4"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "episode 0" in r.stdout


def test_pendulum_example_tuned_config_runs():
    """--tuned loads pendulum_config_tuned.yaml (the r4 worst-corner
    tail ASHA config; see demo/pendulum_tuning.py --tail)."""
    r = _run(["demo/pendulum_example.py", "--tuned", "--steps", "4",
              "--cases", "dust"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "episode 0" in r.stdout
