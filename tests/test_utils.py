"""Utility-surface smoke tests: plots, persistence, spaces, model param
sampling."""

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from dust_tpu.distributions import Uniform
from dust_tpu.models import PendulumModel, Particle
from dust_tpu.spaces import Box
from dust_tpu.utils.helper import from_np, save_progress, to_np
from dust_tpu.utils import plots
from tests.test_models import PARTICLE_ENV


def _fake_epoch_df(steps=12, episodes=2):
    rows = []
    rng = np.random.default_rng(0)
    for i in range(episodes):
        df = pd.DataFrame({
            "Cost": rng.uniform(0, 100, steps),
            "Timestep": np.arange(steps),
            "Iteration": i,
            "PolParticles": [list(rng.normal(size=3)) for _ in range(steps)],
            "Weights": [list(np.abs(rng.normal(size=3))) for _ in range(steps)],
            "Case": "DuSt-MPC" if i == 0 else "SVMPC",
        })
        df["AvgCumCost"] = df["Cost"].cumsum() / (df["Timestep"] + 1)
        rows.append(df)
    return pd.concat(rows)


def test_plot_surface_writes_files(tmp_path):
    df = _fake_epoch_df()
    plots.plot_mean_results(df, save_path=tmp_path / "mean.png")
    plots.plot_stein_particles(df[df["Iteration"] == 0],
                               save_path=tmp_path / "stein.png")
    plots.plot_part2d_cost(np.random.default_rng(1).uniform(0, 5, (3, 20)),
                           save_path=tmp_path / "cost.png")
    rng = np.random.default_rng(2)
    dyn = rng.normal(2.0, 0.2, size=(40, 50))
    plots.plot_dist_ridgeplot(dyn, true_value=2.0, every=10,
                              save_path=tmp_path / "ridge.png")

    model = Particle(uncertain_params=["mass"], **PARTICLE_ENV)
    traj = np.linspace([-9, -9], [5, 5], 30)
    plots.plot_part2d_traj(model, [np.c_[traj, np.zeros((30, 2))]],
                           save_path=tmp_path / "traj.png")
    for name in ["mean", "stein", "cost", "ridge", "traj"]:
        assert (tmp_path / f"{name}.png").stat().st_size > 0


def test_interactive_html_charts(tmp_path):
    """The zero-dependency HTML exporters (altair stand-in) produce
    self-contained documents: inline data, tooltip/legend/zoom JS, and
    for the map chart a valid inline-PNG occupancy background."""
    import base64
    import re

    from dust_tpu.utils import plots_html

    df = _fake_epoch_df()
    html = plots_html.html_mean_results(df, save_path=tmp_path / "m.html")
    assert "<svg" in html and "DATA" in html
    for feature in ("tip", "legend", "dblclick", "mousedown"):
        assert feature in html  # tooltip + legend toggle + zoom wiring
    assert "DuSt-MPC" in html and "SVMPC" in html
    assert (tmp_path / "m.html").stat().st_size > 1000

    html2 = plots_html.html_stein_particles(df[df["Iteration"] == 0])
    assert "weight:" in html2 and "rgb(" in html2

    html3 = plots_html.html_part2d_cost(
        np.random.default_rng(1).uniform(0, 5, (3, 20))
    )
    assert '"band": true' in html3

    model = Particle(uncertain_params=["mass"], **PARTICLE_ENV)
    traj = np.linspace([-9, -9], [5, 5], 30)
    html4 = plots_html.html_part2d_traj(
        model, [np.c_[traj, np.zeros((30, 2))]],
        save_path=tmp_path / "t.html",
    )
    m = re.search(r'data:image/png;base64,([A-Za-z0-9+/=]+)', html4)
    assert m, "occupancy background missing"
    png = base64.b64decode(m.group(1))
    assert png[:8] == b"\x89PNG\r\n\x1a\n" and b"IEND" in png
    assert "trajectory 0" in html4 and "goal" in html4


def test_save_progress_layout(tmp_path):
    path = save_progress(folder_name="t1", data={"a": jnp.arange(3)},
                         params={"k": 1}, root=tmp_path)
    assert (path / "data.pkl").exists()
    assert (path / "config.yaml").exists()


def test_np_roundtrip():
    x = jnp.arange(6.0).reshape(2, 3)
    back = from_np(to_np(x))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_box_clip():
    box = Box(dim=2, low=-1.0, high=[1.0, 2.0])
    out = box.clip(jnp.array([[-5.0, 5.0], [0.5, 0.5]]))
    np.testing.assert_allclose(np.asarray(out), [[-1.0, 2.0], [0.5, 0.5]])


def test_model_sample_params_bounds():
    model = PendulumModel(uncertain_params=("length", "mass"))
    dist = Uniform(jnp.array([0.0, 0.0]), jnp.array([2.0, 2.0]),
                   event_ndims=1)
    params = model.sample_params(jax.random.key(0), dist, 64,
                                 x_min=0.5, x_max=1.5)
    assert set(params) == {"length", "mass"}
    for v in params.values():
        arr = np.asarray(v)
        assert arr.shape == (64, 1)
        # masked resampling keeps nearly all draws in bounds
        assert ((arr > 0.5) & (arr < 1.5)).mean() > 0.95


def test_real_harness_dataframe_feeds_plots(tmp_path):
    """End-to-end analysis workflow: a real episode DataFrame (reference
    schema) drives the plot surface, including the MPF ridgeline from
    DynParticles."""
    import jax

    from dust_tpu.experiments import build_pendulum_stack, load_config
    from dust_tpu.simulation import PendulumSimulation

    cfg = load_config("demo/pendulum_config.yaml")
    cfg["exp_params"].update(horizon=8, action_samples=8, params_samples=2,
                             mpf_n_particles=8, mpf_steps=2, n_particles=2)
    stack = build_pendulum_stack(cfg, jax.random.key(0), case="dust")
    harness = PendulumSimulation(
        controller=stack.controller, svmpc=stack.svmpc, mpf=stack.mpf,
        model=stack.model, steps=10, warm_up=1,
        mpf_bw=stack.mpf_bw, mpf_steps=2,
    )
    df = harness.run(
        jax.random.key(1), [{"length": 1.0, "mass": 1.0}],
        init_state=stack.init_state, init_policies=stack.init_policies,
        policies_prior=stack.policies_prior, dyn_dist=stack.dynamics_prior,
        mpf_init=stack.mpf_init,
    )
    df["Case"] = "DuSt-MPC"
    plots.plot_mean_results(df, save_path=tmp_path / "m.png")
    plots.plot_stein_particles(df, save_path=tmp_path / "s.png")
    dyn = np.stack(df["DynParticles"].to_list())[..., 0]  # [T, n]
    plots.plot_dist_ridgeplot(dyn, true_value=1.0, every=5,
                              save_path=tmp_path / "r.png")
    for f in ("m", "s", "r"):
        assert (tmp_path / f"{f}.png").stat().st_size > 0


def test_vega_lite_spec_matches_reference_chart(tmp_path):
    """`vega_lite_mean_results` emits a genuine vega-lite v5 layered
    spec with the reference chart's structure
    (`dust/utils/plots.py:82-160`): basis mean line + invisible
    nearest-x selectors + conditional points + gray rule + value
    labels, category10 colors, 1000x400, bound-scales zoom — and the
    reference's in-pandas CumCost derivation. `vega_embed_html` wraps
    it in the standard vega-embed page."""
    import json

    from dust_tpu.utils import plots_html

    df = _fake_epoch_df()
    spec = plots_html.vega_lite_mean_results(
        df, save_path=tmp_path / "avgcumcost_plot.json")
    assert spec["$schema"].endswith("vega-lite/v5.json")
    assert spec["width"] == 1000 and spec["height"] == 400
    marks = [layer["mark"] for layer in spec["layer"]]
    assert marks[0] == {"type": "line", "interpolate": "basis",
                       "clip": True}
    assert marks[3] == {"type": "rule", "color": "gray"}
    assert marks[4]["type"] == "text"
    line = spec["layer"][0]["encoding"]
    assert line["y"]["aggregate"] == "mean"
    assert line["color"]["scale"]["scheme"] == "category10"
    sel = spec["layer"][1]["params"][0]["select"]
    assert sel["nearest"] and sel["on"] == "mouseover" and \
        sel["fields"] == ["Timestep"]
    assert spec["layer"][0]["params"][0]["select"] == "interval"
    # data records are plain JSON with the case/value/x columns
    rec = spec["data"]["values"][0]
    assert set(rec) == {"Case", "AvgCumCost", "Timestep"}
    json.dumps(spec)  # fully serializable
    # round-trips through the saved file
    saved = json.loads((tmp_path / "avgcumcost_plot.json").read_text())
    assert saved == json.loads(json.dumps(spec))

    # CumCost derivation (reference `plots.py:83`) available as a value
    spec2 = plots_html.vega_lite_mean_results(df, value="CumCost")
    assert spec2["data"]["values"][0]["CumCost"] == (
        df["AvgCumCost"].iloc[0] * (df["Timestep"].iloc[0] + 1))

    page = plots_html.vega_embed_html(spec,
                                      save_path=tmp_path / "m.html")
    assert "vegaEmbed" in page and "vega-lite@5" in page
    assert (tmp_path / "m.html").read_text() == page
