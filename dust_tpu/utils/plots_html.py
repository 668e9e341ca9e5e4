"""Interactive HTML chart export — zero-dependency altair stand-in.

The reference renders interactive altair charts (tooltips, legend
selection, interval zoom — `dust/utils/plots.py:71-163`); this image
has no altair/plotly, so these exporters emit SELF-CONTAINED HTML
(inline SVG + ~100 lines of vanilla JS, no network, no dependencies)
with the same interactions:

* hover tooltip on the nearest point (series, x, y),
* click a legend entry to toggle its series,
* drag an interval on the plot to zoom x (double-click resets).

Functions mirror `utils/plots.py` (same DataFrame schema):

* `html_mean_results(df, value=..., save_path=...)`
* `html_stein_particles(df, save_path=...)`
* `html_part2d_cost(costs_list, save_path=...)`
* `html_part2d_traj(model, trajectories, save_path=...)`

Each returns the HTML string and optionally writes it to `save_path`.
"""

from __future__ import annotations

import json
import math

import numpy as np

_PALETTE = ["#4c78a8", "#f58518", "#54a24b", "#e45756", "#72b7b2",
            "#b279a2", "#9d755d", "#eeca3b"]

_TEMPLATE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{title}</title>
<style>
 body {{ font: 13px sans-serif; margin: 16px; }}
 .tip {{ position: absolute; pointer-events: none; background: #222;
        color: #fff; padding: 4px 7px; border-radius: 3px;
        font-size: 12px; display: none; white-space: pre; }}
 .legend span {{ cursor: pointer; margin-right: 14px;
                user-select: none; }}
 .legend .off {{ opacity: 0.3; text-decoration: line-through; }}
 svg {{ background: #fff; }}
</style></head>
<body>
<h3>{title}</h3>
<div class="legend" id="legend"></div>
<svg id="chart" width="{w}" height="{h}"></svg>
<div class="tip" id="tip"></div>
<script>
const DATA = {data};
const W = {w}, H = {h}, M = {{l: 55, r: 15, t: 10, b: 38}};
const svg = document.getElementById("chart");
const tip = document.getElementById("tip");
const NS = "http://www.w3.org/2000/svg";
let xdom = null;           // [lo, hi] zoom window (null = full)
const hidden = new Set();

function extent(vals) {{
  let lo = Infinity, hi = -Infinity;
  for (const v of vals) {{ if (v < lo) lo = v; if (v > hi) hi = v; }}
  if (lo === hi) {{ lo -= 1; hi += 1; }}
  return [lo, hi];
}}
function visible() {{
  return DATA.series.filter(s => !hidden.has(s.name));
}}
function draw() {{
  while (svg.firstChild) svg.removeChild(svg.firstChild);
  const vis = visible();
  const xs = [], ys = [];
  for (const s of vis) for (let i = 0; i < s.x.length; i++) {{
    if (xdom && (s.x[i] < xdom[0] || s.x[i] > xdom[1])) continue;
    xs.push(s.x[i]); ys.push(s.y[i]);
    if (s.lo) {{ ys.push(s.lo[i]); ys.push(s.hi[i]); }}
  }}
  if (!xs.length) return;
  const xe = xdom || extent(xs), ye = extent(ys);
  const sx = v => M.l + (v - xe[0]) / (xe[1] - xe[0]) * (W - M.l - M.r);
  const sy = v => H - M.b - (v - ye[0]) / (ye[1] - ye[0]) * (H - M.t - M.b);
  // background image (occupancy grid), if any
  if (DATA.image) {{
    const im = document.createElementNS(NS, "image");
    im.setAttribute("href", DATA.image.href);
    im.setAttribute("x", sx(DATA.image.x0));
    im.setAttribute("y", sy(DATA.image.y1));
    im.setAttribute("width", sx(DATA.image.x1) - sx(DATA.image.x0));
    im.setAttribute("height", sy(DATA.image.y0) - sy(DATA.image.y1));
    im.setAttribute("preserveAspectRatio", "none");
    im.style.imageRendering = "pixelated";
    svg.appendChild(im);
  }}
  // axes
  for (const [p1, p2] of [[[M.l, H - M.b], [W - M.r, H - M.b]],
                          [[M.l, M.t], [M.l, H - M.b]]]) {{
    const ln = document.createElementNS(NS, "line");
    ln.setAttribute("x1", p1[0]); ln.setAttribute("y1", p1[1]);
    ln.setAttribute("x2", p2[0]); ln.setAttribute("y2", p2[1]);
    ln.setAttribute("stroke", "#888");
    svg.appendChild(ln);
  }}
  for (let i = 0; i <= 5; i++) {{
    const xv = xe[0] + (xe[1] - xe[0]) * i / 5;
    const yv = ye[0] + (ye[1] - ye[0]) * i / 5;
    const tx = document.createElementNS(NS, "text");
    tx.setAttribute("x", sx(xv)); tx.setAttribute("y", H - M.b + 16);
    tx.setAttribute("text-anchor", "middle");
    tx.textContent = xv.toPrecision(4);
    svg.appendChild(tx);
    const ty = document.createElementNS(NS, "text");
    ty.setAttribute("x", M.l - 6); ty.setAttribute("y", sy(yv) + 4);
    ty.setAttribute("text-anchor", "end");
    ty.textContent = yv.toPrecision(4);
    svg.appendChild(ty);
  }}
  const lbx = document.createElementNS(NS, "text");
  lbx.setAttribute("x", (M.l + W - M.r) / 2);
  lbx.setAttribute("y", H - 4);
  lbx.setAttribute("text-anchor", "middle");
  lbx.textContent = DATA.xlabel;
  svg.appendChild(lbx);
  // series
  for (const s of vis) {{
    if (s.band && s.lo) {{
      let dp = "";
      for (let i = 0; i < s.x.length; i++)
        dp += (i ? "L" : "M") + sx(s.x[i]) + "," + sy(s.lo[i]);
      for (let i = s.x.length - 1; i >= 0; i--)
        dp += "L" + sx(s.x[i]) + "," + sy(s.hi[i]);
      const path = document.createElementNS(NS, "path");
      path.setAttribute("d", dp + "Z");
      path.setAttribute("fill", s.color); path.setAttribute("opacity", 0.15);
      svg.appendChild(path);
    }}
    if (s.kind === "line") {{
      let d = "";
      for (let i = 0; i < s.x.length; i++)
        d += (i ? "L" : "M") + sx(s.x[i]) + "," + sy(s.y[i]);
      const path = document.createElementNS(NS, "path");
      path.setAttribute("d", d);
      path.setAttribute("fill", "none");
      path.setAttribute("stroke", s.color);
      path.setAttribute("stroke-width", s.width || 1.5);
      if (s.opacity) path.setAttribute("opacity", s.opacity);
      svg.appendChild(path);
    }} else {{
      for (let i = 0; i < s.x.length; i++) {{
        const c = document.createElementNS(NS, "circle");
        c.setAttribute("cx", sx(s.x[i])); c.setAttribute("cy", sy(s.y[i]));
        c.setAttribute("r", 3.5);
        c.setAttribute("fill", s.colors ? s.colors[i] : s.color);
        svg.appendChild(c);
      }}
    }}
  }}
  svg._scales = {{sx, sy, xe, ye}};
}}
// legend
const leg = document.getElementById("legend");
for (const s of DATA.series) {{
  if (s.nolegend) continue;
  const el = document.createElement("span");
  el.innerHTML = "&#9632; " + s.name;
  el.style.color = s.color;
  el.onclick = () => {{
    hidden.has(s.name) ? hidden.delete(s.name) : hidden.add(s.name);
    el.classList.toggle("off");
    draw();
  }};
  leg.appendChild(el);
}}
// tooltip: nearest visible point
svg.addEventListener("mousemove", ev => {{
  const r = svg.getBoundingClientRect();
  const mx = ev.clientX - r.left, my = ev.clientY - r.top;
  const {{sx, sy}} = svg._scales || {{}};
  if (!sx) return;
  let best = null, bd = 400;
  for (const s of visible()) for (let i = 0; i < s.x.length; i++) {{
    const dx = sx(s.x[i]) - mx, dy = sy(s.y[i]) - my;
    const d = dx * dx + dy * dy;
    if (d < bd) {{ bd = d; best = [s, i]; }}
  }}
  if (best) {{
    const [s, i] = best;
    tip.style.display = "block";
    tip.style.left = (ev.pageX + 12) + "px";
    tip.style.top = (ev.pageY + 12) + "px";
    tip.textContent = s.name + "\\n" + DATA.xlabel + ": "
      + s.x[i].toPrecision(5) + "\\ny: " + s.y[i].toPrecision(5)
      + (s.extra ? "\\n" + s.extra[i] : "");
  }} else tip.style.display = "none";
}});
svg.addEventListener("mouseleave", () => tip.style.display = "none");
// interval x-zoom
let drag = null, band = null;
svg.addEventListener("mousedown", ev => {{
  const r = svg.getBoundingClientRect();
  drag = ev.clientX - r.left;
  band = document.createElementNS(NS, "rect");
  band.setAttribute("y", M.t); band.setAttribute("height", H - M.t - M.b);
  band.setAttribute("fill", "#4c78a8"); band.setAttribute("opacity", 0.2);
  svg.appendChild(band);
}});
svg.addEventListener("mousemove", ev => {{
  if (drag === null || !band) return;
  const r = svg.getBoundingClientRect();
  const x = ev.clientX - r.left;
  band.setAttribute("x", Math.min(drag, x));
  band.setAttribute("width", Math.abs(x - drag));
}});
svg.addEventListener("mouseup", ev => {{
  const r = svg.getBoundingClientRect();
  const x = ev.clientX - r.left;
  const {{sx, xe}} = svg._scales;
  if (Math.abs(x - drag) > 8) {{
    const inv = px => xe[0] + (px - M.l) / (W - M.l - M.r) * (xe[1] - xe[0]);
    xdom = [inv(Math.min(drag, x)), inv(Math.max(drag, x))];
  }}
  drag = null; draw();
}});
svg.addEventListener("dblclick", () => {{ xdom = null; draw(); }});
draw();
</script></body></html>
"""


def _render(title, series, xlabel="x", w=760, h=430, image=None,
            save_path=None):
    data = {"series": series, "xlabel": xlabel, "image": image}
    html = _TEMPLATE.format(title=title, w=w, h=h,
                            data=json.dumps(data))
    if save_path is not None:
        with open(save_path, "w") as f:
            f.write(html)
    return html


def _f(arr):
    return [float(v) for v in np.asarray(arr, dtype=float)]


def html_mean_results(df, value="AvgCumCost", save_path=None):
    """Interactive per-case mean cost over time with std bands
    (`dust/utils/plots.py:71-163` altair semantics: tooltip + legend
    selection + interval zoom)."""
    series = []
    groups = df.groupby("Case") if "Case" in df else [("run", df)]
    for i, (case, group) in enumerate(groups):
        stats = group.groupby("Timestep")[value].agg(["mean", "std"])
        std = stats["std"].fillna(0.0)
        series.append({
            "name": str(case), "kind": "line",
            "color": _PALETTE[i % len(_PALETTE)], "band": True,
            "x": _f(stats.index), "y": _f(stats["mean"]),
            "lo": _f(stats["mean"] - std), "hi": _f(stats["mean"] + std),
        })
    return _render(f"Mean {value} per case", series, xlabel="Timestep",
                   save_path=save_path)


def _weight_color(w):
    # viridis-ish 3-stop ramp
    w = float(min(max(w, 0.0), 1.0))
    stops = [(68, 1, 84), (33, 145, 140), (253, 231, 37)]
    seg, frac = (0, w * 2) if w < 0.5 else (1, (w - 0.5) * 2)
    a, b = stops[seg], stops[seg + 1]
    rgb = [round(a[i] + (b[i] - a[i]) * frac) for i in range(3)]
    return f"rgb({rgb[0]},{rgb[1]},{rgb[2]})"


def html_stein_particles(df, timesteps=None, save_path=None):
    """Interactive policy-particle scatter colored by posterior weight
    (`dust/utils/plots.py:166-212`); tooltip shows the weight."""
    rows = df if timesteps is None else df[df["Timestep"].isin(timesteps)]
    xs, ys, colors, extra = [], [], [], []
    for _, row in rows.iterrows():
        particles = np.asarray(row["PolParticles"], dtype=float).ravel()
        weights = np.asarray(row["Weights"], dtype=float).ravel()
        for p, w in zip(particles, weights):
            xs.append(float(row["Timestep"]))
            ys.append(float(p))
            colors.append(_weight_color(w))
            extra.append(f"weight: {w:.3f}")
    series = [{"name": "particles", "kind": "scatter", "color": "#444",
               "x": xs, "y": ys, "colors": colors, "extra": extra}]
    return _render("Stein policy particles (color = posterior weight)",
                   series, xlabel="Timestep", save_path=save_path)


def html_part2d_cost(costs_list, labels=None, save_path=None):
    """Interactive cost curves with std bands
    (`dust/utils/plots.py:215-260`)."""
    arr = np.asarray(costs_list, dtype=float)
    if arr.ndim == 1:
        arr = arr[None]
    t = _f(np.arange(arr.shape[1]))
    mean = np.nanmean(arr, axis=0)
    std = np.nanstd(arr, axis=0)
    name = labels if isinstance(labels, str) else "cost"
    series = [{"name": name, "kind": "line", "color": _PALETTE[0],
               "band": True, "x": t, "y": _f(mean),
               "lo": _f(mean - std), "hi": _f(mean + std)}]
    return _render("Instantaneous cost", series, xlabel="step",
                   save_path=save_path)


def html_part2d_traj(model, trajectories, save_path=None, rollouts=None):
    """Interactive trajectory overlays on the occupancy map
    (`dust/utils/plots.py:263-314`): obstacle grid as an inline-PNG
    background, per-step tooltips on the paths."""
    import base64
    import io
    import zlib
    import struct

    image = None
    if model.with_obstacle:
        grid = (np.asarray(model.obst_map.map).T > 0).astype(np.uint8)
        hgt, wid = grid.shape
        # minimal PNG writer (grayscale): obstacle=dark, free=white
        px = np.where(grid > 0, 120, 255).astype(np.uint8)
        raw = b"".join(b"\x00" + px[hgt - 1 - r].tobytes()
                       for r in range(hgt))

        def chunk(tag, payload):
            return (struct.pack(">I", len(payload)) + tag + payload
                    + struct.pack(">I", zlib.crc32(tag + payload)))

        png = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", struct.pack(">IIBBBBB", wid, hgt, 8, 0,
                                            0, 0, 0))
               + chunk(b"IDAT", zlib.compress(raw))
               + chunk(b"IEND", b""))
        href = "data:image/png;base64," + base64.b64encode(png).decode()
        image = {"href": href, "x0": 0.0, "y0": 0.0,
                 "x1": float(wid), "y1": float(hgt)}

    to_map = lambda xy: np.asarray(model.to_map_coord(np.asarray(xy)))
    series = []
    for i, traj in enumerate(trajectories):
        m = np.stack([to_map(p[:2]) for p in np.asarray(traj)])
        series.append({
            "name": f"trajectory {i}", "kind": "line",
            "color": _PALETTE[i % len(_PALETTE)],
            "x": _f(m[:, 0]), "y": _f(m[:, 1]),
        })
    if rollouts is not None:
        for j, ro in enumerate(np.asarray(rollouts)):
            m = np.stack([to_map(p[:2]) for p in ro])
            series.append({
                "name": f"rollout {j}", "kind": "line", "opacity": 0.3,
                "width": 0.8, "color": "#999", "nolegend": True,
                "x": _f(m[:, 0]), "y": _f(m[:, 1]),
            })
    start = to_map(np.asarray(model.init_state)[:2]) \
        if model.init_state is not None else None
    if start is not None:
        series.append({"name": "start", "kind": "scatter",
                       "color": "#d62728", "x": [float(start[0])],
                       "y": [float(start[1])]})
    tgt = to_map(np.asarray(model.target)[:2])
    series.append({"name": "goal", "kind": "scatter", "color": "#2ca02c",
                   "x": [float(tgt[0])], "y": [float(tgt[1])]})
    return _render("Trajectories on the occupancy map", series,
                   xlabel="map x", w=620, h=620, image=image,
                   save_path=save_path)


# --------------------------------------------------------------- vega
# Altair-COMPATIBLE output: the reference's chart is an altair (= vega-
# lite) layered spec (`dust/utils/plots.py:71-163`). The hand-rolled
# HTML above replicates its interactions offline; these emit the
# PORTABLE artifact — a genuine vega-lite v5 JSON spec with the same
# layers (basis-interpolated mean line, invisible nearest-x hover
# selectors, highlighted points, gray rule, value labels, category10
# colors, 1000x400, bound-scales zoom) — loadable by altair
# (`alt.Chart.from_json`), vega-embed, or any vega tooling.

def vega_lite_mean_results(df, value="AvgCumCost", title=None,
                           x_key="Timestep", x_label="Timestep",
                           y_label=None, color_key="Case",
                           save_path=None):
    """Vega-lite v5 spec mirroring `plot_mean_results`
    (`dust/utils/plots.py:82-160`): layer = line + selectors + points
    + rules + text, nearest-point hover param, mean aggregation in the
    encoding (the reference aggregates in-spec, not in pandas).
    Returns the spec dict; `save_path` writes JSON (the reference
    writes `<value>_plot.html`; pair with `vega_embed_html` for
    that)."""
    source = df.copy()
    if "AvgCumCost" in source and "Timestep" in source:
        # reference derivation, `dust/utils/plots.py:83`
        source["CumCost"] = source["AvgCumCost"] * (source["Timestep"]
                                                   + 1)
    columns = [c for c in (color_key, value, x_key) if c in source]
    records = source[columns].to_dict("records")

    def _cell(k, v):
        if k == color_key:
            return str(v)
        if isinstance(v, (int, float, np.number)):
            v = float(v)
            # json.dump would emit bare NaN/Infinity tokens — invalid
            # JSON that vega-embed / altair from_json reject; vega-lite
            # treats null as missing, which is the right semantic
            return v if math.isfinite(v) else None
        return v

    records = [{k: _cell(k, v) for k, v in r.items()} for r in records]

    x_enc = {"field": x_key, "type": "quantitative", "title": x_label}
    y_enc = {"field": value, "aggregate": "mean",
             "type": "quantitative", "title": y_label or value}
    color_enc = {"field": color_key, "type": "nominal",
                 "scale": {"scheme": "category10"}}
    line_enc = {"x": x_enc, "y": y_enc, "color": color_enc}
    nearest = {
        "name": "nearest",
        "select": {"type": "point", "nearest": True, "on": "mouseover",
                   "fields": [x_key], "clear": "mouseout"},
    }
    spec = {
        "$schema": "https://vega.github.io/schema/vega-lite/v5.json",
        "title": title or f"Mean {value} per case",
        "width": 1000,
        "height": 400,
        "data": {"values": records},
        "layer": [
            {
                "mark": {"type": "line", "interpolate": "basis",
                         "clip": True},
                "encoding": line_enc,
                "params": [{"name": "grid", "select": "interval",
                            "bind": "scales"}],  # .interactive()
            },
            {
                "mark": "point",
                "encoding": {"x": x_enc, "opacity": {"value": 0}},
                "params": [nearest],
            },
            {
                "mark": "point",
                "encoding": {
                    **line_enc,
                    "opacity": {
                        "condition": {"param": "nearest",
                                      "empty": False, "value": 1},
                        "value": 0,
                    },
                },
            },
            {
                "mark": {"type": "rule", "color": "gray"},
                "encoding": {"x": x_enc},
                "transform": [{"filter": {"param": "nearest",
                                          "empty": False}}],
            },
            {
                "mark": {"type": "text", "align": "left", "dx": 5,
                         "dy": -5},
                "encoding": {
                    **line_enc,
                    "text": {
                        "condition": {"param": "nearest",
                                      "empty": False, "field": value,
                                      "aggregate": "mean",
                                      "type": "quantitative"},
                        "value": " ",
                    },
                },
            },
        ],
    }
    if save_path is not None:
        with open(save_path, "w") as f:
            json.dump(spec, f, indent=1)
    return spec


def vega_embed_html(spec, save_path=None):
    """Wrap a vega-lite spec in the standard vega-embed HTML page (the
    format `chart.save(*.html)` produces in the reference). NOTE: the
    scripts load from the jsdelivr CDN, so RENDERING needs network —
    in an offline environment use the self-contained exporters above;
    the spec JSON itself is offline-portable."""
    page = (
        "<!DOCTYPE html>\n<html><head><meta charset=\"utf-8\">\n"
        "<script src=\"https://cdn.jsdelivr.net/npm/vega@5\"></script>\n"
        "<script src=\"https://cdn.jsdelivr.net/npm/vega-lite@5\">"
        "</script>\n"
        "<script src=\"https://cdn.jsdelivr.net/npm/vega-embed@6\">"
        "</script>\n</head><body>\n<div id=\"vis\"></div>\n<script>\n"
        f"vegaEmbed('#vis', {json.dumps(spec)});\n"
        "</script>\n</body></html>\n"
    )
    if save_path is not None:
        with open(save_path, "w") as f:
            f.write(page)
    return page
