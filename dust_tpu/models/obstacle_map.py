"""2-D occupancy-grid world for the particle-navigation task.

Map *construction* is host-side numpy (exactly once, before jit) mirroring
`dust/utils/obstacle.py:30-69` + `dust/utils/obstacle_map.py:13-361`:
rectangle rasterization with ceil cell math, border walls on all four map
edges, and the named obstacle presets. The resulting grid is baked into the
jitted program as a constant; `get_collisions` is the collision hot path
called inside every rollout timestep (`dust/utils/obstacle_map.py:64-93`).

TPU note: a per-lane gather `map[xi, yi]` serializes on the TPU and
dominated the whole particle solve (measured: 1543 us with vs 199 us
without obstacles per SVGD step, bench/bench_particle_phases.py). Since
the raster only ever holds {0, 1} (rectangles SET cells to 1.0), the
occupied set is decomposed once on host into K disjoint cell-index
rectangles and `get_collisions` evaluates branchless rectangle membership
— pure vector compares, no gather, bit-identical to the raster lookup.
The gather path is kept for non-binary maps and as a measured fallback.
"""

from __future__ import annotations

import math
import random

import numpy as np
import jax.numpy as jnp


class ObstacleMap:
    """Occupancy grid with center origin. `map` is numpy during
    construction; `device_map` is the jnp constant used inside jit."""

    def __init__(self, map_dim, cell_size):
        if map_dim[0] % 2 or map_dim[1] % 2:
            raise ValueError("Map dimensions must be even.")
        cmap_x = math.ceil(map_dim[0] / cell_size)
        cmap_y = math.ceil(map_dim[1] / cell_size)
        self.map = np.zeros((cmap_x, cmap_y), dtype=np.float32)
        self.cell_size = float(cell_size)
        self.origin_xi = int(cmap_x / 2)
        self.origin_yi = int(cmap_y / 2)
        self.x_dim, self.y_dim = self.map.shape
        x_range = self.cell_size * self.x_dim
        y_range = self.cell_size * self.y_dim
        self.xlim = [-x_range / 2, x_range / 2]
        self.ylim = [-y_range / 2, y_range / 2]
        self._device_map = None
        self._rect_bounds = None

    @property
    def c_offset(self):
        return np.array([self.origin_xi, self.origin_yi], dtype=np.float32)

    def convert_map(self):
        """Materialize the device-side constants. Must be called outside
        any jit trace (a constant created during tracing is a tracer and
        must not be cached across traces)."""
        self._device_map = jnp.asarray(self.map)
        self._rect_bounds = self._compute_rect_bounds()
        return self._device_map

    @property
    def device_map(self):
        if self._device_map is None:
            return jnp.asarray(self.map)  # uncached: safe under tracing
        return self._device_map

    @property
    def rect_bounds(self):
        """(xlo, xhi, ylo, yhi) float32 [K] half-open cell-index bounds of
        the K disjoint occupied rectangles, or None when the raster is not
        binary (rect membership can't reproduce graded occupancy)."""
        if self._rect_bounds is None:
            return self._compute_rect_bounds()  # uncached: safe under trace
        return self._rect_bounds

    def _compute_rect_bounds(self):
        if not np.isin(self.map, (0.0, 1.0)).all():
            return None
        rects = decompose_rects(self.map)
        b = np.asarray(rects, dtype=np.float32).reshape(-1, 4)
        return tuple(jnp.asarray(b[:, i]) for i in range(4))

    def get_xy_grid(self):
        """World-coordinate grid [x_dim, y_dim, 2]
        (`dust/utils/obstacle_map.py:54-62`)."""
        xv, yv = jnp.meshgrid(
            jnp.linspace(self.xlim[0], self.xlim[1], self.x_dim),
            jnp.linspace(self.ylim[0], self.ylim[1], self.y_dim),
            indexing="ij",
        )
        return jnp.stack((xv, yv), axis=2)

    def plot(self, save_dir=None, filename="obst_map.png"):
        """Render the occupancy grid (`dust/utils/obstacle_map.py:46-52`)."""
        import os.path as osp

        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.figure()
        plt.imshow(self.map.T, origin="lower")
        if save_dir is not None:
            plt.savefig(osp.join(save_dir, filename))
        plt.close()

    def get_collisions(self, x, use_gather=False):
        """Occupancy values at world positions x [..., 2]
        (`dust/utils/obstacle_map.py:64-93`): floor to cell indices, clamp
        to bounds, look up occupancy.

        Default path: branchless membership test against the decomposed
        occupied rectangles (vector compares — no TPU gather; exactly
        equal to the raster lookup for binary maps,
        tests/test_models.py::test_collision_rects_match_gather).
        `use_gather=True` (or a non-binary raster) restores the gather."""
        occ = jnp.floor(x * (1.0 / self.cell_size) + self.c_offset)
        bounds = None if use_gather else self.rect_bounds
        if bounds is not None:
            xi = jnp.clip(occ[..., 0], 0.0, self.map.shape[0] - 1.0)
            yi = jnp.clip(occ[..., 1], 0.0, self.map.shape[1] - 1.0)
            xlo, xhi, ylo, yhi = bounds
            inside = (
                (xi[..., None] >= xlo) & (xi[..., None] < xhi)
                & (yi[..., None] >= ylo) & (yi[..., None] < yhi)
            )
            return jnp.any(inside, axis=-1).astype(self.device_map.dtype)
        occ = occ.astype(jnp.int32)
        xi = jnp.clip(occ[..., 0], 0, self.map.shape[0] - 1)
        yi = jnp.clip(occ[..., 1], 0, self.map.shape[1] - 1)
        return self.device_map[xi, yi]


def decompose_rects(grid):
    """Decompose a binary occupancy grid into disjoint half-open
    cell-index rectangles [(xi_lo, xi_hi, yi_lo, yi_hi), ...] whose union
    is exactly the occupied set.

    Row-run merging: occupied runs along the y axis are extended across
    consecutive x rows while their (y_lo, y_hi) extents match. Host-side
    numpy, runs once per map at `convert_map` time.
    """
    grid = np.asarray(grid)
    rects = []
    prev = {}  # (y_lo, y_hi) -> xi where that run started
    for xi in range(grid.shape[0] + 1):
        cur = {}
        if xi < grid.shape[0]:
            row = grid[xi] > 0
            # run boundaries of the occupied mask along y
            edges = np.flatnonzero(np.diff(np.concatenate(
                ([False], row, [False])
            ).astype(np.int8)))
            for y_lo, y_hi in edges.reshape(-1, 2):
                run = (int(y_lo), int(y_hi))
                cur[run] = prev.pop(run, xi)
        for (y_lo, y_hi), x_start in prev.items():
            rects.append((x_start, xi, y_lo, y_hi))
        prev = cur
    return rects


class ObstacleRectangle:
    """Axis-aligned rectangle rasterized with the reference's ceil math
    (`dust/utils/obstacle.py:30-69`, including the int() center snap)."""

    def __init__(self, center_x=0, center_y=0, width=None, height=None):
        self.center_x = int(center_x)
        self.center_y = int(center_y)
        self.width = width
        self.height = height

    def add_to_map(self, obst_map: ObstacleMap):
        cs = obst_map.cell_size
        w = math.ceil(self.width / cs)
        h = math.ceil(self.height / cs)
        c_x = math.ceil(self.center_x / cs)
        c_y = math.ceil(self.center_y / cs)
        x_start = c_x - math.ceil(w / 2.0) + obst_map.origin_xi
        x_end = c_x + math.ceil(w / 2.0) + obst_map.origin_xi
        y_start = c_y - math.ceil(h / 2.0) + obst_map.origin_yi
        y_end = c_y + math.ceil(h / 2.0) + obst_map.origin_yi
        # Raw numpy slicing on purpose: negative starts wrap, start > end is
        # empty — the reference relies on these semantics for its border
        # walls (`dust/utils/obstacle.py:64-68`), and reproducing the exact
        # occupancy grid is required for cost parity.
        obst_map.map[x_start:x_end, y_start:y_end] = 1.0
        return obst_map

    def collision_check(self, obst_map: ObstacleMap):
        import copy

        test = self.add_to_map(copy.deepcopy(obst_map))
        return not np.any(test.map > 1)


def get_obst_preset(preset_name, obst_width=2):
    """Named obstacle layouts (`dust/utils/obstacle_map.py:101-220`)."""
    w = obst_width
    if preset_name == "staggered_3-2-3":
        centers = [(-4, 4), (0, 4), (4, 4), (-6, 0), (-2, 0), (2, 0), (6, 0),
                   (-4, -4), (0, -4), (4, -4)]
    elif preset_name == "staggered_4-3-4-3-4":
        centers = [(-6, 6), (-2, 6), (2, 6), (6, 6),
                   (-4, 3), (0, 3), (4, 3),
                   (-6, 0), (-2, 0), (2, 0), (6, 0),
                   (-4, -3), (0, -3), (4, -3),
                   (-6, -6), (-2, -6), (2, -6), (6, -6)]
    elif preset_name == "grid_3x3":
        s = 5
        centers = [(i * s, j * s) for j in (1, 0, -1) for i in (-1, 0, 1)]
    elif preset_name == "grid_4x4":
        s = 4
        centers = [(i * s / 2, j * s / 2)
                   for j in (3, 1, -1, -3) for i in (-3, -1, 1, 3)]
    elif preset_name == "grid_6x6":
        s = 3
        centers = [(i * s / 2, j * s / 2)
                   for j in (5, 3, 1, -1, -3, -5) for i in (-5, -3, -1, 1, 3, 5)]
    elif preset_name == "single_centred":
        centers = [(0, 0)]
    else:
        raise IOError(f"Obstacle preset not supported: {preset_name}")
    return [[cx, cy, w, w] for cx, cy in centers]


def generate_obstacle_map(map_dim=(10, 10), obst_list=(), cell_size=1.0,
                          map_type=None, random_gen=False, num_obst=0,
                          rand_xy_limits=None, rand_shape=(2, 2), seed=None):
    """Build the occupancy grid: fixed rectangles, 4 border walls, optional
    random rectangles (`dust/utils/obstacle_map.py:249-361`)."""
    obst_map = ObstacleMap(map_dim, cell_size)

    for cx, cy, width, height in obst_list:
        ObstacleRectangle(cx, cy, width, height).add_to_map(obst_map)

    # border walls
    for limit in obst_map.xlim:
        ObstacleRectangle(
            limit, 0, 4 * obst_map.cell_size, obst_map.ylim[1] - obst_map.ylim[0]
        ).add_to_map(obst_map)
    for limit in obst_map.ylim:
        ObstacleRectangle(
            0, limit, obst_map.xlim[1] - obst_map.xlim[0], 4 * obst_map.cell_size
        ).add_to_map(obst_map)

    if random_gen:
        rng = random.Random(seed)
        xlim, ylim = rand_xy_limits
        width, height = rand_shape
        added = len(list(obst_list))
        while added < num_obst:
            placed = False
            for _ in range(25):
                rect = ObstacleRectangle(
                    rng.uniform(*xlim), rng.uniform(*ylim), width, height
                )
                if rect.collision_check(obst_map):
                    rect.add_to_map(obst_map)
                    placed = True
                    added += 1
                    break
            if not placed:
                break

    if map_type not in (None, "direct"):
        raise IOError(f'Map type "{map_type}" not recognized')
    obst_map.convert_map()
    return obst_map
