"""Hierarchical lon/lat grid cells — the engine's H3/S2 stand-in.

The h3/s2 libraries are not in this container, so the tiling layer uses a
deterministic equirectangular quadkey grid with the same API shape a real
H3 integration would have (cell id ←→ geometry, cover, neighbor rings).
At resolution r the world splits into 2^r × 2^r cells over
lon ∈ [-180, 180), lat ∈ [-90, 90); ids pack (r, ix, iy) into an int64.

The formula is deliberately SQL-replicable (same IEEE double expression
order) so the DuckDB oracle can recompute cell ids bit-identically:

    ix = floor((lon + 180.0) / 360.0 * 2^r), clamped to [0, 2^r-1]
    iy = floor((lat +  90.0) / 180.0 * 2^r), clamped
    cell_id = r * 2^58 + ix * 2^29 + iy
"""

from __future__ import annotations

import numpy as np

MAX_RES = 28


def cell_ids(lon: np.ndarray, lat: np.ndarray, res: int) -> np.ndarray:
    s = float(1 << res)
    ix = np.floor((np.asarray(lon, np.float64) + 180.0) / 360.0 * s)
    iy = np.floor((np.asarray(lat, np.float64) + 90.0) / 180.0 * s)
    ix = np.clip(ix, 0, s - 1).astype(np.int64)
    iy = np.clip(iy, 0, s - 1).astype(np.int64)
    return (np.int64(res) << np.int64(58)) + (ix << np.int64(29)) + iy


def cell_components(cell_id: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    cell_id = np.asarray(cell_id, np.int64)
    res = cell_id >> np.int64(58)
    ix = (cell_id >> np.int64(29)) & np.int64((1 << 29) - 1)
    iy = cell_id & np.int64((1 << 29) - 1)
    return res, ix, iy


def cell_size_deg(res: int) -> tuple[float, float]:
    return 360.0 / (1 << res), 180.0 / (1 << res)


def cell_center(cell_id: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    res, ix, iy = cell_components(cell_id)
    w = 360.0 / np.power(2.0, res)
    h = 180.0 / np.power(2.0, res)
    return -180.0 + (ix + 0.5) * w, -90.0 + (iy + 0.5) * h


def pack(ix: np.ndarray, iy: np.ndarray, res: int) -> np.ndarray:
    return (np.int64(res) << np.int64(58)) + (np.asarray(ix, np.int64) << np.int64(29)) + np.asarray(iy, np.int64)


def neighbor_ring(cell_id: int, ring: int) -> np.ndarray:
    """All cells at Chebyshev distance ≤ ring (incl. the cell) — the kNN
    expanding-search primitive.  Clamped at the grid edge (no wrap)."""
    res, ix, iy = cell_components(np.asarray([cell_id]))
    res, ix, iy = int(res[0]), int(ix[0]), int(iy[0])
    n = 1 << res
    xs = np.arange(max(0, ix - ring), min(n - 1, ix + ring) + 1)
    ys = np.arange(max(0, iy - ring), min(n - 1, iy + ring) + 1)
    gx, gy = np.meshgrid(xs, ys)
    return pack(gx.ravel(), gy.ravel(), res)


def polygon_cover(
    xs: np.ndarray,
    ys: np.ndarray,
    ring_offsets: np.ndarray,
    res: int,
    points_in_polygon_fn,
) -> np.ndarray:
    """Cell cover of one polygon: bbox cells whose center is inside, plus
    all boundary cells (edges sampled at sub-cell spacing).  Guarantees
    that any cell containing an interior point is covered (interior cells
    have center-inside OR are boundary-crossed)."""
    xs = np.asarray(xs, np.float64)
    ys = np.asarray(ys, np.float64)
    w, h = cell_size_deg(res)
    n = 1 << res
    ix0 = int(np.clip(np.floor((xs.min() + 180.0) / 360.0 * n), 0, n - 1))
    ix1 = int(np.clip(np.floor((xs.max() + 180.0) / 360.0 * n), 0, n - 1))
    iy0 = int(np.clip(np.floor((ys.min() + 90.0) / 180.0 * n), 0, n - 1))
    iy1 = int(np.clip(np.floor((ys.max() + 90.0) / 180.0 * n), 0, n - 1))
    gx, gy = np.meshgrid(np.arange(ix0, ix1 + 1), np.arange(iy0, iy1 + 1))
    cx = -180.0 + (gx.ravel() + 0.5) * w
    cy = -90.0 + (gy.ravel() + 0.5) * h
    inside = points_in_polygon_fn(cx, cy, xs, ys, np.asarray(ring_offsets))
    interior_cells = pack(gx.ravel()[inside], gy.ravel()[inside], res)

    # boundary cells: sample every edge of every ring at half-cell spacing
    bounds = list(ring_offsets) + [len(xs)]
    bx: list[np.ndarray] = []
    by: list[np.ndarray] = []
    for r in range(len(ring_offsets)):
        s, e = bounds[r], bounds[r + 1]
        rx, ry = xs[s:e], ys[s:e]
        x1, y1 = rx[:-1], ry[:-1]
        x2, y2 = rx[1:], ry[1:]
        steps = np.maximum(
            np.ceil(np.maximum(np.abs(x2 - x1) / w, np.abs(y2 - y1) / h) * 2).astype(int), 1
        )
        for i in range(len(x1)):
            t = np.linspace(0.0, 1.0, steps[i] + 1)
            bx.append(x1[i] + t * (x2[i] - x1[i]))
            by.append(y1[i] + t * (y2[i] - y1[i]))
    if bx:
        boundary_cells = cell_ids(np.concatenate(bx), np.concatenate(by), res)
    else:
        boundary_cells = np.empty(0, np.int64)
    return np.unique(np.concatenate([interior_cells, boundary_cells]))
