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


def _incident_cells(gx: np.ndarray, gy: np.ndarray, n: int, res: int) -> np.ndarray:
    """All cells whose CLOSURE contains each grid-space point: the floor
    cell, plus the lower neighbor along any axis where the coordinate sits
    exactly on a grid line (and the 4-cell corner product when both do).
    Closed-cell semantics are what makes the supercover guarantee exact
    for crossings/vertices landing on grid lines or collinear runs."""
    fx = np.floor(gx)
    fy = np.floor(gy)
    lx = np.where(gx == fx, fx - 1.0, fx)
    ly = np.where(gy == fy, fy - 1.0, fy)
    ix = np.concatenate([fx, lx, fx, lx])
    iy = np.concatenate([fy, fy, ly, ly])
    ix = np.clip(ix, 0, n - 1).astype(np.int64)
    iy = np.clip(iy, 0, n - 1).astype(np.int64)
    return pack(ix, iy, res)


def segment_cells(ax: float, ay: float, bx: float, by: float, n: int, res: int) -> np.ndarray:
    """Exact grid supercover of one segment given in GRID coordinates
    (gx = (lon+180)/360*n, gy = (lat+90)/180*n): every cell the segment
    intersects (closed cells).  Crossing parameters with integer grid
    lines partition the segment; the midpoint of each piece lies strictly
    inside one cell, and every crossing/endpoint additionally contributes
    its incident cells (handles corner-clips and collinear runs the old
    half-cell sampling could miss)."""
    ts = [np.array([0.0, 1.0])]
    dx, dy = bx - ax, by - ay
    if dx != 0.0:
        k0, k1 = np.ceil(min(ax, bx)), np.floor(max(ax, bx))
        if k1 >= k0:
            ts.append((np.arange(k0, k1 + 1) - ax) / dx)
    if dy != 0.0:
        k0, k1 = np.ceil(min(ay, by)), np.floor(max(ay, by))
        if k1 >= k0:
            ts.append((np.arange(k0, k1 + 1) - ay) / dy)
    t = np.unique(np.clip(np.concatenate(ts), 0.0, 1.0))
    px, py = ax + t * dx, ay + t * dy
    mids_t = (t[:-1] + t[1:]) / 2.0
    cells = [_incident_cells(px, py, n, res)]
    if len(mids_t):
        mx, my = ax + mids_t * dx, ay + mids_t * dy
        ix = np.clip(np.floor(mx), 0, n - 1).astype(np.int64)
        iy = np.clip(np.floor(my), 0, n - 1).astype(np.int64)
        cells.append(pack(ix, iy, res))
    return np.concatenate(cells)


def polygon_cover(
    xs: np.ndarray,
    ys: np.ndarray,
    ring_offsets: np.ndarray,
    res: int,
    points_in_polygon_fn,
) -> np.ndarray:
    """Cell cover of one polygon: bbox cells whose center is inside, plus
    the exact supercover of every boundary edge.  Guarantee: any cell
    containing an interior point is covered — a cell not touched by the
    boundary that holds an interior point is fully interior, so its
    center is inside; a cell touched by the boundary (even at a single
    corner point) is in the edge supercover."""
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

    # boundary cells: exact per-edge supercover in grid space
    gxs = (xs + 180.0) / 360.0 * n
    gys = (ys + 90.0) / 180.0 * n
    bounds = list(ring_offsets) + [len(xs)]
    bcells: list[np.ndarray] = []
    for r in range(len(ring_offsets)):
        s, e = bounds[r], bounds[r + 1]
        for i in range(s, e - 1):
            bcells.append(segment_cells(gxs[i], gys[i], gxs[i + 1], gys[i + 1], n, res))
        if e - s >= 2 and (gxs[s] != gxs[e - 1] or gys[s] != gys[e - 1]):
            # ring stored without the duplicated closing vertex: wrap edge
            bcells.append(segment_cells(gxs[e - 1], gys[e - 1], gxs[s], gys[s], n, res))
    boundary_cells = np.concatenate(bcells) if bcells else np.empty(0, np.int64)
    return np.unique(np.concatenate([interior_cells, boundary_cells]))
