"""Geometry kernels: way geometry, ring stitching, point-in-polygon.

Way geometry semantics are the reference's (OsmPostProcessor.java:194-208):
coordinates are each resolved node's [lon, lat] in ns order; if the first
coordinate equals the last the way is a Polygon (one ring), else a
LineString.

Ring stitching realizes the reference's relation stub (P12,
OsmPostProcessor.java:214-227) for multipolygon relations per the OSM
multipolygon convention: member ways with role outer/inner are stitched
end-to-end on shared endpoint *node ids*, reversing segments as needed;
inner rings are nested into the outer ring that contains them (ray-cast
test on a representative vertex).  No reference counterpart — semantics
defined here (SURVEY.md §2.9) and pinned by fixtures.
"""

from __future__ import annotations

import numpy as np


def way_geom_type(xs: np.ndarray, ys: np.ndarray) -> str:
    """Polygon iff first coordinate == last (value equality, not node id —
    OsmPostProcessor.java:200 compares the [lon,lat] arrays)."""
    if len(xs) >= 2 and xs[0] == xs[-1] and ys[0] == ys[-1]:
        return "Polygon"
    return "LineString"


def stitch_rings(
    segments: list[tuple[list[int], np.ndarray, np.ndarray]],
) -> list[tuple[list[int], np.ndarray, np.ndarray]] | None:
    """Stitch way segments into closed rings.

    Each segment is (node_ids, xs, ys).  Returns a list of closed rings
    (closing vertex duplicated) or None if any segment cannot be closed.
    Matching is on endpoint node ids; segments may need reversal.
    """
    open_segs = [
        (list(ids), np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64))
        for ids, x, y in segments
        if len(ids) >= 2
    ]
    if len(open_segs) != len(segments):
        return None
    rings: list[tuple[list[int], np.ndarray, np.ndarray]] = []
    while open_segs:
        ids, xs, ys = open_segs.pop(0)
        ids, xs, ys = list(ids), list(xs), list(ys)
        while ids[0] != ids[-1]:
            tail = ids[-1]
            found = None
            for i, (sids, sxs, sys_) in enumerate(open_segs):
                if sids[0] == tail:
                    found = (i, False)
                    break
                if sids[-1] == tail:
                    found = (i, True)
                    break
            if found is None:
                return None  # unclosable ring
            i, rev = found
            sids, sxs, sys_ = open_segs.pop(i)
            if rev:
                sids, sxs, sys_ = sids[::-1], sxs[::-1], sys_[::-1]
            ids.extend(sids[1:])
            xs.extend(sxs[1:])
            ys.extend(sys_[1:])
        if len(ids) < 4:  # degenerate (triangle needs 4 incl closure)
            return None
        rings.append((ids, np.asarray(xs), np.asarray(ys)))
    return rings


def signed_area(xs: np.ndarray, ys: np.ndarray) -> float:
    """Shoelace; positive = counter-clockwise."""
    return 0.5 * float(np.sum(xs[:-1] * ys[1:] - xs[1:] * ys[:-1]))


def ensure_orientation(xs: np.ndarray, ys: np.ndarray, ccw: bool) -> tuple[np.ndarray, np.ndarray]:
    """GeoJSON RFC 7946 winding: outer CCW, holes CW (engine convention;
    the reference emits no polygons from relations at all)."""
    if (signed_area(xs, ys) > 0) != ccw:
        return xs[::-1].copy(), ys[::-1].copy()
    return xs, ys


def points_in_ring(px: np.ndarray, py: np.ndarray, rx: np.ndarray, ry: np.ndarray) -> np.ndarray:
    """Vectorized even-odd ray casting: which of the points lie inside the
    ring (closing vertex may or may not be duplicated)."""
    if len(rx) and rx[0] == rx[-1] and ry[0] == ry[-1]:
        rx, ry = rx[:-1], ry[:-1]
    n = len(rx)
    inside = np.zeros(len(px), dtype=bool)
    if n < 3:
        return inside
    x1, y1 = rx, ry
    x2, y2 = np.roll(rx, -1), np.roll(ry, -1)
    for i in range(n):  # loop over edges; vectorized over points
        a_y, b_y = y1[i], y2[i]
        crosses = (a_y > py) != (b_y > py)
        if not crosses.any():
            continue
        t = (py - a_y) / (b_y - a_y)
        x_int = x1[i] + t * (x2[i] - x1[i])
        inside ^= crosses & (px < x_int)
    return inside


def points_in_polygon(
    px: np.ndarray,
    py: np.ndarray,
    xs: np.ndarray,
    ys: np.ndarray,
    ring_offsets: np.ndarray,
) -> np.ndarray:
    """Even-odd membership over all rings of one polygon (flattened
    FEATURES layout: ring r spans xs[ring_offsets[r]:ring_offsets[r+1]])."""
    inside = np.zeros(len(px), dtype=bool)
    bounds = list(ring_offsets) + [len(xs)]
    for r in range(len(ring_offsets)):
        s, e = bounds[r], bounds[r + 1]
        inside ^= points_in_ring(px, py, xs[s:e], ys[s:e])
    return inside
