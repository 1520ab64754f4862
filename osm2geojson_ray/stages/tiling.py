"""[EXT] Tiling layer (SURVEY.md §2.9): cell covers, point-in-polygon tile
assignment, kNN between point features and polygon centroids.

Design per the north rule: stateless vectorized ``map_batches`` for cell
assignment/covers; the polygon index and the centroid matrix are *small
sides* broadcast once via ``ray.put`` and materialized per actor in
``__init__`` (actor-pool stages), never re-shipped per batch; the
candidate join point→polygon is a flat-payload hash join on cell_id.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..functions import cells as C
from ..functions.geometry import points_in_polygon
from ..functions.grouping import from_pandas_clean, distinct
from ..functions.joins import flat_join
from ..schema import TILES

# ---------------------------------------------------------------------------
# covers
# ---------------------------------------------------------------------------


def vertex_cells_batch(batch: pa.Table, res: int) -> pa.Table:
    """Distinct cells of every geometry vertex — the SQL-checkable cover."""
    xs_col = batch.column("xs").combine_chunks()
    ys_col = batch.column("ys").combine_chunks()
    lens = np.asarray(xs_col.value_lengths().fill_null(0), dtype=np.int64)
    fid = np.repeat(np.asarray(batch.column("feature_id").to_pandas(), dtype=object), lens)
    cid = C.cell_ids(np.asarray(xs_col.flatten()), np.asarray(ys_col.flatten()), res)
    t = pa.table({"feature_id": pa.array(fid, pa.string()), "cell_id": pa.array(cid)})
    return t.group_by(["feature_id", "cell_id"]).aggregate([]).select(["feature_id", "cell_id"])


def vertex_cells(features: ray.data.Dataset, res: int, num_parts: int = 32) -> ray.data.Dataset:
    pre = features.map_batches(
        lambda t: vertex_cells_batch(t, res), batch_format="pyarrow"
    )
    return distinct(pre, ["feature_id", "cell_id"], num_parts)


def polygon_cover_batch(batch: pa.Table, res: int) -> pa.Table:
    """Full polyfill cover for polygon features (interior + boundary)."""
    fids = batch.column("feature_id").to_pylist()
    geom = batch.column("geom_type").to_pylist()
    xs = batch.column("xs").to_pylist()
    ys = batch.column("ys").to_pylist()
    ro = batch.column("ring_offsets").to_pylist()
    out_f: list[str] = []
    out_c: list[np.ndarray] = []
    for i in range(batch.num_rows):
        if geom[i] not in ("Polygon", "MultiPolygon"):
            continue
        cover = C.polygon_cover(
            np.asarray(xs[i]), np.asarray(ys[i]), np.asarray(ro[i], dtype=np.int64),
            res, points_in_polygon,
        )
        out_f.extend([fids[i]] * len(cover))
        out_c.append(cover)
    cid = np.concatenate(out_c) if out_c else np.empty(0, np.int64)
    return pa.Table.from_pydict(
        {"feature_id": out_f, "cell_id": cid}, schema=TILES
    )


def polygon_cover(features: ray.data.Dataset, res: int) -> ray.data.Dataset:
    return features.map_batches(lambda t: polygon_cover_batch(t, res), batch_format="pyarrow", zero_copy_batch=True)


def polygon_cover_adaptive_batch(
    batch: pa.Table, base_res: int, max_cells: int = 1024
) -> pa.Table:
    """Polyfill cover with a PER-POLYGON resolution: each polygon is
    covered at the finest res ≤ base_res whose bbox holds ≤ max_cells
    cells.  Bounds cover size (and the interior-test work) per polygon
    regardless of extent — a continent-sized polygon gets a coarse
    cover, a building a fine one.  The res is embedded in the cell id
    (ids pack (res, ix, iy)), so a multi-res join stays a plain
    equi-join on cell_id."""
    fids = batch.column("feature_id").to_pylist()
    geom = batch.column("geom_type").to_pylist()
    xs = batch.column("xs").to_pylist()
    ys = batch.column("ys").to_pylist()
    ro = batch.column("ring_offsets").to_pylist()
    out_f: list[str] = []
    out_c: list[np.ndarray] = []
    for i in range(batch.num_rows):
        if geom[i] not in ("Polygon", "MultiPolygon"):
            continue
        x = np.asarray(xs[i])
        y = np.asarray(ys[i])
        dx = float(x.max() - x.min())
        dy = float(y.max() - y.min())
        r = base_res
        while r > 0:
            n = 1 << r
            ncells = (int(dx / 360.0 * n) + 2) * (int(dy / 180.0 * n) + 2)
            if ncells <= max_cells:
                break
            r -= 1
        cover = C.polygon_cover(
            x, y, np.asarray(ro[i], dtype=np.int64), r, points_in_polygon
        )
        out_f.extend([fids[i]] * len(cover))
        out_c.append(cover)
    cid = np.concatenate(out_c) if out_c else np.empty(0, np.int64)
    return pa.Table.from_pydict({"feature_id": out_f, "cell_id": cid}, schema=TILES)


def _pip_candidates(
    points: ray.data.Dataset,
    polygons: ray.data.Dataset,
    res: int,
    num_partitions: int,
    max_cells: int = 1024,
) -> ray.data.Dataset:
    """Candidate (point, polygon) pairs via the multi-res cell join:
    polygons polyfill at their adaptive res; points emit one cell per res
    level actually present in the cover (a handful of levels — derived
    from a tiny distinct aggregate, not a driver gather of data rows)."""
    cover = polygons.map_batches(
        lambda t: polygon_cover_adaptive_batch(t, res, max_cells),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).map_batches(
        lambda t: t.rename_columns(["polygon_id", "cell_id"]), batch_format="pyarrow"
    ).materialize()
    levels_ds = cover.map_batches(
        lambda t: pa.table(
            {"res": pa.array(np.unique(np.asarray(t.column("cell_id").combine_chunks()) >> np.int64(58)))}
        ),
        batch_format="pyarrow",
    )
    levels = sorted({r["res"] for r in levels_ds.take_all()})  # ≤ 29 scalars

    def pt_cells_multi(batch: pa.Table) -> pa.Table:
        mask = pa.compute.equal(batch.column("geom_type"), "Point")
        pts = batch.filter(mask)
        xs = np.asarray(pts.column("xs").combine_chunks().flatten())
        ys = np.asarray(pts.column("ys").combine_chunks().flatten())
        tables = []
        for r in levels:
            tables.append(
                pa.table(
                    {
                        "point_id": pts.column("feature_id"),
                        "px": pa.array(xs),
                        "py": pa.array(ys),
                        "cell_id": pa.array(C.cell_ids(xs, ys, int(r))),
                    }
                )
            )
        if not tables:
            return pa.table(
                {"point_id": pa.array([], pa.string()), "px": pa.array([], pa.float64()),
                 "py": pa.array([], pa.float64()), "cell_id": pa.array([], pa.int64())}
            )
        return pa.concat_tables(tables)

    pt_cells = points.map_batches(pt_cells_multi, batch_format="pyarrow", zero_copy_batch=True)
    cands = flat_join(
        pt_cells, cover, on=("cell_id",), how="inner", num_partitions=num_partitions
    )
    return distinct(cands, ["point_id", "polygon_id", "px", "py"], num_parts=num_partitions)


# ---------------------------------------------------------------------------
# point-in-polygon tile assignment
# ---------------------------------------------------------------------------


def point_cells_batch(batch: pa.Table, res: int) -> pa.Table:
    mask = pa.compute.equal(batch.column("geom_type"), "Point")
    pts = batch.filter(mask)
    xs = np.asarray(pts.column("xs").combine_chunks().flatten())
    ys = np.asarray(pts.column("ys").combine_chunks().flatten())
    return pa.table(
        {
            "point_id": pts.column("feature_id"),
            "px": pa.array(xs),
            "py": pa.array(ys),
            "cell_id": pa.array(C.cell_ids(xs, ys, res)),
        }
    )


def assign_points_to_polygons(
    points: ray.data.Dataset,
    polygons: ray.data.Dataset,
    res: int,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """(point feature, polygon feature) pairs where the point lies inside
    the polygon.  DEFAULT = the shuffle path: no table is ever gathered
    to the driver or broadcast whole, so the polygon side can be
    arbitrarily large (the 100x-scale design the north rule demands).
    ``assign_points_to_polygons_broadcast`` remains as the small-side
    option when the polygon table is known to fit in one object."""
    return assign_points_to_polygons_shuffle(points, polygons, res, num_partitions)


def assign_points_to_polygons_broadcast(
    points: ray.data.Dataset,
    polygons: ray.data.Dataset,
    res: int,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Broadcast variant: candidates via the flat cell_id hash join of
    point cells against the polygon polyfill; exact even-odd test against
    the polygon geometry held in a per-actor index built from one
    ``ray.put`` broadcast.  Only for small polygon sides — the geometry
    table passes through the driver."""
    cands = _pip_candidates(points, polygons, res, num_partitions)

    polys_ref = ray.put(
        polygons.select_columns(["feature_id", "xs", "ys", "ring_offsets"]).take_all()
    )

    class ExactPIP:
        """Actor-pool stage: polygon geometry index built once per actor
        from the broadcast ref (never per batch)."""

        def __init__(self) -> None:
            rows = ray.get(polys_ref)
            self.index = {
                r["feature_id"]: (
                    np.asarray(r["xs"]),
                    np.asarray(r["ys"]),
                    np.asarray(r["ring_offsets"], dtype=np.int64),
                )
                for r in rows
            }

        def __call__(self, batch: pa.Table) -> pa.Table:
            pids = batch.column("polygon_id").to_pylist()
            px = np.asarray(batch.column("px").combine_chunks())
            py = np.asarray(batch.column("py").combine_chunks())
            keep = np.zeros(batch.num_rows, dtype=bool)
            order = np.argsort(np.asarray(pids, dtype=object), kind="stable")
            i = 0
            while i < len(order):
                j = i
                pid = pids[order[i]]
                while j < len(order) and pids[order[j]] == pid:
                    j += 1
                sel = order[i:j]
                xs, ys, ro = self.index[pid]
                keep[sel] = points_in_polygon(px[sel], py[sel], xs, ys, ro)
                i = j
            return batch.filter(pa.array(keep)).select(["point_id", "polygon_id"])

    return cands.map_batches(ExactPIP, batch_format="pyarrow", concurrency=(1, 4))


def assign_points_to_polygons_shuffle(
    points: ray.data.Dataset,
    polygons: ray.data.Dataset,
    res: int,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Shuffle-only PIP assignment — the scale path when the polygon side
    is too large to broadcast: candidate pairs from the flat cell join are
    co-grouped with the polygon *geometry* on polygon_id (nested-capable
    engine join), then tested vectorized per polygon inside the
    partition.  Same output as assign_points_to_polygons."""
    import pyarrow as pa

    from ..functions.joins import join_on_unique

    cands = _pip_candidates(points, polygons, res, num_partitions)

    geom = polygons.map_batches(
        lambda t: pa.table(
            {
                "polygon_id": t.column("feature_id"),
                "gxs": t.column("xs"),
                "gys": t.column("ys"),
                "gro": t.column("ring_offsets"),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    cand_schema = pa.schema(
        [
            ("polygon_id", pa.string()),
            ("point_id", pa.string()),
            ("px", pa.float64()),
            ("py", pa.float64()),
        ]
    )
    geom_schema = pa.schema(
        [
            ("polygon_id", pa.string()),
            ("gxs", pa.list_(pa.float64())),
            ("gys", pa.list_(pa.float64())),
            ("gro", pa.list_(pa.int32())),
        ]
    )
    cands_sel = cands.map_batches(
        lambda t: t.select(["polygon_id", "point_id", "px", "py"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    joined = join_on_unique(
        cands_sel, geom, "polygon_id", cand_schema, geom_schema,
        how="inner", num_parts=num_partitions,
    )

    def exact(t: pa.Table) -> pa.Table:
        pids = t.column("polygon_id").to_pylist()
        px = np.asarray(t.column("px").combine_chunks())
        py = np.asarray(t.column("py").combine_chunks())
        gxs = t.column("gxs").to_pylist()
        gys = t.column("gys").to_pylist()
        gro = t.column("gro").to_pylist()
        keep = np.zeros(t.num_rows, dtype=bool)
        order = np.argsort(np.asarray(pids, dtype=object), kind="stable")
        i = 0
        while i < len(order):
            j = i
            pid = pids[order[i]]
            while j < len(order) and pids[order[j]] == pid:
                j += 1
            sel = order[i:j]
            r0 = sel[0]
            keep[sel] = points_in_polygon(
                px[sel], py[sel],
                np.asarray(gxs[r0]), np.asarray(gys[r0]), np.asarray(gro[r0], dtype=np.int64),
            )
            i = j
        return t.filter(pa.array(keep)).select(["point_id", "polygon_id"])

    return joined.map_batches(exact, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# kNN: point features → nearest polygon centroids
# ---------------------------------------------------------------------------


def polygon_centroids_batch(batch: pa.Table) -> pa.Table:
    """Centroid = mean of the stored vertices (flattened xs/ys as carried,
    including ring-closure duplicates — definition documented for the SQL
    oracle)."""
    mask = pa.compute.is_in(
        batch.column("geom_type"), value_set=pa.array(["Polygon", "MultiPolygon"])
    )
    polys = batch.filter(mask)
    xs_col = polys.column("xs").combine_chunks()
    ys_col = polys.column("ys").combine_chunks()
    lens = np.asarray(xs_col.value_lengths().fill_null(0), dtype=np.float64)
    xsum = np.add.reduceat(np.asarray(xs_col.flatten(), np.float64), np.insert(np.cumsum(lens[:-1]).astype(np.int64), 0, 0)) if polys.num_rows else np.empty(0)
    ysum = np.add.reduceat(np.asarray(ys_col.flatten(), np.float64), np.insert(np.cumsum(lens[:-1]).astype(np.int64), 0, 0)) if polys.num_rows else np.empty(0)
    with np.errstate(invalid="ignore"):
        cx = xsum / lens
        cy = ysum / lens
    return pa.table(
        {
            "polygon_id": polys.column("feature_id"),
            "cx": pa.array(cx, pa.float64()),
            "cy": pa.array(cy, pa.float64()),
        }
    )


def polygon_centroids(polygons: ray.data.Dataset) -> ray.data.Dataset:
    return polygons.map_batches(polygon_centroids_batch, batch_format="pyarrow", zero_copy_batch=True)


def knn_points_to_centroids(
    points: ray.data.Dataset,
    polygons: ray.data.Dataset,
    k: int = 2,
) -> ray.data.Dataset:
    """Brute-force kNN against the broadcast centroid matrix (small-side
    option: one centroid per polygon feature, gathered to the driver).
    Distance = squared euclidean in degree space (SQL-replicable); ties
    broken by polygon_id.  ``knn_distributed`` is the default scale path
    (same result, parity-tested, nothing driver-side)."""
    cents = polygon_centroids(polygons).take_all()
    ids = [r["polygon_id"] for r in cents]
    order = np.argsort(np.asarray(ids, dtype=object), kind="stable")
    cid_sorted = [ids[i] for i in order]
    cmat = np.asarray([[cents[i]["cx"], cents[i]["cy"]] for i in order], dtype=np.float64)
    bref = ray.put((cid_sorted, cmat))

    class KnnBatch:
        def __init__(self) -> None:
            self.cids, self.cmat = ray.get(bref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            mask = pa.compute.equal(batch.column("geom_type"), "Point")
            pts = batch.filter(mask)
            if pts.num_rows == 0 or len(self.cids) == 0:
                return pa.table(
                    {"point_id": pa.array([], pa.string()),
                     "polygon_id": pa.array([], pa.string()),
                     "rank": pa.array([], pa.int32())}
                )
            px = np.asarray(pts.column("xs").combine_chunks().flatten())
            py = np.asarray(pts.column("ys").combine_chunks().flatten())
            dx = px[:, None] - self.cmat[None, :, 0]
            dy = py[:, None] - self.cmat[None, :, 1]
            d2 = dx * dx + dy * dy
            kk = min(k, d2.shape[1])
            idx = np.argsort(d2, axis=1, kind="stable")[:, :kk]  # ties → lower index = lower id
            pid = pts.column("feature_id").to_pylist()
            out_p, out_g, out_r = [], [], []
            for i in range(len(pid)):
                for r in range(kk):
                    out_p.append(pid[i])
                    out_g.append(self.cids[idx[i, r]])
                    out_r.append(r + 1)
            return pa.table(
                {"point_id": pa.array(out_p, pa.string()),
                 "polygon_id": pa.array(out_g, pa.string()),
                 "rank": pa.array(out_r, pa.int32())}
            )

    return points.map_batches(KnnBatch, batch_format="pyarrow", concurrency=(1, 4))


def knn_cell_ring(
    points: ray.data.Dataset,
    polygons: ray.data.Dataset,
    k: int = 2,
    index_res: int = 6,
) -> ray.data.Dataset:
    """Cell-ring expanding kNN — the scale path: centroids are bucketed
    on a coarse cell grid in an actor-held index; each point expands
    Chebyshev rings around its cell until ≥k candidates are in hand, then
    one more safety ring (a cell-ring at distance r bounds the true
    nearest beyond ring r-1), then exact top-k on the candidates.

    Exact same result as knn_points_to_centroids (parity-tested) while
    touching only a neighborhood of the index per point."""
    import pyarrow.compute as pc

    cents = polygon_centroids(polygons).take_all()
    ids = np.asarray([r["polygon_id"] for r in cents], dtype=object)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    cmat = np.asarray([[cents[i]["cx"], cents[i]["cy"]] for i in order], dtype=np.float64)
    cell_of = C.cell_ids(cmat[:, 0], cmat[:, 1], index_res) if len(ids) else np.empty(0, np.int64)
    bref = ray.put((ids, cmat, cell_of))

    class RingKnn:
        def __init__(self) -> None:
            ids, cmat, cell_of = ray.get(bref)
            self.ids, self.cmat = ids, cmat
            self.buckets: dict[int, np.ndarray] = {}
            o = np.argsort(cell_of, kind="stable")
            cs = cell_of[o]
            bounds = np.concatenate([[0], np.nonzero(cs[1:] != cs[:-1])[0] + 1, [len(cs)]])
            for b in range(len(bounds) - 1):
                s, e = bounds[b], bounds[b + 1]
                if e > s:
                    self.buckets[int(cs[s])] = o[s:e]
            self.n_side = 1 << index_res

        def _ring_cells(self, cid: int, ring: int) -> list[int]:
            cells = C.neighbor_ring(cid, ring).tolist()
            if ring == 0:
                return cells
            inner = set(C.neighbor_ring(cid, ring - 1).tolist())
            return [c for c in cells if c not in inner]

        def __call__(self, batch: pa.Table) -> pa.Table:
            pts = batch.filter(pc.equal(batch.column("geom_type"), "Point"))
            out_p: list[str] = []
            out_g: list[str] = []
            out_r: list[int] = []
            if pts.num_rows and len(self.ids):
                px = np.asarray(pts.column("xs").combine_chunks().flatten())
                py = np.asarray(pts.column("ys").combine_chunks().flatten())
                pid = pts.column("feature_id").to_pylist()
                pcell = C.cell_ids(px, py, index_res)
                _, h_min = C.cell_size_deg(index_res)
                for i in range(len(pid)):
                    # exact expanding search: grow rings until the kth-best
                    # distance provably cannot improve ((ring-1)*h_min
                    # exceeds it; h_min = smaller cell dimension)
                    cand: list[np.ndarray] = []
                    total = 0
                    ring = 0
                    dk = None
                    while ring < self.n_side:
                        got = [self.buckets[c] for c in self._ring_cells(int(pcell[i]), ring)
                               if c in self.buckets]
                        if got:
                            cand.extend(got)
                            total += sum(len(g) for g in got)
                        if total >= k:
                            sel = np.sort(np.concatenate(cand))
                            dx = px[i] - self.cmat[sel, 0]
                            dy = py[i] - self.cmat[sel, 1]
                            d2 = dx * dx + dy * dy
                            kk = min(k, len(sel))
                            part = np.argpartition(d2, kk - 1)[:kk]
                            dk = float(np.sqrt(d2[part].max()))
                            if (ring) * h_min > dk:
                                break
                        ring += 1
                    if total == 0:
                        continue
                    sel = np.sort(np.concatenate(cand))
                    dx = px[i] - self.cmat[sel, 0]
                    dy = py[i] - self.cmat[sel, 1]
                    d2 = dx * dx + dy * dy
                    kk = min(k, len(sel))
                    loc = np.argsort(d2, kind="stable")[:kk]  # sel id-sorted -> ties stable
                    for r, li in enumerate(loc):
                        out_p.append(pid[i])
                        out_g.append(str(self.ids[sel[li]]))
                        out_r.append(r + 1)
            return pa.table(
                {"point_id": pa.array(out_p, pa.string()),
                 "polygon_id": pa.array(out_g, pa.string()),
                 "rank": pa.array(out_r, pa.int32())}
            )

    return points.map_batches(RingKnn, batch_format="pyarrow", concurrency=(1, 4))


# ---------------------------------------------------------------------------
# distributed exact kNN (the scale-path default)
# ---------------------------------------------------------------------------


def _points_flat(points: ray.data.Dataset) -> ray.data.Dataset:
    def f(t: pa.Table) -> pa.Table:
        pts = t.filter(pa.compute.equal(t.column("geom_type"), "Point"))
        return pa.table(
            {
                "point_id": pts.column("feature_id"),
                "px": pa.array(np.asarray(pts.column("xs").combine_chunks().flatten()), pa.float64()),
                "py": pa.array(np.asarray(pts.column("ys").combine_chunks().flatten()), pa.float64()),
            }
        )

    return points.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _replicate_centroids_batch(t: pa.Table, res: int) -> pa.Table:
    """Each centroid replicated to its ring-1 (3x3) cell neighborhood at
    ``res`` (clipped at the grid edge, duplicates deduped)."""
    cx = np.asarray(t.column("cx").combine_chunks())
    cy = np.asarray(t.column("cy").combine_chunks())
    n = np.int64(1 << res)
    base = C.cell_ids(cx, cy, res)
    _, ix, iy = C.cell_components(base)
    rows: list[np.ndarray] = []
    cells: list[np.ndarray] = []
    ridx = np.arange(t.num_rows, dtype=np.int64)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            jx = np.clip(ix + dx, 0, n - 1)
            jy = np.clip(iy + dy, 0, n - 1)
            rows.append(ridx)
            cells.append(C.pack(jx, jy, res))
    row_all = np.concatenate(rows)
    cell_all = np.concatenate(cells)
    # dedup (row, cell) pairs arising from edge clipping (lexsort + run scan)
    order = np.lexsort((cell_all, row_all))
    ra, ca = row_all[order], cell_all[order]
    keep = np.ones(len(ra), dtype=bool)
    keep[1:] = (ra[1:] != ra[:-1]) | (ca[1:] != ca[:-1])
    row_all, cell_all = ra[keep], ca[keep]
    sub = t.take(pa.array(row_all))
    return pa.table(
        {
            "cell_id": pa.array(cell_all, pa.int64()),
            "polygon_id": sub.column("polygon_id"),
            "cx": sub.column("cx"),
            "cy": sub.column("cy"),
        }
    )


def knn_distributed(
    points: ray.data.Dataset,
    polygons: ray.data.Dataset,
    k: int = 2,
    index_res: int | None = None,
    num_parts: int = 16,
) -> ray.data.Dataset:
    """Distributed EXACT kNN — the scale path and default: no driver-side
    gather, no per-actor global index.  Multi-round candidate join:

    1. centroids replicate to their ring-1 cell neighborhood at ``res``;
       points map to their cell; LEFT join on cell_id → candidates.
    2. hash-partition candidates by point_id; per point, take the k
       nearest candidates.  A point is RESOLVED when its kth-nearest
       candidate distance d_k < min(cell_w, cell_h): any centroid outside
       the 3x3 block is at least one full cell away, so all true top-k
       (including distance ties, broken by polygon_id) are among the
       candidates — exactness guarantee.
    3. unresolved points re-run at a coarser resolution (res-2); at
       res=0 the single cell holds every centroid, so the final round is
       brute force on the (geometrically shrinking) straggler set.

    ``index_res=None`` picks the initial resolution from the centroid
    count so a ring-1 block holds ~32*k centroids under a uniform
    spread — dense regions then resolve in round 1, sparse regions
    escalate per point.  Matches knn_points_to_centroids exactly
    (parity-tested).
    """
    import pandas as pd

    from ..functions.grouping import partition_map

    cents = polygon_centroids(polygons).materialize()
    n_cents = cents.count()
    if index_res is None:
        # ~32*k expected candidates per 3x3 block: 9*n/4^r = 32*k
        target_cells = max(1.0, 9.0 * n_cents / (32.0 * k))
        index_res = min(12, max(0, int(np.log2(target_cells) / 2)))
    if n_cents == 0:
        # no centroids: empty result (zero-block datasets have no schema
        # for the join planner)
        return ray.data.from_arrow(
            pa.table(
                {"point_id": pa.array([], pa.string()),
                 "polygon_id": pa.array([], pa.string()),
                 "rank": pa.array([], pa.int32())}
            )
        )
    # compact round 0 too: a features block with no Point rows filters to
    # empty inside _points_flat, and the NEXT map (cell-id append) turns
    # it into a zero-column block the join planner rejects.  compact
    # cannot repair an ALL-empty dataset (no block carries a schema), so
    # the zero-points case short-circuits like zero-centroids above.
    from ..functions.joins import compact_nonempty_blocks

    remaining = compact_nonempty_blocks(_points_flat(points))
    if remaining.count() == 0:
        return ray.data.from_arrow(
            pa.table(
                {"point_id": pa.array([], pa.string()),
                 "polygon_id": pa.array([], pa.string()),
                 "rank": pa.array([], pa.int32())}
            )
        )
    rounds: list[ray.data.Dataset] = []
    res = index_res
    while True:
        w, h = C.cell_size_deg(res)
        min_dim = min(w, h)
        final = res == 0
        cent_rep = cents.map_batches(
            lambda t, r=res: _replicate_centroids_batch(t, r), batch_format="pyarrow"
        )
        pt_cells = remaining.map_batches(
            lambda t, r=res: t.append_column(
                "cell_id",
                pa.array(
                    C.cell_ids(
                        np.asarray(t.column("px").combine_chunks()),
                        np.asarray(t.column("py").combine_chunks()),
                        r,
                    )
                ),
            ),
            batch_format="pyarrow",
        )
        cand = flat_join(
            pt_cells, cent_rep, on=("cell_id",), how="left_outer", num_partitions=num_parts
        )

        def topk(t: pa.Table, kk: int = k, md: float = min_dim, fin: bool = final) -> pa.Table:
            df = t.select(["point_id", "px", "py", "polygon_id", "cx", "cy"]).to_pandas()
            dx = df["px"] - df["cx"]
            dy = df["py"] - df["cy"]
            df["d2"] = dx * dx + dy * dy  # NaN for no-candidate rows
            df = df.sort_values(["point_id", "d2", "polygon_id"], kind="mergesort")
            g = df.groupby("point_id", sort=False)
            df["rnk"] = g.cumcount() + 1
            n_cand = g["polygon_id"].transform("count")  # nulls not counted
            # d_k per group, vectorized: the row whose rank == min(k, n_cand)
            is_kth = df["rnk"] == np.minimum(n_cand, kk)
            dk = df["point_id"].map(df.loc[is_kth].set_index("point_id")["d2"])
            # dk is SQUARED distance; exactness needs sqrt(dk) < md, i.e.
            # dk < md*md (comparing d2 to the linear md wrongly resolves
            # points once min_dim < 1 deg — fine index_res regimes).
            resolved = fin | ((n_cand >= kk) & (dk < md * md))
            out_rows = df[resolved & (df["rnk"] <= kk) & df["polygon_id"].notna()]
            out = pd.DataFrame(
                {
                    "point_id": out_rows["point_id"],
                    "px": out_rows["px"],
                    "py": out_rows["py"],
                    "polygon_id": out_rows["polygon_id"],
                    "rnk": out_rows["rnk"].astype(np.int64),
                    "resolved": True,
                }
            )
            un = df[~resolved & (df["rnk"] == 1)]
            if len(un):
                out = pd.concat(
                    [
                        out,
                        pd.DataFrame(
                            {
                                "point_id": un["point_id"],
                                "px": un["px"],
                                "py": un["py"],
                                "polygon_id": "",
                                "rnk": np.int64(0),
                                "resolved": False,
                            }
                        ),
                    ]
                )
            return from_pandas_clean(out)

        scored = partition_map(cand, ["point_id"], num_parts, topk).materialize()
        rounds.append(
            scored.map_batches(
                lambda t: t.filter(t.column("resolved"))
                .select(["point_id", "polygon_id", "rnk"]),
                batch_format="pyarrow",
            )
        )
        remaining = scored.map_batches(
            lambda t: t.filter(pa.compute.invert(t.column("resolved")))
            .select(["point_id", "px", "py"]),
            batch_format="pyarrow",
        )
        if final or remaining.count() == 0:
            break
        # the frontier shrinks every round: most blocks filter to empty,
        # and a further map over an empty block emits a ZERO-COLUMN
        # placeholder that breaks the native join once a join partition
        # receives only those (32-CPU sf0.001 repro) — drop them; the
        # frontier is small and scored is already materialized
        remaining = compact_nonempty_blocks(remaining)
        # small centroid side: the terminal all-candidates round is cheap,
        # so jump straight there instead of paying per-round exchange
        # latency; large sides coarsen gradually (16x area per round)
        res = 0 if n_cents <= 200_000 else max(0, res - 2)

    out = rounds[0]
    for r in rounds[1:]:
        out = out.union(r)
    return out.map_batches(
        lambda t: pa.table(
            {
                "point_id": t.column("point_id"),
                "polygon_id": t.column("polygon_id"),
                "rank": t.column("rnk").cast(pa.int32()),
            }
        ),
        batch_format="pyarrow",
    )


def bbox_query(
    features: ray.data.Dataset,
    lon0: float,
    lat0: float,
    lon1: float,
    lat1: float,
    res: int,
    num_parts: int = 16,
) -> ray.data.Dataset:
    """Index-accelerated spatial range query: features with at least one
    vertex inside [lon0,lon1]×[lat0,lat1] → (feature_id,).

    Plan: the query box's cell cover at ``res`` (a bounded driver-side
    grid — box_area / cell_area cells; pick ``res`` so that's small) is
    the PRUNE set; the vertex-cell tile index is filtered to those cells
    (sorted-array membership per batch — no shuffle), candidate ids are
    deduped, and one semi-join + exact vectorized vertex test verifies.
    The index has no false negatives for the vertex-in-box predicate (a
    vertex inside the box always lands in a covered cell); the exact
    test removes edge-cell false positives — index pruning changes I/O,
    never results.
    """
    from ..functions.cells import cell_ids, pack
    from ..functions.grouping import distinct
    from ..functions.joins import join_on_unique

    # driver-side: the box's cell range (bounded; document res choice)
    s = 1 << res
    ix0 = int(np.clip(np.floor((lon0 + 180.0) / 360.0 * s), 0, s - 1))
    ix1 = int(np.clip(np.floor((lon1 + 180.0) / 360.0 * s), 0, s - 1))
    iy0 = int(np.clip(np.floor((lat0 + 90.0) / 180.0 * s), 0, s - 1))
    iy1 = int(np.clip(np.floor((lat1 + 90.0) / 180.0 * s), 0, s - 1))
    gx, gy = np.meshgrid(
        np.arange(ix0, ix1 + 1, dtype=np.int64),
        np.arange(iy0, iy1 + 1, dtype=np.int64),
    )
    qcells = np.sort(pack(gx.ravel(), gy.ravel(), res))

    tiles = vertex_cells(features, res, num_parts=num_parts)

    def prune(t: pa.Table) -> pa.Table:
        c = np.asarray(t.column("cell_id"))
        j = np.searchsorted(qcells, c)
        j = np.minimum(j, len(qcells) - 1)
        hit = qcells[j] == c
        return pa.table({"feature_id": t.column("feature_id").filter(pa.array(hit))})

    cand = distinct(
        tiles.map_batches(prune, batch_format="pyarrow", zero_copy_batch=True),
        ["feature_id"], num_parts,
    )

    feat_small = features.map_batches(
        lambda t: t.select(["feature_id", "xs", "ys"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    candidates = join_on_unique(
        feat_small, cand, "feature_id",
        pa.schema([("feature_id", pa.string()),
                   ("xs", pa.list_(pa.float64())), ("ys", pa.list_(pa.float64()))]),
        pa.schema([("feature_id", pa.string())]),
        how="semi", num_parts=num_parts, on_duplicate="any",
    )

    def verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"feature_id": pa.array([], pa.string())})
        xs = t.column("xs").combine_chunks()
        lens = np.asarray(xs.value_lengths(), dtype=np.int64)
        x = np.asarray(xs.flatten())
        y = np.asarray(t.column("ys").combine_chunks().flatten())
        inside = (x >= lon0) & (x <= lon1) & (y >= lat0) & (y <= lat1)
        starts = np.cumsum(lens) - lens
        any_in = np.logical_or.reduceat(
            np.concatenate([inside, [False]]), np.minimum(starts, len(inside))
        )[: len(lens)]
        any_in = any_in & (lens > 0)
        return pa.table(
            {"feature_id": t.column("feature_id").filter(pa.array(any_in))}
        )

    return candidates.map_batches(verify, batch_format="pyarrow", zero_copy_batch=True)
