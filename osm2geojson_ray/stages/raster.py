"""[EXT] Raster ↔ vector conversion on the cell grid (north rule:
"H3/S2 index, point-in-polygon, kNN, raster↔vector").

- rasterize: features → a raster of per-cell feature counts at
  resolution R (density grid).  Pre-aggregated per batch, one
  hash-partitioned reduce — the canonical combiner pattern.
- vectorize: raster cells → square cell-boundary polygon features
  (Polygon per occupied cell, value carried), the inverse mapping.
  Both ends are SQL-replicable for the oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..functions import cells as C
from ..functions.grouping import partition_map


def rasterize(features: ray.data.Dataset, res: int, num_parts: int = 32) -> ray.data.Dataset:
    """(cell_id, n_features) — count of distinct features whose vertices
    touch the cell (vertex cover density)."""

    def local(t: pa.Table) -> pa.Table:
        xs_col = t.column("xs").combine_chunks()
        ys_col = t.column("ys").combine_chunks()
        lens = np.asarray(xs_col.value_lengths().fill_null(0), dtype=np.int64)
        fid = np.repeat(np.arange(t.num_rows), lens)
        cid = C.cell_ids(np.asarray(xs_col.flatten()), np.asarray(ys_col.flatten()), res)
        # distinct (feature, cell) within the batch, then count per cell
        tt = pa.table({"f": pa.array(fid), "cell_id": pa.array(cid)})
        d = tt.group_by(["f", "cell_id"]).aggregate([])
        return (
            d.group_by("cell_id")
            .aggregate([("f", "count")])
            .rename_columns(["cell_id", "n_features"])
        )

    def merge(t: pa.Table) -> pa.Table:
        return (
            t.group_by("cell_id")
            .aggregate([("n_features", "sum")])
            .rename_columns(["cell_id", "n_features"])
        )

    pre = features.map_batches(local, batch_format="pyarrow", zero_copy_batch=True)
    out = partition_map(pre, ["cell_id"], num_parts, merge)
    return out.map_batches(
        lambda t: pa.table(
            {
                "cell_id": t.column("cell_id"),
                "n_features": t.column("n_features").combine_chunks().cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def vectorize(raster: ray.data.Dataset) -> ray.data.Dataset:
    """raster cells → square polygon features (cell bounds, closed ring,
    CCW) carrying the cell value."""

    def f(t: pa.Table) -> pa.Table:
        cid = np.asarray(t.column("cell_id"))
        res, ix, iy = C.cell_components(cid)
        w = 360.0 / np.power(2.0, res)
        h = 180.0 / np.power(2.0, res)
        x0 = -180.0 + ix * w
        y0 = -90.0 + iy * h
        x1 = x0 + w
        y1 = y0 + h
        n = len(cid)
        xs = np.stack([x0, x1, x1, x0, x0], axis=1).ravel()
        ys = np.stack([y0, y0, y1, y1, y0], axis=1).ravel()
        offsets = pa.array(np.arange(0, 5 * n + 1, 5, dtype=np.int32))
        return pa.table(
            {
                "cell_id": t.column("cell_id"),
                "n_features": t.column("n_features"),
                "geom_type": pa.array(["Polygon"] * n, pa.string()),
                "xs": pa.ListArray.from_arrays(offsets, pa.array(xs)),
                "ys": pa.ListArray.from_arrays(offsets, pa.array(ys)),
            }
        )

    return raster.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
