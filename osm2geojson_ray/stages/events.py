"""Event-stream operators: tumbling-window aggregation and gap-based
sessionization over events(event_id, ts, user_id, event_type, value).

Both are single-shuffle: windowed agg pre-aggregates per batch before its
group-by; sessionization hash-partitions by user and runs vectorized
pandas (sort + diff + cumsum) inside each partition."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data

from ..functions.grouping import from_pandas_clean, partition_map


def windowed_agg(events: ray.data.Dataset, num_parts: int = 32) -> ray.data.Dataset:
    """Per (user_id, 1h tumbling window): count + min/max value (exact,
    order-free aggregates).  Combiner inside map_batches, then one
    hash-partitioned reduce."""

    def local(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["window_start"] = df["ts"].dt.floor("h")
        g = df.groupby(["user_id", "window_start"], sort=False).agg(
            n=("event_id", "size"), min_value=("value", "min"), max_value=("value", "max")
        ).reset_index()
        return from_pandas_clean(g)

    def merge(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby(["user_id", "window_start"], sort=False).agg(
            n=("n", "sum"), min_value=("min_value", "min"), max_value=("max_value", "max")
        ).reset_index()
        g["n"] = g["n"].astype("int64")
        return from_pandas_clean(g)

    pre = events.map_batches(local, batch_format="pyarrow", zero_copy_batch=True)
    return partition_map(pre, ["user_id", "window_start"], num_parts, merge)


def sessionize(
    events: ray.data.Dataset, gap_minutes: int = 30, num_parts: int = 32
) -> ray.data.Dataset:
    """Gap-based sessions per user: a new session starts when the time
    since the previous event (ordered by ts, event_id) exceeds the gap.
    session_id is the 1-based session ordinal within the user."""
    gap = pd.Timedelta(minutes=gap_minutes)

    def sess(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        new_user = df["user_id"].ne(df["user_id"].shift())
        gap_break = df["ts"].diff() > gap
        start = new_user | gap_break
        df["session_id"] = start.groupby(df["user_id"].values).cumsum().astype("int64")
        return from_pandas_clean(df[["event_id", "user_id", "session_id"]])

    return partition_map(events, ["user_id"], num_parts, sess)


def lineitem_pricing_summary(lineitem: ray.data.Dataset, num_parts: int = 1) -> ray.data.Dataset:
    """TPC-H Q1-style grouped aggregate over lineitem (exact integer-valued
    sums only, so the oracle compare is bit-stable).

    Combiner inside map_batches (pyarrow group_by per batch) + ONE hash
    exchange — the same shape as windowed_agg.  Replaces the r2 Ray-native
    ``groupby().aggregate()`` whose internal blocks carried inconsistent
    schemas and spammed 'Failed to hash the schemas' / RefBundle warnings
    into every bench tail (VERDICT r2 #7); every block here has the fixed
    (l_returnflag, l_linestatus, sum_qty, n) schema.  ``count`` is over
    l_quantity, which is non-null in lineitem, so it equals count(*).

    ``num_parts=1``: Q1 has exactly 6 groups (3 returnflags × 2
    linestatuses) at EVERY scale, and the combiner reduces each input
    block to ≤6 rows — a single reducer sees ~6·n_blocks tiny rows even
    at 100 TB, and empty hash partitions (which Ray emits as
    empty-schema blocks, re-triggering the warning) can't occur."""
    keys = ["l_returnflag", "l_linestatus"]

    def _shape(g: pa.Table, sum_col: str, n_col: str) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": g.column("l_returnflag"),
                "l_linestatus": g.column("l_linestatus"),
                "sum_qty": g.column(sum_col).combine_chunks().cast(pa.float64()),
                "n": g.column(n_col).combine_chunks().cast(pa.int64()),
            }
        )

    def local(t: pa.Table) -> pa.Table:
        g = t.group_by(keys).aggregate([("l_quantity", "sum"), ("l_quantity", "count")])
        return _shape(g, "l_quantity_sum", "l_quantity_count")

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by(keys).aggregate([("sum_qty", "sum"), ("n", "sum")])
        return _shape(g, "sum_qty_sum", "n_sum")

    pre = lineitem.map_batches(local, batch_format="pyarrow", zero_copy_batch=True)
    return partition_map(pre, keys, num_parts, merge)
