"""Event-stream operators: tumbling-window aggregation and gap-based
sessionization over events(event_id, ts, user_id, event_type, value).

Both are single-shuffle: windowed agg pre-aggregates per batch before its
group-by; sessionization hash-partitions by user and runs vectorized
pandas (sort + diff + cumsum) inside each partition."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data

from ..functions.grouping import partition_map


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
        return pa.Table.from_pandas(g, preserve_index=False)

    def merge(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby(["user_id", "window_start"], sort=False).agg(
            n=("n", "sum"), min_value=("min_value", "min"), max_value=("max_value", "max")
        ).reset_index()
        g["n"] = g["n"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

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
        return pa.Table.from_pandas(
            df[["event_id", "user_id", "session_id"]], preserve_index=False
        )

    return partition_map(events, ["user_id"], num_parts, sess)


def lineitem_pricing_summary(lineitem: ray.data.Dataset) -> ray.data.Dataset:
    """TPC-H Q1-style grouped aggregate over lineitem (exact integer-valued
    sums only, so the oracle compare is bit-stable)."""
    from ray.data.aggregate import Count, Sum

    return (
        lineitem.groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Count(alias_name="n"),
        )
    )
