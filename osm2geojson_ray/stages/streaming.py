"""Streaming tumbling-window aggregation with incremental actor state —
the one operator family where the engine drops to RAW Ray actors, as the
Dataset API cannot express state that must live ACROSS micro-batches.

Ray Data has no event-time watermarks; the stream is modeled as what it
is in production: an ordered sequence of micro-batches (log segments /
parquet files).  A fixed pool of ``WindowBucket`` actors holds the open
windows for its hash-share of users; each micro-batch is routed
bucket-wise by parallel Ray TASKS (the driver never touches row data —
it only sequences segment ids and collects tiny finalized-window
refs).  After each micro-batch the watermark advances to ``max(ts seen)
- allowed_lateness`` and every strictly-older window is finalized and
emitted EXACTLY ONCE; end-of-stream flushes the rest.

Determinism: window aggregates (count/min/max) are commutative, so
within-segment order doesn't matter; the segment sequence is the log
order.  With ``allowed_lateness`` ≥ the log's max disorder, emitted
results equal the batch operator's (``events.windowed_agg``) — pinned
by test and by the same SQL oracle.

Scale shape: actor state is bounded by OPEN windows only (~users ×
windows-per-lateness-horizon, not the stream length); finalized rows
leave the actor every round.  Buckets are the unit of parallelism —
size ``num_buckets`` to the cluster, salt hot users across buckets by
(user, window) if one user's open-window set outgrows an actor.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

_EMPTY = pa.table(
    {
        "user_id": pa.array([], pa.int64()),
        "window_start": pa.array([], pa.timestamp("us")),
        "n": pa.array([], pa.int64()),
        "min_value": pa.array([], pa.float64()),
        "max_value": pa.array([], pa.float64()),
    }
)


@ray.remote
class WindowBucket:
    """Open-window state for one hash-share of users.

    ``ingest`` merges a micro-batch slice (pre-aggregated per (user,
    window) by the routing task) into the open set; ``finalize``
    emits and drops every window strictly older than the watermark."""

    def __init__(self) -> None:
        self.state: dict[tuple[int, int], list] = {}  # (user, win_us) -> [n, mn, mx]

    def ingest(self, t: pa.Table) -> None:
        u = np.asarray(t.column("user_id"))
        w = np.asarray(t.column("window_start").cast(pa.int64()))
        n = np.asarray(t.column("n"))
        mn = np.asarray(t.column("min_value"))
        mx = np.asarray(t.column("max_value"))
        for i in range(t.num_rows):  # rows here are per-(user,window)
            # partials from ONE micro-batch slice — bounded, not raw events
            key = (int(u[i]), int(w[i]))
            s = self.state.get(key)
            if s is None:
                self.state[key] = [int(n[i]), float(mn[i]), float(mx[i])]
            else:
                s[0] += int(n[i])
                s[1] = min(s[1], float(mn[i]))
                s[2] = max(s[2], float(mx[i]))

    def finalize(self, watermark_us: int) -> pa.Table:
        done = [k for k in self.state if k[1] + 3_600_000_000 <= watermark_us]
        if not done:
            return _EMPTY
        rows = sorted(done)
        out = pa.table(
            {
                "user_id": pa.array([k[0] for k in rows], pa.int64()),
                "window_start": pa.array(
                    np.array([k[1] for k in rows], np.int64).view("datetime64[us]"),
                    pa.timestamp("us"),
                ),
                "n": pa.array([self.state[k][0] for k in rows], pa.int64()),
                "min_value": pa.array([self.state[k][1] for k in rows], pa.float64()),
                "max_value": pa.array([self.state[k][2] for k in rows], pa.float64()),
            }
        )
        for k in done:
            del self.state[k]
        return out

    def flush(self) -> pa.Table:
        return self.finalize(np.iinfo(np.int64).max)


@ray.remote
def _route_segment(path: str, num_buckets: int, actors: list) -> int:
    """Read one log segment, pre-aggregate per (user, 1h window), route
    each bucket's slice to its actor.  Returns the segment's max ts —
    the only thing the driver sees."""
    import pyarrow.parquet as pq

    t = pq.read_table(path, columns=["user_id", "ts", "value"])
    if t.num_rows == 0:
        return np.iinfo(np.int64).min
    df = t.to_pandas()
    df["window_start"] = df["ts"].dt.floor("h")
    g = (
        df.groupby(["user_id", "window_start"], sort=False)
        .agg(n=("value", "size"), min_value=("value", "min"), max_value=("value", "max"))
        .reset_index()
    )
    g["bucket"] = g["user_id"].to_numpy() % num_buckets
    waits = []
    for b, sub in g.groupby("bucket", sort=False):
        tb = pa.Table.from_pandas(sub.drop(columns=["bucket"]), preserve_index=False)
        waits.append(actors[int(b)].ingest.remote(tb))
    ray.get(waits)  # segment fully ingested before its watermark advances
    return int(df["ts"].max().value // 1000)  # ns -> us


def streaming_windowed_agg(
    segment_paths: list[str],
    num_buckets: int = 8,
    allowed_lateness_hours: int = 1,
) -> pa.Table:
    """Run the stream: per segment — parallel route tasks, then advance
    the watermark and collect finalized windows; end-of-stream flush.
    Returns the concatenated finalized windows (bounded per round; a
    production sink would write each round's tables straight to
    partitioned parquet instead of concatenating)."""
    actors = [WindowBucket.remote() for _ in range(num_buckets)]
    late_us = allowed_lateness_hours * 3_600_000_000
    out: list[pa.Table] = []
    watermark = np.iinfo(np.int64).min
    for path in segment_paths:
        seg_max = ray.get(_route_segment.remote(path, num_buckets, actors))
        if seg_max > watermark - late_us:
            watermark = max(watermark, seg_max - late_us)
            tabs = ray.get([a.finalize.remote(watermark) for a in actors])
            out.extend(t for t in tabs if t.num_rows)
    tabs = ray.get([a.flush.remote() for a in actors])
    out.extend(t for t in tabs if t.num_rows)
    for a in actors:
        ray.kill(a)
    return pa.concat_tables(out) if out else _EMPTY
