"""Relational pipelines over the TPC-H-ish driver tables — the engine's
generic join/aggregate machinery exercised outside the OSM DAG, one
query per join strategy, each the scale-correct choice for its side
sizes:

- ``orders_revenue_topn``: Q3-shaped 3-table join (customer ⋈ orders ⋈
  lineitem).  Every side is data-sized (at 100 TB none fits one
  worker), so each join is the single-exchange hash co-group
  (``join_on_unique``); revenue is pre-aggregated per order INSIDE
  ``map_batches`` (combiner) before any exchange, and the top-N is a
  per-block local top-N followed by one tiny single-block merge — never
  a global sort.
- ``customer_enrich``: nation (25 rows) and region (5 rows) are bounded
  at EVERY scale, so the lookup is composed once on the driver and
  shipped once per actor via closure capture — no shuffle.

Revenue uses exact integer cents (``round(price*100) * (100 -
round(discount*100))``) so the grouped sums are order-independent and
bit-stable against the SQL oracle — float accumulation would depend on
partitioning.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..functions.grouping import partition_map
from ..functions.joins import cogroup_apply, join_on_unique, join_unique_np

REV_SCHEMA = pa.schema([("o_orderkey", pa.int64()), ("revenue_c", pa.int64())])
TOPN_SCHEMA = pa.schema(
    [("o_orderkey", pa.int64()), ("o_orderdate", pa.timestamp("us")),
     ("revenue_c", pa.int64())]
)


def _round_half_up_cents(x: np.ndarray) -> np.ndarray:
    # matches SQL ROUND (half away from zero; all values here are >= 0)
    return np.floor(x * 100.0 + 0.5).astype(np.int64)


def _rev_shape(g: pa.Table, sum_col: str) -> pa.Table:
    return pa.table(
        {
            "o_orderkey": g.column("o_orderkey").combine_chunks().cast(pa.int64()),
            "revenue_c": g.column(sum_col).combine_chunks().cast(pa.int64()),
        }
    )


def _revenue_local(t: pa.Table) -> pa.Table:
    """Block-local revenue combiner: exact integer-cent revenue partials
    per order — the oracle-parity rounding contract (SQL ROUND, half away
    from zero) lives HERE and only here; both order_revenue and
    orders_revenue_topn call it."""
    ep = np.asarray(t.column("l_extendedprice"))
    disc = np.asarray(t.column("l_discount"))
    rev = _round_half_up_cents(ep) * (100 - _round_half_up_cents(disc))
    tb = pa.table(
        {"o_orderkey": t.column("l_orderkey"), "revenue_c": pa.array(rev)}
    )
    return _rev_shape(tb.group_by(["o_orderkey"]).aggregate([("revenue_c", "sum")]),
                      "revenue_c_sum")


def order_revenue(lineitem: ray.data.Dataset, num_parts: int = 32) -> ray.data.Dataset:
    """lineitem → (o_orderkey, revenue_c): exact integer-cent revenue per
    order.  Combiner inside each input block (≤ distinct-orders rows leave
    a block), then ONE hash exchange merges partials."""

    def merge(t: pa.Table) -> pa.Table:
        return _rev_shape(t.group_by(["o_orderkey"]).aggregate([("revenue_c", "sum")]),
                          "revenue_c_sum")

    pre = lineitem.map_batches(_revenue_local, batch_format="pyarrow", zero_copy_batch=True)
    return partition_map(pre, ["o_orderkey"], num_parts, merge)


def orders_revenue_topn(
    lineitem: ray.data.Dataset,
    orders: ray.data.Dataset,
    customer: ray.data.Dataset,
    segment: str = "BUILDING",
    cutoff: str = "1998-01-01",
    top_n: int = 10,
    num_parts: int = 32,
    semi_mode: str = "auto",
    broadcast_max: int = 2_000_000,
) -> ray.data.Dataset:
    """Top-``top_n`` orders by revenue among orders placed before
    ``cutoff`` by customers in ``segment`` — (o_orderkey, o_orderdate,
    revenue_c), revenue over ALL the order's lineitems.

    ONE exchange when the filtered customer side is small (r4; was four
    in r3, two after the r4 fusion — each ``partition_map`` is a
    sort+coalesce all-to-all, and the fixed per-exchange cost dominated
    the query at small scale while extra exchanges are pure waste at
    any scale):

    1. lineitem's per-block revenue partials and the filtered orders
       are co-partitioned on ``o_orderkey`` in ONE tagged-union
       exchange; inside each partition the partials merge (final
       per-order sums) and immediately join the unique orders side.
    2. the customer semi-join. ``semi_mode='auto'`` counts the
       segment's keys first (a pass over the small customer table):
       ≤ ``broadcast_max`` keys → BROADCAST (sorted int64 key array
       ``ray.put`` once, ``ray.get`` zero-copy in each partition task)
       fused into exchange 1's partition fn together with the local
       top-N, so no second exchange exists at all; above the gate →
       the re-key exchange on ``o_custkey`` (the 100-TB fallback when
       the segment's customer list itself is shuffle-sized).  At most
       ``top_n`` rows per partition reach the single-block final merge
       either way.
    """
    cut = np.datetime64(cutoff, "us")

    pre = lineitem.map_batches(_revenue_local, batch_format="pyarrow", zero_copy_batch=True)

    def orders_filter(t: pa.Table) -> pa.Table:
        keep = pc.less(t.column("o_orderdate"), pa.scalar(cut, pa.timestamp("us")))
        return t.filter(keep).select(["o_orderkey", "o_custkey", "o_orderdate"])

    orders_f = orders.map_batches(orders_filter, batch_format="pyarrow", zero_copy_batch=True)
    orders_schema = pa.schema(
        [("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
         ("o_orderdate", pa.timestamp("us"))]
    )

    def merge_join(lt: pa.Table, rt: pa.Table) -> pa.Table:
        merged = _rev_shape(
            lt.group_by(["o_orderkey"]).aggregate([("revenue_c", "sum")]),
            "revenue_c_sum",
        )
        return join_unique_np(
            merged, rt, "o_orderkey", ["revenue_c"], ["o_custkey", "o_orderdate"]
        )

    def cust_filter(t: pa.Table) -> pa.Table:
        keep = pc.equal(t.column("c_mktsegment"), segment)
        return pa.table({"o_custkey": t.filter(keep).column("c_custkey")})

    def cust_dedup(t: pa.Table) -> pa.Table:
        return pa.table({"o_custkey": pc.unique(t.column("o_custkey"))})

    # per-batch local key dedup (combiner): bounds what the broadcast path
    # may pull to the driver and shrinks the exchange path's small side —
    # the gate then counts (near-)distinct KEYS, not filtered rows
    # (ADVICE r4: a segment with many duplicate custkeys was pushed to
    # the exchange path unnecessarily)
    cust_f = customer.map_batches(
        cust_filter, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(cust_dedup, batch_format="pyarrow", zero_copy_batch=True)

    if semi_mode not in ("auto", "broadcast", "exchange"):
        raise ValueError(f"semi_mode must be 'auto', 'broadcast' or 'exchange', got {semi_mode!r}")
    if semi_mode in ("auto", "broadcast"):
        cf_mat = cust_f.materialize()
        n_keys = cf_mat.count()  # upper bound: cross-block dups remain
        if n_keys > broadcast_max:
            # one SMALL-side exchange for the exact distinct count — far
            # cheaper than mis-routing the big side, and its output is
            # the deduped key table both paths want
            from ..functions.grouping import distinct

            cf_mat = distinct(cf_mat, ["o_custkey"], num_parts=num_parts).materialize()
            n_keys = cf_mat.count()
        cust_f = cf_mat
        if semi_mode == "auto":
            semi_mode = "broadcast" if n_keys <= broadcast_max else "exchange"
        elif n_keys > broadcast_max:
            # ADVICE r4: the explicit-broadcast path had NO size guard —
            # a caller forcing broadcast on a shuffle-sized segment would
            # OOM the driver pulling every block
            raise ValueError(
                f"semi_mode='broadcast' with {n_keys} distinct segment keys "
                f"> broadcast_max={broadcast_max}: use semi_mode='exchange' "
                f"(or raise broadcast_max if the driver can hold the keys)"
            )

    joined_schema = pa.schema(
        [("o_orderkey", pa.int64()), ("revenue_c", pa.int64()),
         ("o_custkey", pa.int64()), ("o_orderdate", pa.timestamp("us"))]
    )

    def local_topn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"o_orderkey": pa.array([], pa.int64()),
                 "o_orderdate": pa.array([], pa.timestamp("us")),
                 "revenue_c": pa.array([], pa.int64())}
            )
        rev_np = np.asarray(t.column("revenue_c"))
        okey = np.asarray(t.column("o_orderkey"))
        order = np.lexsort((okey, -rev_np))[:top_n]
        taken = t.take(pa.array(order))
        return pa.table(
            {"o_orderkey": taken.column("o_orderkey"),
             "o_orderdate": taken.column("o_orderdate"),
             "revenue_c": taken.column("revenue_c")}
        )

    def _member_topn(lt: pa.Table, keys: np.ndarray) -> pa.Table:
        ck = np.asarray(lt.column("o_custkey")) if lt.num_rows else np.empty(0, np.int64)
        if len(keys) == 0 or len(ck) == 0:
            return local_topn(lt.slice(0, 0))
        pos = np.minimum(np.searchsorted(keys, ck), len(keys) - 1)
        return local_topn(lt.filter(pa.array(keys[pos] == ck)))

    if semi_mode == "broadcast":
        # the segment's key set is bounded: sorted int64 array, put ONCE,
        # zero-copy ray.get in every partition task — the semi-join and
        # the local top-N fuse into exchange 1's partition fn, so the
        # whole query is a single all-to-all
        import ray as _ray

        # skip empty blocks: a map_batches task whose output had 0 rows
        # yields a ZERO-COLUMN empty block (no schema), so reading
        # "o_custkey" from it raises KeyError
        keys = np.unique(
            np.concatenate(
                [
                    np.asarray(t.column("o_custkey"))
                    for t in _ray.get(cust_f.to_arrow_refs())
                    if t.num_rows
                ]
                or [np.empty(0, np.int64)]
            )
        )
        keys_ref = _ray.put(keys)

        def merge_join_bcast(lt: pa.Table, rt: pa.Table) -> pa.Table:
            return _member_topn(merge_join(lt, rt), _ray.get(keys_ref))

        sel = cogroup_apply(
            pre, orders_f, "o_orderkey", REV_SCHEMA, orders_schema,
            merge_join_bcast, num_parts=num_parts,
        )
    else:
        with_orders = cogroup_apply(
            pre, orders_f, "o_orderkey", REV_SCHEMA, orders_schema,
            merge_join, num_parts=num_parts,
        )

        def semi_topn(lt: pa.Table, rt: pa.Table) -> pa.Table:
            keys = (
                np.unique(np.asarray(rt.column("o_custkey")))
                if rt.num_rows else np.empty(0, np.int64)
            )
            return _member_topn(lt, keys)

        # re-key exchange fuses semi-join + per-partition top-N (≤ top_n rows
        # leave any partition) → one-block final merge
        sel = cogroup_apply(
            with_orders, cust_f, "o_custkey", joined_schema,
            pa.schema([("o_custkey", pa.int64())]), semi_topn, num_parts=num_parts,
        )
    return sel.repartition(1).map_batches(
        local_topn, batch_format="pyarrow", zero_copy_batch=True
    )


def customer_enrich(
    customer: ray.data.Dataset,
    nation: pa.Table,
    region: pa.Table,
    concurrency=(1, 8),
) -> ray.data.Dataset:
    """customer → (c_custkey, c_name, c_mktsegment, n_name, r_name) via a
    BROADCAST of the bounded nation⋈region lookup: composed once on the
    driver (30 rows), shipped once per actor (closure capture — ``ray.put``
    refs are for big broadcasts like the kNN centroid matrix) — the
    small-side join strategy (no shuffle, contrast with
    ``orders_revenue_topn``'s data-sized hash joins)."""
    rk = np.asarray(region.column("r_regionkey"), dtype=np.int64)
    r_order = np.argsort(rk)
    rnames = np.asarray(region.column("r_name").to_pylist(), dtype=object)[r_order]
    nk = np.asarray(nation.column("n_nationkey"), dtype=np.int64)
    n_order = np.argsort(nk)
    nk_sorted = nk[n_order]
    nnames = np.asarray(nation.column("n_name").to_pylist(), dtype=object)[n_order]
    n_regionkey = np.asarray(nation.column("n_regionkey"), dtype=np.int64)[n_order]
    n_rnames = rnames[np.searchsorted(rk[r_order], n_regionkey)]
    lookup = (nk_sorted, nnames, n_rnames)  # ≤25 rows: closure capture,
    # not ray.put — broadcast refs are for big state (see tiling/kNN)

    class Enrich:
        def __init__(self) -> None:
            self.nk, self.nn, self.rn = lookup

        def __call__(self, t: pa.Table) -> pa.Table:
            ck = np.asarray(t.column("c_nationkey")).astype(np.int64)
            idx = np.searchsorted(self.nk, ck)
            idx = np.minimum(idx, len(self.nk) - 1)
            matched = self.nk[idx] == ck
            sel = pa.array(matched)
            idx = idx[matched]
            return pa.table(
                {
                    "c_custkey": t.column("c_custkey").filter(sel),
                    "c_name": t.column("c_name").filter(sel),
                    "c_mktsegment": t.column("c_mktsegment").filter(sel),
                    "n_name": pa.array(self.nn[idx], pa.string()),
                    "r_name": pa.array(self.rn[idx], pa.string()),
                }
            )

    return customer.map_batches(
        Enrich, batch_format="pyarrow", zero_copy_batch=True, concurrency=concurrency
    )


def top_orders_per_customer(
    orders: ray.data.Dataset, k: int = 3, num_parts: int = 32
) -> ray.data.Dataset:
    """Per-group top-k: each customer's ``k`` highest-value orders —
    (o_custkey, o_orderkey, o_totalprice, rnk), ties broken by
    o_orderkey ascending so the result is deterministic.

    Top-k per group commutes with union, so the per-BLOCK top-k runs
    first (≤ k rows per group leave any input block — the combiner
    trick applied to an order statistic), then ONE hash exchange on
    o_custkey and the same kernel finalizes.  No global sort; group
    count bounds reducer input at k·n_blocks rows per group worst case.
    """

    def local(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"o_custkey": pa.array([], pa.int64()),
                 "o_orderkey": pa.array([], pa.int64()),
                 "o_totalprice": pa.array([], pa.float64()),
                 "rnk": pa.array([], pa.int64())}
            )
        df = (
            t.select(["o_custkey", "o_orderkey", "o_totalprice"])
            .to_pandas()
            .sort_values(
                ["o_custkey", "o_totalprice", "o_orderkey"],
                ascending=[True, False, True], kind="mergesort",
            )
        )
        topk = df.groupby("o_custkey", sort=False).head(k).copy()
        topk["rnk"] = topk.groupby("o_custkey", sort=False).cumcount() + 1
        out = pa.Table.from_pandas(topk, preserve_index=False)
        return pa.table(
            {"o_custkey": out.column("o_custkey"),
             "o_orderkey": out.column("o_orderkey"),
             "o_totalprice": out.column("o_totalprice"),
             "rnk": out.column("rnk").combine_chunks().cast(pa.int64())}
        )

    pre = orders.map_batches(local, batch_format="pyarrow", zero_copy_batch=True)
    return partition_map(pre, ["o_custkey"], num_parts, local)


def orders_without_lineitems(
    orders: ray.data.Dataset, lineitem: ray.data.Dataset, num_parts: int = 32
) -> ray.data.Dataset:
    """ANTI join: orders with no lineitem rows — (o_orderkey,
    o_orderstatus).

    The build side is keys-only (l_orderkey), pre-deduped per block with
    a zero-exchange combiner: existence filters don't need a global
    distinct, and cross-block duplicate keys are collapsed by the join's
    ``on_duplicate='any'`` (np.unique on the key array, zero digest
    work — a keys-only build side makes the winner unobservable, and
    cross-block dupes are the COMMON case here, not a corpus defect, so
    the 'first' digest path would be O(dup rows) of wasted Python per
    reducer).  One hash exchange total, key bytes only on the build
    side."""

    def key_combiner(t: pa.Table) -> pa.Table:
        k = np.unique(np.asarray(t.column("l_orderkey")))
        return pa.table({"o_orderkey": pa.array(k, pa.int64())})

    keys = lineitem.map_batches(key_combiner, batch_format="pyarrow", zero_copy_batch=True)
    return join_on_unique(
        orders, keys, "o_orderkey",
        pa.schema([("o_orderkey", pa.int64()), ("o_orderstatus", pa.string())]),
        pa.schema([("o_orderkey", pa.int64())]),
        how="anti", num_parts=num_parts, on_duplicate="any",
    )
