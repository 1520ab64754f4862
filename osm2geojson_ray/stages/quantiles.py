"""Distributed EXACT grouped quantiles (percentile_disc semantics) via
histogram quickselect — the order-statistic counterpart of the engine's
bounded driver-round loops (``tiling.knn_distributed``'s pattern).

A global quantile is an order statistic; a naive plan global-sorts the
value column (an all-to-all on every byte).  Instead each round is a
MAP-ONLY full pass emitting, per (group, q) task, a fixed-width
histogram over the current candidate interval plus an exact
below-interval count, partially merged in-cluster to one tiny row per
task; the driver narrows each rank's interval to the bin containing it.
Interval population shrinks ~``bins``× per round, so 10^12 rows need ~3
passes before the final bounded gather (≤ ``gather_cap`` values per
task) resolves the exact element.  Nothing unbounded ever reaches the
driver.  Histograms are computed once per DISTINCT (group, interval) —
a group's qs share their interval until their quickselect paths diverge
— and the per-round pass is a plain task fn (an actor pool would pay
startup every round for a closure that is a few dozen tuples).

Float-resolution edges are exact, not best-effort: each round
recomputes its strict below-``lo`` count in the same pass as the
histogram (no accumulated boundary error — bin membership and the next
round's interval predicate use identical comparisons), a degenerate
interval (single representable value) IS its answer without any gather
— the duplicate-value-skew short-circuit — and a 1-ulp-wide interval
splits into its exactly two representable values ("pair mode"), so
convergence never stalls on dense float populations.

Rank semantics match DuckDB ``quantile_disc``: 1-indexed rank
``ceil(q * n)`` computed in double precision, returning an actual
element of the column (bit-stable vs the SQL oracle — no interpolation).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..functions.grouping import partition_map


def _hist_rows(task_id, n_below, counts, width: int) -> pa.Table:
    """Fixed (task_id, n_below, counts[width]) block schema; per-task
    counts shorter than ``width`` are zero-padded."""
    padded = [
        np.concatenate([c, np.zeros(width - len(c), np.int64)]) for c in counts
    ]
    return pa.table(
        {
            "task_id": pa.array(np.asarray(task_id, np.int64)),
            "n_below": pa.array(np.asarray(n_below, np.int64)),
            "counts": pa.FixedSizeListArray.from_arrays(
                pa.array(
                    np.concatenate(padded).astype(np.int64)
                    if padded
                    else np.zeros(0, np.int64)
                ),
                width,
            ),
        }
    )


def _inside(v: np.ndarray, lo: float, hi: float, closed: bool) -> np.ndarray:
    return (v >= lo) & ((v <= hi) if closed else (v < hi))


def _group_codes(t: pa.Table, group_col: str):
    """(int32 codes, {group_value: code}) for a batch — group masks then
    cost one vectorized int compare instead of Python-object equality
    over a string column (the naive ``np_strings == g`` is ~100× slower
    on 1M-row batches)."""
    enc = t.column(group_col).combine_chunks().dictionary_encode()
    codes = np.asarray(enc.indices)
    mapping = {v: i for i, v in enumerate(enc.dictionary.to_pylist())}
    return codes, mapping


def grouped_quantiles(
    ds: ray.data.Dataset,
    value_col: str,
    group_col: str,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    bins: int = 1024,
    gather_cap: int = 65536,
    num_parts: int = 8,
    max_rounds: int = 64,
) -> pa.Table:
    """Exact per-group quantiles of ``value_col`` → (group, q, value),
    sorted by (group, q).  The result is bounded (groups × qs rows) so
    it returns an in-memory Arrow table.

    Assumes ``value_col`` is non-null/finite and group cardinality is
    bounded (each round's merged histogram is one tiny row per task).
    """
    base = ds.select_columns([group_col, value_col]).materialize()

    # pass 0: per-group count/min/max (combiner + one tiny exchange)
    def stats_local(t: pa.Table) -> pa.Table:
        g = t.group_by([group_col]).aggregate(
            [(value_col, "count"), (value_col, "min"), (value_col, "max")]
        )
        return pa.table(
            {
                "g": g.column(group_col),
                "n": g.column(f"{value_col}_count").combine_chunks().cast(pa.int64()),
                "lo": g.column(f"{value_col}_min").combine_chunks().cast(pa.float64()),
                "hi": g.column(f"{value_col}_max").combine_chunks().cast(pa.float64()),
            }
        )

    def stats_merge(t: pa.Table) -> pa.Table:
        g = t.group_by(["g"]).aggregate([("n", "sum"), ("lo", "min"), ("hi", "max")])
        return pa.table(
            {
                "g": g.column("g"),
                "n": g.column("n_sum").combine_chunks().cast(pa.int64()),
                "lo": g.column("lo_min"),
                "hi": g.column("hi_max"),
            }
        )

    stats = partition_map(
        base.map_batches(stats_local, batch_format="pyarrow", zero_copy_batch=True),
        ["g"], num_parts, stats_merge,
    ).take_all()  # bounded: one row per group

    tasks = []
    for srow in sorted(stats, key=lambda r: r["g"]):
        for q in qs:
            tasks.append(
                {
                    "g": srow["g"], "q": q,
                    "rank": int(math.ceil(q * srow["n"])),  # 1-indexed
                    "lo": float(srow["lo"]), "hi": float(srow["hi"]),
                    "n_in": int(srow["n"]), "closed": True, "value": None,
                }
            )

    def check_degenerate(t) -> bool:
        # single representable value in the interval ⇒ it IS the answer,
        # however many duplicate rows sit inside (the skew short-circuit)
        if t["value"] is None and (
            t["lo"] == t["hi"]
            or (not t["closed"] and t["hi"] == np.nextafter(t["lo"], np.inf))
        ):
            t["value"] = t["lo"]
        return t["value"] is not None

    def task_edges(t) -> tuple[np.ndarray, bool]:
        """(strictly increasing bin edges, pair_mode).  Pair mode: the
        interval is exactly two adjacent floats {lo, hi} — count each."""
        e = np.unique(np.linspace(t["lo"], t["hi"], bins + 1))
        if len(e) >= 3:
            return e, False
        return np.array([t["lo"], t["hi"]]), True

    def active():
        return [
            t for t in tasks
            if not check_degenerate(t) and t["n_in"] > gather_cap
        ]

    rounds = 0
    act = active()
    while act and rounds < max_rounds:
        rounds += 1
        act_ids = {id(t) for t in act}
        # one histogram per DISTINCT (group, interval) — the qs of a
        # group share their interval until the quickselect paths diverge
        # (always in round 1), so this cuts the per-batch work ~|qs|×
        spec: list = []
        spec_of: dict = {}
        for i, t in enumerate(tasks):
            if id(t) not in act_ids:
                continue
            sig = (t["g"], t["lo"], t["hi"], t["closed"])
            if sig not in spec_of:
                edges, pair = task_edges(t)
                spec_of[sig] = len(spec)
                spec.append((len(spec), t["g"], edges, t["closed"], pair))
            si = spec_of[sig]
            _, _, edges, _, pair = spec[si]
            t["_edges"], t["_pair"], t["_spec"] = edges, pair, si

        # plain task fn, not an actor pool: the spec closure is tiny and
        # a fresh pool per round would cost actor startup every round
        def hist_fn(t: pa.Table, spec=spec) -> pa.Table:
            codes, code_of = _group_codes(t, group_col)
            vv = np.asarray(t.column(value_col))
            tid, nb, cnts = [], [], []
            for i, g, edges, closed, pair in spec:
                v = vv[codes == code_of.get(g, -1)]
                lo, hi = float(edges[0]), float(edges[-1])
                inn = v[_inside(v, lo, hi, closed)]
                if pair:
                    c = np.array(
                        [np.count_nonzero(inn == lo),
                         np.count_nonzero(inn == hi)],
                        np.int64,
                    )
                else:
                    c, _ = np.histogram(inn, bins=edges)
                    if not closed:
                        # np.histogram closes the right edge; ours is open
                        c[-1] -= int(np.count_nonzero(inn == hi))
                tid.append(i)
                nb.append(int(np.count_nonzero(v < lo)))
                cnts.append(c.astype(np.int64))
            return _hist_rows(tid, nb, cnts, bins)

        def merge_hist(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return _hist_rows([], [], [], bins)
            tid = np.asarray(t.column("task_id"))
            nb = np.asarray(t.column("n_below"))
            mat = np.asarray(
                t.column("counts").combine_chunks().flatten()
            ).reshape(t.num_rows, bins)
            order = np.argsort(tid, kind="stable")
            uniq, starts = np.unique(tid[order], return_index=True)
            summed = np.add.reduceat(mat[order], starts.astype(np.int64), axis=0)
            nb_sum = np.add.reduceat(nb[order], starts.astype(np.int64))
            return _hist_rows(uniq, nb_sum, list(summed), bins)

        hist = partition_map(
            base.map_batches(hist_fn, batch_format="pyarrow", zero_copy_batch=True),
            ["task_id"], 1, merge_hist,
        ).take_all()  # bounded: one row per distinct (group, interval)

        row_of = {int(row["task_id"]): row for row in hist}
        for t in act:
            row = row_of[t["_spec"]]
            target = t["rank"] - int(row["n_below"])
            counts = np.asarray(row["counts"], np.int64)
            if t["_pair"]:
                t["value"] = t["lo"] if target <= counts[0] else t["hi"]
                continue
            edges = t["_edges"]
            nb_bins = len(edges) - 1
            cum = np.cumsum(counts[:nb_bins])
            j = int(np.searchsorted(cum, target, side="left"))
            t["lo"], t["hi"] = float(edges[j]), float(edges[j + 1])
            t["closed"] = t["closed"] and (j == nb_bins - 1)
            t["n_in"] = int(counts[j])
        act = active()

    # final pass: bounded gather of each unresolved task's interval
    # values + the same-pass exact strict below-count (flag column
    # separates count rows from value rows; one fixed block schema)
    rem = [t for t in tasks if t["value"] is None]
    if rem:
        # gather once per DISTINCT (group, interval); sibling qs that
        # landed in the same bin share the gathered values
        rem_spec: list = []
        rem_of: dict = {}
        for t in rem:
            sig = (t["g"], t["lo"], t["hi"], t["closed"])
            if sig not in rem_of:
                rem_of[sig] = len(rem_spec)
                rem_spec.append((len(rem_spec), t["g"], t["lo"], t["hi"], t["closed"]))
            t["_spec"] = rem_of[sig]

        def gather_fn(t: pa.Table, spec=rem_spec) -> pa.Table:
            codes, code_of = _group_codes(t, group_col)
            vv = np.asarray(t.column(value_col))
            tid, val, isc = [], [], []
            for i, g, lo, hi, closed in spec:
                v = vv[codes == code_of.get(g, -1)]
                picked = v[_inside(v, lo, hi, closed)]
                tid.append(np.full(len(picked) + 1, i, np.int64))
                val.append(
                    np.concatenate([picked, [float(np.count_nonzero(v < lo))]])
                )
                isc.append(
                    np.concatenate([np.zeros(len(picked), np.int8), [1]])
                )
            return pa.table(
                {
                    "task_id": pa.array(
                        np.concatenate(tid)
                        if tid else np.zeros(0, np.int64)
                    ),
                    "value": pa.array(
                        np.concatenate(val)
                        if val else np.zeros(0, np.float64)
                    ),
                    "is_count": pa.array(
                        np.concatenate(isc).astype(np.int8)
                        if isc else np.zeros(0, np.int8)
                    ),
                }
            )

        rows = base.map_batches(
            gather_fn, batch_format="pyarrow", zero_copy_batch=True,
        ).take_all()  # bounded: ≤ gather_cap + n_blocks rows per spec entry
        vals: dict[int, list] = {i: [] for i, *_ in rem_spec}
        below: dict[int, int] = {i: 0 for i, *_ in rem_spec}
        for r in rows:
            if r["is_count"]:
                below[r["task_id"]] += int(r["value"])
            else:
                vals[r["task_id"]].append(r["value"])
        arrs = {i: np.sort(np.asarray(v, np.float64)) for i, v in vals.items()}
        for t in rem:
            si = t["_spec"]
            t["value"] = float(arrs[si][t["rank"] - below[si] - 1])

    return pa.table(
        {
            group_col: pa.array([t["g"] for t in tasks]),
            "q": pa.array([t["q"] for t in tasks], pa.float64()),
            "value": pa.array([t["value"] for t in tasks], pa.float64()),
        }
    )
