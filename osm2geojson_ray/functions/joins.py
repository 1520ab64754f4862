"""Distributed joins that carry nested Arrow columns.

Ray's native ``Dataset.join`` delegates to pyarrow's acero hash join,
which rejects list/struct payload columns — and every joined table in
this engine carries nested tags/nodes/ways columns (SURVEY.md §1.5).  So
the engine brings its own join: both sides are tagged and unioned, hash-
partitioned on the key (``hash(key) % P`` — the same explicit
partitioning the north rule asks for), and joined *inside* each
partition with a sorted ``searchsorted`` alignment, which is pure
numpy/take and therefore supports any column type.

Every join in the reference DAG has one side unique on the key (nodes by
node_id, complete ways by way_id, relations by rel_id — OsmJoin.java
:276 ``left.get(0)``, :331/:380 ``right.get(0)``), so the unique-side
join is the only flavor needed; ``how='inner'`` reproduces the
reference's semi-join drop semantics (SURVEY.md §2.4).

``ray.data.Dataset.join`` remains the right tool for flat-payload joins
and is used where applicable (see stages/tiling.py).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa

import ray.data

from .grouping import partition_map, with_partition_col

SIDE_COL = "__side"


def _null_array(n: int, typ: pa.DataType) -> pa.Array:
    return pa.nulls(n, typ)


def _align(t: pa.Table, schema: pa.Schema) -> pa.Table:
    """Project ``t`` onto ``schema`` (null-filling absent columns).
    Zero-copy: chunked columns pass through untouched; cast only on a
    genuine type mismatch."""
    cols = {}
    for f in schema:
        if f.name in t.column_names:
            col = t.column(f.name)
            if col.type != f.type:
                col = col.cast(f.type)
            cols[f.name] = col
        else:
            cols[f.name] = _null_array(t.num_rows, f.type)
    return pa.table(cols, schema=schema)


def _union_schema(left: pa.Schema, right: pa.Schema, key: str) -> pa.Schema:
    fields = list(left)
    names = {f.name for f in left}
    for f in right:
        if f.name == key:
            continue
        if f.name in names:
            raise ValueError(f"join column collision: {f.name}")
        fields.append(f)
    return pa.schema(fields + [pa.field(SIDE_COL, pa.int8())])


def split_sides(t: pa.Table) -> tuple[pa.Table, pa.Table]:
    """Split a tagged union partition back into (side0, side1) tables."""
    side = t.column(SIDE_COL)
    zero = pa.compute.equal(side, 0)
    lt = t.filter(zero).drop_columns([SIDE_COL]).combine_chunks()
    rt = t.filter(pa.compute.invert(zero)).drop_columns([SIDE_COL]).combine_chunks()
    return lt, rt


def _unique_order(
    ut: pa.Table,
    uk: np.ndarray,
    key: str,
    on_duplicate: str = "error",
    duplicate_rank_cols: Sequence[str] | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Sorted order + keys for the 'unique' join side, which must really
    be unique per key: searchsorted alignment would otherwise silently
    match one arbitrary copy (the reference merge-join iterates all
    same-key entries — EntryJoiningIterable.java).  Duplicate element ids
    (same node/way/rel in two shards) are a corpus defect; the three
    documented routes (ADVICE r2 #2, r3 #1/#2):

    * ``on_duplicate='error'`` (default): fail loudly and
      deterministically instead of emitting run-dependent output.
    * ``on_duplicate='first'``: keep ONE deterministic winner per key —
      by default the copy with the smallest content digest (md5 of the
      row's sorted items), which is independent of shard/block arrival
      order — and drop the rest from the join.  With
      ``duplicate_rank_cols`` (r5, VERDICT r4 #7) the winner is instead
      the row with the lexicographically smallest tuple over those
      columns: threading (xml_md5, doc_id, span_idx) through the unique
      side makes the join's winner rule IDENTICAL to
      ``stages.parse.duplicate_id_rejects``'s loser rule, so the
      winner/rejects pairing holds even when same-id copies parse to
      DIFFERING rows (without it the two rules only coincide when copies
      parse identically — the observed corpus-defect case).
    * ``on_duplicate='any'``: keep an arbitrary (run-deterministic
      within a partitioning, but partition-arrival-dependent) copy with
      NO digest work — only valid when the unique side is keys-only
      (semi/anti existence filters), where the winner's payload never
      reaches the output so the choice is unobservable.
    """
    order = np.argsort(uk, kind="stable")
    uk_sorted = uk[order]
    if len(uk_sorted) <= 1:
        return order, uk_sorted
    eq = uk_sorted[1:] == uk_sorted[:-1]
    if not eq.any():
        return order, uk_sorted
    if on_duplicate == "error":
        dup = uk_sorted[:-1][eq][0]
        raise ValueError(
            f"duplicate key on unique join side ({key}={dup!r}); "
            "dedup the input (e.g. functions.grouping.distinct) first, "
            "or pass on_duplicate='first' to keep a deterministic winner"
        )
    if on_duplicate == "any":
        first = np.ones(len(uk_sorted), dtype=bool)
        first[1:] = ~eq
        return order[first], uk_sorted[first]
    if on_duplicate != "first":
        raise ValueError(
            f"on_duplicate must be 'error', 'first' or 'any', got {on_duplicate!r}"
        )
    dup_mask = np.zeros(len(uk_sorted), dtype=bool)
    dup_mask[1:] |= eq
    dup_mask[:-1] |= eq
    dpos = np.nonzero(dup_mask)[0]
    # rank only the duplicated rows (rare corpus defect — not a hot path).
    # The lexsort runs over ONLY the dpos subset: np.lexsort sorts by its
    # least-significant key across the WHOLE array first, so full-length
    # arrays with filler values would compare fillers against real rank
    # values (int-0 vs str crashed when a partition held both duplicated
    # and unique keys); the subset permutation is then scattered back.
    if duplicate_rank_cols:
        sub = ut.take(pa.array(order[dpos]))
        sub_keys = [
            np.asarray(sub.column(c).to_pandas(), dtype=object)
            for c in duplicate_rank_cols
        ]
        # np.lexsort: LAST key is primary → (least-significant rank col
        # first, …, most-significant rank col, then the join key)
        sub_res = np.lexsort((*reversed(sub_keys), uk_sorted[dpos]))
    else:
        import hashlib

        dig = np.asarray(
            [
                hashlib.md5(repr(sorted(row.items())).encode()).hexdigest()
                for row in ut.take(pa.array(order[dpos])).to_pylist()
            ],
            dtype=object,
        )
        sub_res = np.lexsort((dig, uk_sorted[dpos]))
    res = np.arange(len(uk_sorted))
    res[dpos] = dpos[sub_res]
    uk2 = uk_sorted[res]
    first = np.ones(len(uk2), dtype=bool)
    first[1:] = uk2[1:] != uk2[:-1]
    return order[res][first], uk2[first]


def join_unique_np(
    mt: pa.Table,
    ut: pa.Table,
    key: str,
    m_cols: list[str],
    u_cols: list[str],
    on_duplicate: str = "error",
    duplicate_rank_cols: Sequence[str] | None = None,
) -> pa.Table:
    """In-partition vectorized inner join, right side unique on key —
    sorted searchsorted alignment (numpy + take: supports nested types)."""
    mk = np.asarray(mt.column(key)) if mt.num_rows else np.empty(0, np.int64)
    uk = np.asarray(ut.column(key)) if ut.num_rows else np.empty(0, np.int64)
    order, uk_sorted = _unique_order(ut, uk, key, on_duplicate, duplicate_rank_cols)
    ri = np.searchsorted(uk_sorted, mk)
    ri_clamped = np.minimum(ri, max(len(uk_sorted) - 1, 0))
    if len(uk_sorted) == 0:
        matched = np.zeros(len(mk), dtype=bool)
    else:
        matched = uk_sorted[ri_clamped] == mk
    m_keep = mt.filter(pa.array(matched))
    u_take = ut.take(pa.array(order[ri_clamped[matched]]))
    cols = {key: m_keep.column(key)}
    for n in m_cols:
        cols[n] = m_keep.column(n)
    for n in u_cols:
        cols[n] = u_take.column(n)
    arrays = [
        v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v for v in cols.values()
    ]
    return pa.Table.from_arrays(arrays, names=list(cols))


def cogroup_apply(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key: str,
    left_schema: pa.Schema,
    right_schema: pa.Schema,
    fn,
    num_parts: int = 64,
) -> ray.data.Dataset:
    """The engine's single-exchange co-group: tag + union both sides,
    hash-partition once on ``key``, call ``fn(left_part, right_part)``
    with vectorized per-partition tables.  One shuffle per join stage —
    the minimum the reference DAG admits (6 exchanges total, mirroring
    OsmJoin's 6 sorted-file joins)."""
    full = _union_schema(left_schema, right_schema, key)

    def tag(side: int):
        # partition col is computed here so it fuses into the side's
        # upstream map task — no separate post-union add-part stage
        def _f(t: pa.Table) -> pa.Table:
            t = t.append_column(SIDE_COL, pa.array(np.full(t.num_rows, side, np.int8)))
            return with_partition_col(_align(t, full), [key], num_parts)

        return _f

    unioned = left.map_batches(tag(0), batch_format="pyarrow", zero_copy_batch=True).union(
        right.map_batches(tag(1), batch_format="pyarrow", zero_copy_batch=True)
    )
    left_names = [f.name for f in left_schema]
    right_names = [f.name for f in right_schema]

    def run(t: pa.Table) -> pa.Table:
        lt, rt = split_sides(t)
        return fn(lt.select(left_names), rt.select(right_names))

    return partition_map(unioned, [key], num_parts, run, pre_partitioned=True)


def join_on_unique(
    many: ray.data.Dataset,
    unique: ray.data.Dataset,
    key: str,
    many_schema: pa.Schema,
    unique_schema: pa.Schema,
    how: str = "inner",
    num_parts: int = 64,
    on_duplicate: str = "error",
    duplicate_rank_cols: Sequence[str] | None = None,
) -> ray.data.Dataset:
    """Join ``many`` with ``unique`` (unique per ``key``) on ``key``.

    ``how='inner'`` drops many-rows without a match (reference inner-join
    semantics); ``how='left'`` keeps them with nulls; ``how='semi'`` /
    ``how='anti'`` keep exactly the matched / unmatched many-rows with NO
    unique-side payload (existence filters — the unique side should carry
    only the key so nothing but key bytes moves through the exchange).
    Schemas must be passed explicitly (lazy datasets; avoids a blocking
    schema() call).
    ``on_duplicate``: see ``_unique_order`` ('error' fails loudly on a
    duplicated unique-side key; 'first' keeps a deterministic winner —
    ranked by ``duplicate_rank_cols`` when given, so callers can pair
    the join's winner with the ``duplicate_id_rejects`` loser report).
    """
    full = _union_schema(many_schema, unique_schema, key)
    many_names = [f.name for f in many_schema if f.name != key]
    unique_names = [f.name for f in unique_schema if f.name != key]

    def tag(side: int):
        # partition col fused into the tag map (see cogroup_apply)
        def _f(t: pa.Table) -> pa.Table:
            t = t.append_column(SIDE_COL, pa.array(np.full(t.num_rows, side, np.int8)))
            return with_partition_col(_align(t, full), [key], num_parts)

        return _f

    unioned = many.map_batches(tag(0), batch_format="pyarrow", zero_copy_batch=True).union(
        unique.map_batches(tag(1), batch_format="pyarrow", zero_copy_batch=True)
    )

    def join_part(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        side = np.asarray(t.column(SIDE_COL))
        mt = t.filter(pa.array(side == 0)).combine_chunks()
        ut = t.filter(pa.array(side == 1)).combine_chunks()
        mk = np.asarray(mt.column(key))
        uk = np.asarray(ut.column(key))
        order, uk_sorted = _unique_order(ut, uk, key, on_duplicate, duplicate_rank_cols)
        ri = np.searchsorted(uk_sorted, mk)
        ri_clamped = np.minimum(ri, max(len(uk_sorted) - 1, 0))
        if len(uk_sorted) == 0:
            matched = np.zeros(len(mk), dtype=bool)
        else:
            matched = uk_sorted[ri_clamped] == mk
        if how in ("semi", "anti"):
            m_keep = mt.filter(pa.array(matched if how == "semi" else ~matched))
            cols = {key: m_keep.column(key)}
            for nme in many_names:
                cols[nme] = m_keep.column(nme)
        elif how == "inner":
            m_keep = mt.filter(pa.array(matched))
            u_take = ut.take(pa.array(order[ri_clamped[matched]]))
            cols = {key: m_keep.column(key)}
            for nme in many_names:
                cols[nme] = m_keep.column(nme)
            for nme in unique_names:
                cols[nme] = u_take.column(nme)
        elif how == "left":
            u_idx = order[ri_clamped] if len(uk_sorted) else np.zeros(len(mk), np.int64)
            cols = {key: mt.column(key)}
            for nme in many_names:
                cols[nme] = mt.column(nme)
            matched_pa = pa.array(matched)
            for nme in unique_names:
                taken = ut.take(pa.array(u_idx)) if len(uk_sorted) else None
                col = (
                    taken.column(nme)
                    if taken is not None
                    else _null_array(len(mk), full.field(nme).type)
                )
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                cols[nme] = pa.compute.if_else(matched_pa, col, _null_array(len(mk), col.type))
            # if_else does not support nested types for all versions; guarded in tests
        else:
            raise ValueError(how)
        arrays = []
        for _, v in cols.items():
            arrays.append(v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v)
        return pa.Table.from_arrays(arrays, names=list(cols))

    return partition_map(unioned, [key], num_parts, join_part, pre_partitioned=True)


def compact_nonempty_blocks(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Drop empty blocks from a BOUNDED dataset (materializes it).

    Ray skips the UDF on an already-empty input block and emits a
    ZERO-COLUMN placeholder instead ('new schema: .' warning), so a map
    chain whose intermediate filters a block to 0 rows yields schemaless
    blocks downstream.  The native hash-join aggregator then fails with
    ArrowInvalid ("No match ... FieldRef") when a join partition receives
    ONLY such blocks — which frontier-style datasets (a shrinking
    ``remaining`` set re-joined each round, e.g. knn_distributed) hit as
    soon as most blocks have drained.  Dropping the empties restores an
    all-schema'd block list.  Use on small/frontier intermediates only —
    this pins the dataset; big streaming sides should avoid producing
    empty-block chains instead (first-map outputs keep their schema)."""
    mat = ds.materialize()
    refs, n_empty = [], 0
    for bundle in mat.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if meta.num_rows == 0:
                n_empty += 1
            else:
                refs.append(ref)
    if n_empty == 0 or not refs:
        return mat
    return ray.data.from_arrow_refs(refs)


def flat_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: Sequence[str],
    how: str = "inner",
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Ray-native hash join for flat-payload datasets.  Aggregator remote
    args are overridden so small clusters can't deadlock on actor-pool
    CPU reservations: the per-aggregator share is sized so the WHOLE
    aggregator pool reserves at most ~25% of the cluster's CPUs (capped
    at the old 0.1 flat rate).  A flat 0.1 deadlocked at 2 CPUs with 16
    partitions — 1.6 of 2 cores reserved leaves no whole core for any
    map task, and the join waits on upstream forever.

    Callers feeding a side derived from a SHRINKING frontier should pass
    it through ``compact_nonempty_blocks`` first (see its docstring for
    the zero-column empty-block failure mode)."""
    try:
        avail = float(ray.cluster_resources().get("CPU", 4.0))
    except Exception:
        avail = 4.0
    per_agg = min(0.1, max(0.01, (0.25 * avail) / max(1, num_partitions)))
    return left.join(
        right,
        join_type=how,
        num_partitions=num_partitions,
        on=tuple(on),
        aggregator_ray_remote_args={"num_cpus": per_agg},
    )
