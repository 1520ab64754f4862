"""Hash-partitioned vectorized co-grouping primitives.

The reference's one shuffle primitive is a sort-merge co-group over
pre-sorted files (EntryJoiningIterable.java:38-91, fed by SortingWriter).
Ray Data replaces the sort entirely with hash shuffles (SURVEY.md §1.5);
what still needs care is doing the *per-key work vectorized* instead of
per-Python-group.

The trick used throughout: bucket rows by ``hash(key) % P`` into a small
``__part`` column, then ``groupby("__part").map_groups(fn)`` — Ray calls
``fn`` once per *bucket* (verified: groups spanning many blocks arrive
intact), and inside the bucket everything is pyarrow/numpy-vectorized
(sort_by + run-length offsets + ``ListArray.from_arrays``).  This gives
explicit hash partitioning on the element id (north rule) with ~P Python
calls total instead of one per key.

Skew: a single mega-key (planet-scale mega-relation, SURVEY.md §7.4) can
be salted into S sub-buckets with ``salt``; partial lists are then
concatenated in a tiny second-level group-by (``concat_salted_lists``).
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

PART_COL = "__part"
_KNUTH = np.uint64(0x9E3779B97F4A7C15)


def from_pandas_clean(df: pd.DataFrame) -> pa.Table:
    """``pa.Table.from_pandas`` minus the ``pandas`` schema-metadata dict.
    The metadata makes the Arrow schema unhashable, which defeats Ray's
    block-schema deduplication ('Failed to hash the schemas' in every
    sort reduce downstream of a pandas-built block, VERDICT r2 #7)."""
    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)


def _hash_column(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_integer(arr.type):
        return np.asarray(arr).astype(np.uint64) * _KNUTH
    # strings and everything else: stable in-process 64-bit hash
    return pd.util.hash_array(np.asarray(arr.to_pandas(), dtype=object))


def hash_keys(table: pa.Table, cols: Sequence[str]) -> np.ndarray:
    h = np.zeros(table.num_rows, dtype=np.uint64)
    for c in cols:
        h = h * np.uint64(31) + _hash_column(table.column(c))
    return h


def with_partition_col(table: pa.Table, cols: Sequence[str], num_parts: int) -> pa.Table:
    part = (hash_keys(table, cols) % np.uint64(num_parts)).astype(np.int32)
    return table.append_column(PART_COL, pa.array(part))


# Exchange partition sizing (r5).  A fixed partition count is wrong at
# both ends: 64 parts over a 500 MB corpus makes ~10 ms reduce tasks
# whose dispatch + barrier latency dominates the exchange (measured: the
# J1+J2 plan at 8 CPUs did ~5 s of task work in a 29 s wall, drawing
# 2-3 cores — and num_parts 64→16 cut the stage 3.6× at 8 CPUs, 3.1× at
# 2, 1.3× at 32), while any fixed count under-splits a 100 TB input.
# Partition count must follow BYTES with a parallelism floor.
AUTO_PART_TARGET_MB = 64  # per-partition payload target for exchanges


def auto_num_parts(
    num_bytes: int,
    cpus: int | None = None,
    target_mb: int | None = None,
    cap: int = 131072,
) -> int:
    """Exchange partition count for a stage shipping ``num_bytes``:
    ``ceil(bytes / target)`` clamped to ``[max(8, cpus), cap]``.

    The floor keeps every core busy in the reduce wave; the byte target
    keeps per-task work (~10s of ms of vectorized kernel per 64 MB) far
    above Ray's per-task dispatch latency.  ``cap`` bounds driver-side
    shuffle metadata — above it partitions grow past the target, which
    only matters beyond ~8 TB per exchange (raise the cap on a cluster
    whose workers have the heap for >64 MB×k blocks).
    """
    if cpus is None:
        import os

        import ray

        cpus = (
            int(ray.cluster_resources().get("CPU", 0) or 0)
            if ray.is_initialized()
            else 0
        ) or (os.cpu_count() or 8)
    if target_mb is None:
        import os

        target_mb = int(os.environ.get("GRAFT_PART_TARGET_MB", AUTO_PART_TARGET_MB))
    by_bytes = -(-int(num_bytes) // (target_mb * 1024 * 1024))
    return int(min(cap, max(8, cpus, by_bytes)))


def partition_map(
    ds: ray.data.Dataset,
    cols: Sequence[str],
    num_parts: int,
    fn: Callable[[pa.Table], pa.Table],
    coalesce: bool = True,
    pre_partitioned: bool = False,
    **map_groups_kwargs,
) -> ray.data.Dataset:
    """Apply a vectorized ``fn`` to each hash partition of ``ds``.

    All rows sharing values of ``cols`` land in the same partition table.
    ``fn`` receives the partition with the ``__part`` column removed.

    ``pre_partitioned``: the input already carries ``__part`` (the caller
    fused ``with_partition_col`` into an upstream map that Ray fuses with
    its producer), so no separate add-part stage is dispatched — one
    fewer round of per-block tasks per exchange.

    ``coalesce`` bounds the output at ``num_parts`` blocks: Ray's sort
    shuffle emits roughly one block per *input* block, so chained
    exchanges otherwise multiply block counts (70 → 770 observed), and
    per-task dispatch overhead then dominates downstream stages.
    """
    cols = list(cols)

    def add_part(t: pa.Table) -> pa.Table:
        return with_partition_col(t, cols, num_parts)

    def run(t: pa.Table) -> pa.Table:
        return fn(t.drop_columns([PART_COL]))

    if not pre_partitioned:
        ds = ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
    out = ds.groupby(PART_COL).map_groups(
        run, batch_format="pyarrow", **map_groups_kwargs
    )
    if coalesce:
        out = out.repartition(num_parts)
    return out


def distinct(ds: ray.data.Dataset, cols: Sequence[str], num_parts: int = 64) -> ray.data.Dataset:
    """Deterministic global exact dedup on ``cols`` (engine superset of the
    reference's best-effort per-bucket (key,value) dedup,
    SortingWriter.java:76-80 / SURVEY.md §1.4)."""
    cols = list(cols)

    def dedup(t: pa.Table) -> pa.Table:
        return t.group_by(cols).aggregate([]).select(cols)

    # pre-aggregate inside each input block before the shuffle (combiner)
    pre = ds.map_batches(dedup, batch_format="pyarrow", zero_copy_batch=True)
    return partition_map(pre, cols, num_parts, dedup)


def _group_offsets(sorted_keys: np.ndarray) -> np.ndarray:
    """Offsets of key runs in a sorted key array (first index of each run,
    plus the terminal length)."""
    n = len(sorted_keys)
    if n == 0:
        return np.zeros(1, dtype=np.int64)
    change = np.nonzero(sorted_keys[1:] != sorted_keys[:-1])[0] + 1
    return np.concatenate([[0], change, [n]]).astype(np.int64)


def group_table_to_lists(
    t: pa.Table, key: str, sort_cols: Sequence[str] = ()
) -> pa.Table:
    """Vectorized per-partition collect-to-list: one output row per key,
    every other column becomes a list in (key, *sort_cols) order."""
    order = [(key, "ascending")] + [(c, "ascending") for c in sort_cols]
    idx = pc.sort_indices(t, sort_keys=order)
    t2 = t.take(idx).combine_chunks()
    keys_np = np.asarray(t2.column(key))
    offsets = _group_offsets(keys_np)
    out: dict[str, pa.Array] = {key: pa.array(keys_np[offsets[:-1]], t2.schema.field(key).type)}
    off_arr = pa.array(offsets, pa.int64()).cast(pa.int32())
    for name in t2.column_names:
        if name == key:
            continue
        col = t2.column(name).combine_chunks()
        out[name] = pa.ListArray.from_arrays(off_arr, col)
    return pa.table(out)


def group_to_lists(
    ds: ray.data.Dataset,
    key: str,
    sort_cols: Sequence[str] = (),
    num_parts: int = 64,
) -> ray.data.Dataset:
    """Distributed collect-to-list (A3, SURVEY.md §2.5): shuffle on
    ``hash(key) % num_parts``, vectorized assembly inside each partition."""
    return partition_map(
        ds, [key], num_parts, lambda t: group_table_to_lists(t, key, sort_cols)
    )


def group_partials_salted(
    ds: ray.data.Dataset,
    key: str,
    salt_col: str,
    num_salts: int,
    sort_cols: Sequence[str] = (),
    num_parts: int = 64,
) -> ray.data.Dataset:
    """Phase 1 of the skew-hardened collect-to-list: group on
    ``(key, salt)`` where ``salt = hash(salt_col) % num_salts`` — a
    mega-key's rows spread over ``num_salts`` buckets, each emitting a
    partial list row.  The output has the same schema as the full
    collect (key + list columns) but up to ``num_salts`` rows per key;
    finish with :func:`concat_partial_lists` — either via
    :func:`group_to_lists_salted` (dedicated exchange) or fused into a
    downstream co-group kernel on ``key`` (the join stages do this,
    saving one full exchange of the concatenated mega rows)."""

    def add_salt(t: pa.Table) -> pa.Table:
        salt = (hash_keys(t, [salt_col]) % np.uint64(num_salts)).astype(np.int32)
        return t.append_column("__salt", pa.array(salt))

    salted = ds.map_batches(add_salt, batch_format="pyarrow", zero_copy_batch=True)

    def assemble(t: pa.Table) -> pa.Table:
        g = group_table_to_lists(t, key, ["__salt", *sort_cols])
        return g.drop_columns(["__salt"])

    return partition_map(salted, [key, "__salt"], num_parts, assemble)


def concat_partial_lists(t: pa.Table, key: str) -> pa.Table:
    """Merge per-(key, salt) partial list rows into one row per key —
    vectorized flatten + offset rebuild, no per-row Python.  Partial
    arrival order within a key is NOT deterministic; callers must
    re-sort list contents from carried columns (e.g. ``pos``), exactly
    the engine's shuffle-order-independence contract."""
    idx = pc.sort_indices(t, sort_keys=[(key, "ascending")])
    t2 = t.take(idx).combine_chunks()
    keys_np = np.asarray(t2.column(key))
    offsets = _group_offsets(keys_np)
    out = {key: pa.array(keys_np[offsets[:-1]], t2.schema.field(key).type)}
    for name in t2.column_names:
        if name == key:
            continue
        col = t2.column(name).combine_chunks()  # list array of partials
        flat = col.flatten()
        # lengths of each partial list, summed per key run
        lens = np.asarray(col.value_lengths().fill_null(0), dtype=np.int64)
        row_ends = np.cumsum(lens)
        new_off = np.concatenate([[0], row_ends[offsets[1:] - 1]])
        out[name] = pa.ListArray.from_arrays(
            pa.array(new_off, pa.int64()).cast(pa.int32()), flat
        )
    return pa.table(out)


def group_to_lists_salted(
    ds: ray.data.Dataset,
    key: str,
    salt_col: str,
    num_salts: int,
    sort_cols: Sequence[str] = (),
    num_parts: int = 64,
) -> ray.data.Dataset:
    """Skew-hardened collect-to-list: salted partial lists
    (:func:`group_partials_salted`), then a small second-level group-by
    on ``key`` concatenates them (mega-relation path, SURVEY.md
    §4/§7.4).  See :func:`concat_partial_lists` for the ordering
    contract."""
    partials = group_partials_salted(
        ds, key, salt_col, num_salts, sort_cols=sort_cols, num_parts=num_parts
    )
    return partition_map(
        partials, [key], max(8, num_parts // 8), lambda t: concat_partial_lists(t, key)
    )
