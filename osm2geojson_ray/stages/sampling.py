"""Deterministic splitting and sampling for training-data pipelines.

Two operators every large-scale corpus pipeline needs and the reference
has no counterpart for (net-new suite members, like stages/dedup.py):

- ``hash_split`` — content-addressed train/val/test assignment: each row's
  bucket is a pure function of (seed, key), so the split is stable across
  runs, machines, partitionings and re-shards — the property that makes
  hash splits the standard at 100 TB (no coordination, no state, no
  shuffle; adding data never moves an existing row between splits).
- ``hash_sample`` — a seeded, reservoir-EQUIVALENT global sample: the n
  rows with the smallest md5-derived priority.  Priorities are i.i.d.
  uniform per key, so "n smallest priorities" is distribution-identical
  to reservoir sampling, but deterministic, mergeable and distributed:
  each block forwards at most n candidate rows to one tiny final merge.

Both use ``functions.hashing.md5int60`` (== DuckDB
``('0x' || substr(md5(s), 1, 15))::BIGINT``), so an ANSI-SQL oracle
reproduces every assignment and priority bit-exactly.  The md5 bill is
one digest per row — inherent to content-addressed semantics, fully
parallel, and the same accepted cost class as dedup_exact's text digest.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.grouping import partition_map
from ..functions.hashing import md5int60_batch

DEFAULT_SPLITS: tuple[tuple[str, int], ...] = (("train", 90), ("val", 5), ("test", 5))


def _bucket(keys: np.ndarray, seed: str, mod: int) -> np.ndarray:
    return md5int60_batch([f"{seed}:{k}" for k in keys]) % mod


def hash_split(
    ds: ray.data.Dataset,
    key: str = "doc_id",
    splits: Sequence[tuple[str, int]] = DEFAULT_SPLITS,
    seed: str = "split-v1",
) -> ray.data.Dataset:
    """Append a ``split`` label column assigned by hash bucket:
    ``md5int60(f"{seed}:{key}") % sum(weights)`` against cumulative
    weight boundaries (first ``weights[0]`` buckets → first label, ...).
    Embarrassingly parallel — one map_batches, no exchange."""
    names = [s for s, _ in splits]
    weights = [w for _, w in splits]
    if min(weights) <= 0:
        raise ValueError(f"split weights must be positive, got {splits!r}")
    bounds = np.cumsum(weights)  # e.g. [90, 95, 100]
    total = int(bounds[-1])
    labels = np.asarray(names, dtype=object)

    def assign(t: pa.Table) -> pa.Table:
        b = _bucket(np.asarray(t.column(key)), seed, total)
        lab = labels[np.searchsorted(bounds, b, side="right")]
        return t.append_column("split", pa.array(lab, pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def split_stats(
    docs: ray.data.Dataset,
    key: str = "doc_id",
    text_col: str = "text",
    splits: Sequence[tuple[str, int]] = DEFAULT_SPLITS,
    seed: str = "split-v1",
) -> ray.data.Dataset:
    """Per-split document count and character volume —
    (split, n_docs, sum_chars).  Combiner inside map_batches + one
    single-partition merge: len(splits) groups exist at EVERY scale, so
    the reducer sees ~len(splits)·n_blocks tiny rows even at 100 TB
    (same shape as lineitem_pricing_summary, events.py:68)."""

    def _shape(g: pa.Table, n_col: str, c_col: str) -> pa.Table:
        return pa.table(
            {
                "split": g.column("split"),
                "n_docs": g.column(n_col).combine_chunks().cast(pa.int64()),
                "sum_chars": g.column(c_col).combine_chunks().cast(pa.int64()),
            }
        )

    def local(t: pa.Table) -> pa.Table:
        t = t.append_column("n_chars_", pc.utf8_length(t.column(text_col)).cast(pa.int64()))
        g = t.group_by(["split"]).aggregate([("n_chars_", "count"), ("n_chars_", "sum")])
        return _shape(g, "n_chars__count", "n_chars__sum")

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by(["split"]).aggregate([("n_docs", "sum"), ("sum_chars", "sum")])
        return _shape(g, "n_docs_sum", "sum_chars_sum")

    pre = hash_split(docs, key=key, splits=splits, seed=seed).map_batches(
        local, batch_format="pyarrow", zero_copy_batch=True
    )
    return partition_map(pre, ["split"], 1, merge)


def hash_sample(
    ds: ray.data.Dataset,
    n: int,
    key: str = "doc_id",
    seed: str = "sample-v1",
) -> ray.data.Dataset:
    """Global deterministic sample of ``n`` rows → (key, priority): the n
    smallest ``md5int60(f"{seed}:{key}")`` priorities, ties (md5
    collisions, ~2^-60) broken by key.  Each block emits at most n
    candidate (key, priority) pairs to a single-block final merge — for
    the usual n ≪ data this moves n·n_blocks tiny rows total, no
    all-to-all.  For n at data scale, sort the priority column instead."""

    def local(t: pa.Table) -> pa.Table:
        k = np.asarray(t.column(key).to_pandas(), dtype=object)
        pr = _bucket(k, seed, 1 << 62)  # identity range: md5int60 < 2^60
        order = np.lexsort((k, pr))[:n]
        # take preserves the key column's type (int, string, …)
        taken = t.select([key]).take(pa.array(order))
        return taken.append_column("priority", pa.array(pr[order], pa.int64()))

    def final(t: pa.Table) -> pa.Table:
        # candidates already carry their priority — resort, don't re-hash
        k = np.asarray(t.column(key).to_pandas(), dtype=object)
        pr = np.asarray(t.column("priority"), dtype=np.int64)
        order = np.lexsort((k, pr))[:n]
        return t.take(pa.array(order))

    pre = ds.map_batches(local, batch_format="pyarrow", zero_copy_batch=True)
    return pre.repartition(1).map_batches(
        final, batch_format="pyarrow", zero_copy_batch=True
    )
