"""Vectorized parsers P1-P4 (SURVEY.md §2.3; OsmJoin.java:155-256).

Each kernel is a pure batch transform (Arrow in → Arrow out) suitable for
``Dataset.map_batches(batch_format="pyarrow", zero_copy_batch=True)``.
Regex battery and first-match semantics are pinned to OsmJoin.java:63-68;
the node-only XML-unescape quirk (:170 vs :198) is replicated.

Hot-path discipline: the batch's XML strings are never materialized as
Python objects — kind dispatch is ``pc.starts_with``, id/lat/lon are
``pc.extract_regex`` (Arrow C++/RE2), and tag/nd/member findall runs one
bytes regex scan over the column's UTF-8 buffer (functions/regex.py);
tag dedup (first-occurrence order, last-value-wins) is a vectorized
factorize/unique pass instead of a per-row dict loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions.regex import (
    ID_RE2,
    KV_PATTERN_B,
    LAT_RE2,
    LON_RE2,
    MEMBER_PATTERN_B,
    ND_PATTERN_B,
    batch_findall,
    extract_first,
    unescape_xml,
)
from ..schema import NODES, RELATIONS, REJECTS, WAYS

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

_EMPTY_TAGS_STRUCT = pa.StructArray.from_arrays(
    [pa.array([], pa.string()), pa.array([], pa.string())], names=["key", "value"]
)


def _tags_arrays(arr: pa.Array, unescape: bool) -> pa.ListArray:
    """Per-row tag list with first-occurrence order + last-value-wins on
    duplicate keys (jsonj JsonObject semantics, OsmJoin.java:167-171).
    ``unescape`` only for nodes (OsmJoin.java:170; ways/rels :198 keep raw).

    Vectorized: one bytes regex scan over the column buffer, then a
    factorize + unique pass that computes, per (row, key) group, the first
    occurrence (ordering) and the last occurrence (value) — no per-row
    Python loop; the only residual Python is entity unescape on the few
    values containing '&'.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    offsets = np.zeros(n + 1, dtype=np.int32)
    row_idx, groups = batch_findall(arr, KV_PATTERN_B)
    if not groups:
        return pa.ListArray.from_arrays(pa.array(offsets), _EMPTY_TAGS_STRUCT)
    m = len(groups)
    keys = np.empty(m, dtype=object)
    vals = np.empty(m, dtype=object)
    for i, (k, v) in enumerate(groups):
        keys[i] = k
        vals[i] = v
    kcodes, _ = pd.factorize(keys)
    n_keys = int(kcodes.max()) + 1
    combo = row_idx * n_keys + kcodes
    uniq, first_idx = np.unique(combo, return_index=True)
    _, rev_idx = np.unique(combo[::-1], return_index=True)
    last_idx = m - 1 - rev_idx  # same (sorted) alignment as uniq
    order = np.lexsort((first_idx, uniq // n_keys))  # by row, then first occurrence
    g_row = (uniq // n_keys)[order]
    out_keys = keys[first_idx[order]]
    out_vals = vals[last_idx[order]]
    if unescape:
        for i, v in enumerate(out_vals):
            if b"&" in v:
                out_vals[i] = unescape_xml(v.decode()).encode()
    counts = np.bincount(g_row, minlength=n)
    np.cumsum(counts, out=offsets[1:])
    karr = pa.array(out_keys, pa.binary()).cast(pa.string())
    varr = pa.array(out_vals, pa.binary()).cast(pa.string())
    struct = pa.StructArray.from_arrays([karr, varr], names=["key", "value"])
    return pa.ListArray.from_arrays(pa.array(offsets), struct)


def _list_from_matches(
    n_rows: int, row_idx: np.ndarray, values: pa.Array
) -> tuple[pa.ListArray, np.ndarray, np.ndarray]:
    """Build list column from (row_idx, values) match arrays; also return
    per-match position within its row (document order) and offsets."""
    counts = np.bincount(row_idx, minlength=n_rows) if len(row_idx) else np.zeros(n_rows, np.int64)
    offsets = np.zeros(n_rows + 1, dtype=np.int32)
    np.cumsum(counts, out=offsets[1:])
    pos = (np.arange(len(row_idx)) - offsets[row_idx]).astype(np.int32) if len(row_idx) else np.empty(0, np.int32)
    return pa.ListArray.from_arrays(pa.array(offsets), values), pos, offsets


def _int64_from_bytes(byte_vals: list[bytes]) -> pa.Array:
    """Decimal bytes → int64 via Arrow casts (no Python int parsing)."""
    return pa.array(byte_vals, pa.binary()).cast(pa.string()).cast(pa.int64())


# ---------------------------------------------------------------------------
# P2 parseNode (OsmJoin.java:155-184)
# ---------------------------------------------------------------------------


def parse_nodes_batch(batch: pa.Table) -> pa.Table:
    xml = batch.column("xml")
    sub = batch.filter(pc.starts_with(xml, "<node"))
    arr = sub.column("xml").combine_chunks()
    ids = extract_first(arr, ID_RE2)
    lats = extract_first(arr, LAT_RE2)
    lons = extract_first(arr, LON_RE2)
    ok = pc.and_(pc.and_(ids.is_valid(), lats.is_valid()), lons.is_valid())
    arr_k = arr.filter(ok)
    node_id = ids.filter(ok).cast(pa.int64())
    lon = lons.filter(ok).cast(pa.float64())
    lat = lats.filter(ok).cast(pa.float64())
    tags = _tags_arrays(arr_k, unescape=True)
    return pa.Table.from_arrays([node_id, lon, lat, tags], schema=NODES)


# ---------------------------------------------------------------------------
# P3 parseWay (OsmJoin.java:186-215)
# ---------------------------------------------------------------------------


def parse_ways_batch(batch: pa.Table) -> pa.Table:
    xml = batch.column("xml")
    sub = batch.filter(pc.starts_with(xml, "<way"))
    arr = sub.column("xml").combine_chunks()
    ids = extract_first(arr, ID_RE2)
    ok = ids.is_valid()
    arr_k = arr.filter(ok)
    way_id = ids.filter(ok).cast(pa.int64())
    tags = _tags_arrays(arr_k, unescape=False)
    row_idx, groups = batch_findall(arr_k, ND_PATTERN_B)
    refs = _int64_from_bytes([g[0] for g in groups])
    ns, _, _ = _list_from_matches(len(arr_k), row_idx, refs)
    return pa.Table.from_arrays([way_id, tags, ns], schema=WAYS)


# ---------------------------------------------------------------------------
# P4 parseRelation (OsmJoin.java:217-256)
# ---------------------------------------------------------------------------


def parse_relations_batch(batch: pa.Table) -> pa.Table:
    xml = batch.column("xml")
    sub = batch.filter(pc.starts_with(xml, "<relation"))
    arr = sub.column("xml").combine_chunks()
    ids = extract_first(arr, ID_RE2)
    ok = ids.is_valid()
    arr_k = arr.filter(ok)
    rel_id = ids.filter(ok).cast(pa.int64())
    tags = _tags_arrays(arr_k, unescape=False)
    row_idx, groups = batch_findall(arr_k, MEMBER_PATTERN_B)
    # keep only way/node members, case-insensitive (OsmJoin.java:239-249);
    # 'relation' members ignored (FIXME :245-246), unknown types skipped.
    if groups:
        types_s = np.asarray([g[0] for g in groups], dtype="S")
        mask = np.isin(np.char.lower(types_s), [b"way", b"node"])
        sel = np.nonzero(mask)[0]
        f_rows = row_idx[sel]
        f_ids = _int64_from_bytes([groups[i][1] for i in sel.tolist()])
        f_types = pa.array([groups[i][0] for i in sel.tolist()], pa.binary()).cast(pa.string())
        f_roles = pa.array([groups[i][2] for i in sel.tolist()], pa.binary()).cast(pa.string())
    else:
        f_rows = np.empty(0, np.int64)
        f_ids = pa.array([], pa.int64())
        f_types = pa.array([], pa.string())
        f_roles = pa.array([], pa.string())
    struct = pa.StructArray.from_arrays([f_ids, f_types, f_roles], names=["id", "type", "role"])
    members, _, _ = _list_from_matches(len(arr_k), f_rows, struct)
    return pa.Table.from_arrays([rel_id, tags, members], schema=RELATIONS)


# ---------------------------------------------------------------------------
# poison-row isolation (OsmJoin.java:130-133,178-182: a blob whose
# processing THROWS is diverted to the problem file instead of killing
# the run; here a throwing kernel bisects down to the poison rows, drops
# them from the parse output, and rejects_batch reports them)
# ---------------------------------------------------------------------------


def robust(fn):
    """Wrap a batch kernel: on exception, bisect to isolate poison rows
    (dropped from this kernel's output; rejects_batch emits them with
    reason='parse-exception').  The non-throwing fast path costs
    nothing."""

    def wrapped(batch: pa.Table) -> pa.Table:
        try:
            return fn(batch)
        except Exception:
            if batch.num_rows <= 1:
                return fn(batch.slice(0, 0))
            mid = batch.num_rows // 2
            return pa.concat_tables(
                [wrapped(batch.slice(0, mid)), wrapped(batch.slice(mid))]
            )

    return wrapped


def poison_mask(batch: pa.Table, fn) -> np.ndarray:
    """Boolean mask of rows on which ``fn`` throws (bisection probe;
    zero extra work when the whole batch parses)."""
    try:
        fn(batch)
        return np.zeros(batch.num_rows, dtype=bool)
    except Exception:
        if batch.num_rows <= 1:
            return np.ones(batch.num_rows, dtype=bool)
        mid = batch.num_rows // 2
        return np.concatenate(
            [poison_mask(batch.slice(0, mid), fn), poison_mask(batch.slice(mid), fn)]
        )


# ---------------------------------------------------------------------------
# K3 rejects (OsmJoin.java:111-113,176-182,211-214,253-255)
# ---------------------------------------------------------------------------


def rejects_batch(batch: pa.Table) -> pa.Table:
    xml = batch.column("xml").combine_chunks()
    node_m = np.asarray(pc.starts_with(xml, "<node"))
    way_m = np.asarray(pc.starts_with(xml, "<way"))
    rel_m = np.asarray(pc.starts_with(xml, "<relation"))
    has_id = np.asarray(extract_first(xml, ID_RE2).is_valid())
    has_lat = np.asarray(extract_first(xml, LAT_RE2).is_valid())
    has_lon = np.asarray(extract_first(xml, LON_RE2).is_valid())
    n = len(xml)
    kind = np.full(n, "unknown", dtype=object)
    kind[node_m] = "node"
    kind[way_m] = "way"
    kind[rel_m] = "relation"
    reason = np.full(n, None, dtype=object)
    known = node_m | way_m | rel_m
    reason[~known] = "unexpected-blob-type"  # OsmJoin.java:125-127
    reason[known & ~has_id] = "no-id"
    reason[node_m & has_id & ~(has_lat & has_lon)] = "no-coordinates"
    # blobs whose parse kernel THROWS (OsmJoin.java:130-133): each kernel
    # is probed only on its kind-filtered subset (kernels filter by kind
    # internally, so this is equivalent) — ONE total parse pass over the
    # batch on the clean path, not three (ADVICE r2); bisection only on
    # actual poison
    poison = np.zeros(n, dtype=bool)
    for mask, kern in (
        (node_m, parse_nodes_batch),
        (way_m, parse_ways_batch),
        (rel_m, parse_relations_batch),
    ):
        idx = np.nonzero(mask)[0]
        if len(idx):
            pm = poison_mask(batch.take(pa.array(idx)), kern)
            poison[idx[pm]] = True
    reason[poison & known] = "parse-exception"
    sel = (
        (~known)
        | (known & ~has_id)
        | (node_m & has_id & ~(has_lat & has_lon))
        | (poison & known)
    )
    keep = batch.filter(pa.array(sel))
    return pa.Table.from_arrays(
        [
            keep.column("doc_id"),
            keep.column("span_idx"),
            keep.column("elem_idx"),
            pa.array(kind[sel], pa.string()),
            pa.array(reason[sel], pa.string()),
            keep.column("xml"),
        ],
        schema=REJECTS,
    )


def duplicate_id_rejects(elements: ray.data.Dataset, num_parts: int = 64) -> ray.data.Dataset:
    """Duplicate element ids — the same (kind, id) carved from two input
    shards — surfaced as reject rows: every copy EXCEPT the deterministic
    winner becomes (doc_id, span_idx, kind, elem_id, reason='duplicate-id').

    Winner rule: smallest (md5(xml), doc_id, span_idx) — independent of
    shard/block arrival order.  Hash-partitioned on (kind, elem_id) so
    only same-key copies co-locate; digesting happens only inside
    duplicated groups.  NOTE this rule is THIS stage's own — the join's
    ``on_duplicate='first'`` default ranks by a digest of the PARSED
    row (see ``functions.joins._unique_order``); the two coincide
    whenever same-id copies parse identically (the observed
    corpus-defect case).  For a corpus whose same-id copies DIFFER
    post-parse, thread (md5(xml), doc_id, span_idx) through the unique
    side and pass ``duplicate_rank_cols=("xml_md5","doc_id","span_idx")``
    to the join (r5) — then the join winner is exactly the complement of
    this stage's losers (OsmJoin problem-file spirit,
    OsmJoin.java:111-113; pinned by
    tests/test_join.py::test_join_winner_pairs_with_rejects_loser)."""
    from ..functions.grouping import partition_map

    def prep(batch: pa.Table) -> pa.Table:
        xml = batch.column("xml").combine_chunks()
        node_m = np.asarray(pc.starts_with(xml, "<node"))
        way_m = np.asarray(pc.starts_with(xml, "<way"))
        rel_m = np.asarray(pc.starts_with(xml, "<relation"))
        ids = extract_first(xml, ID_RE2)
        known = node_m | way_m | rel_m
        valid = known & np.asarray(ids.is_valid())
        kind = np.full(len(xml), "", dtype=object)
        kind[node_m] = "node"
        kind[way_m] = "way"
        kind[rel_m] = "relation"
        sel = pa.array(valid)
        return pa.table(
            {
                "doc_id": batch.column("doc_id").filter(sel),
                "span_idx": batch.column("span_idx").filter(sel),
                "kind": pa.array(kind[valid], pa.string()),
                "elem_id": ids.filter(sel).cast(pa.int64()),
                "xml": xml.filter(sel),
            }
        )

    prepped = elements.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)

    def losers(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.string()),
                "span_idx": pa.array([], pa.int64()),
                "kind": pa.array([], pa.string()),
                "elem_id": pa.array([], pa.int64()),
                "reason": pa.array([], pa.string()),
            }
        )
        if t.num_rows == 0:
            return empty
        import hashlib

        kind = np.asarray(t.column("kind").to_pandas(), dtype=object)
        eid = np.asarray(t.column("elem_id"))
        order = np.lexsort((eid, kind))
        k2, e2 = kind[order], eid[order]
        same = (k2[1:] == k2[:-1]) & (e2[1:] == e2[:-1])
        if not same.any():
            return empty
        dup = np.zeros(len(order), dtype=bool)
        dup[1:] |= same
        dup[:-1] |= same
        dpos = np.nonzero(dup)[0]
        rows_idx = order[dpos]
        sub = t.take(pa.array(rows_idx))
        digs = np.asarray(
            [hashlib.md5(x.encode()).hexdigest() for x in sub.column("xml").to_pylist()],
            dtype=object,
        )
        docs = np.asarray(sub.column("doc_id").to_pandas(), dtype=object)
        spans = np.asarray(sub.column("span_idx"))
        kk, ee = k2[dpos], e2[dpos]
        o2 = np.lexsort((spans, docs, digs, ee, kk))
        kk2, ee2 = kk[o2], ee[o2]
        first = np.ones(len(o2), dtype=bool)
        first[1:] = (kk2[1:] != kk2[:-1]) | (ee2[1:] != ee2[:-1])
        out = t.take(pa.array(rows_idx[o2][~first]))
        n = out.num_rows
        return pa.table(
            {
                "doc_id": out.column("doc_id"),
                "span_idx": out.column("span_idx").combine_chunks().cast(pa.int64()),
                "kind": out.column("kind"),
                "elem_id": out.column("elem_id"),
                "reason": pa.array(["duplicate-id"] * n, pa.string()),
            }
        )

    return partition_map(prepped, ["kind", "elem_id"], num_parts, losers)


# ---------------------------------------------------------------------------
# edge-table derivation (the nodeid2wayid / nodeid2relid / wayid2relid
# multimaps, OsmJoin.java:204-208,239-244) — vectorized explodes, no re-parse
# ---------------------------------------------------------------------------


def way_edges_batch(ways: pa.Table) -> pa.Table:
    """ways → (node_id, way_id, pos); pos carries the ns-order contract."""
    ns = ways.column("ns")
    flat = ns.combine_chunks().flatten() if isinstance(ns, pa.ChunkedArray) else ns.flatten()
    ns_arr = ns.combine_chunks() if isinstance(ns, pa.ChunkedArray) else ns
    lengths = np.asarray(ns_arr.value_lengths().fill_null(0))
    way_ids = np.repeat(np.asarray(ways.column("way_id")), lengths)
    pos = (np.arange(len(flat)) - np.repeat(np.cumsum(lengths) - lengths, lengths)).astype(np.int32)
    return pa.table(
        {"node_id": flat, "way_id": pa.array(way_ids, pa.int64()), "pos": pa.array(pos)}
    )


def rel_edges_batch(rels: pa.Table, member_type: str) -> pa.Table:
    """relations → (node_id|way_id, rel_id) for members of ``member_type``."""
    members = rels.column("members")
    marr = members.combine_chunks() if isinstance(members, pa.ChunkedArray) else members
    flat = marr.flatten()
    lengths = np.asarray(marr.value_lengths().fill_null(0))
    rel_ids = np.repeat(np.asarray(rels.column("rel_id")), lengths)
    types = np.asarray(flat.field("type").to_pandas()).astype(str)
    mask = np.char.lower(types) == member_type
    ids = np.asarray(flat.field("id"))[mask]
    key = "node_id" if member_type == "node" else "way_id"
    return pa.table({key: pa.array(ids, pa.int64()), "rel_id": pa.array(rel_ids[mask], pa.int64())})


# ---------------------------------------------------------------------------
# dataset-level wrappers
# ---------------------------------------------------------------------------


def parse_nodes(elements: ray.data.Dataset) -> ray.data.Dataset:
    return elements.map_batches(robust(parse_nodes_batch), batch_format="pyarrow", zero_copy_batch=True)


def parse_ways(elements: ray.data.Dataset) -> ray.data.Dataset:
    return elements.map_batches(robust(parse_ways_batch), batch_format="pyarrow", zero_copy_batch=True)


def parse_relations(elements: ray.data.Dataset) -> ray.data.Dataset:
    return elements.map_batches(robust(parse_relations_batch), batch_format="pyarrow", zero_copy_batch=True)


def parse_rejects(elements: ray.data.Dataset) -> ray.data.Dataset:
    return elements.map_batches(rejects_batch, batch_format="pyarrow", zero_copy_batch=True)


def way_edges(ways: ray.data.Dataset) -> ray.data.Dataset:
    return ways.map_batches(way_edges_batch, batch_format="pyarrow", zero_copy_batch=True)


def node_rel_edges(relations: ray.data.Dataset) -> ray.data.Dataset:
    return relations.map_batches(
        lambda t: rel_edges_batch(t, "node"), batch_format="pyarrow"
    )


def way_rel_edges(relations: ray.data.Dataset) -> ray.data.Dataset:
    return relations.map_batches(
        lambda t: rel_edges_batch(t, "way"), batch_format="pyarrow"
    )
