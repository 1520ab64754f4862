"""Vectorized parsers P1-P4 (SURVEY.md §2.3; OsmJoin.java:155-256).

Each kernel is a pure batch transform (Arrow in → Arrow out) suitable for
``Dataset.map_batches(batch_format="pyarrow", zero_copy_batch=True)``.  Regex battery and
first-match semantics are pinned to OsmJoin.java:63-68; the node-only
XML-unescape quirk (:170 vs :198) is replicated.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..functions.regex import (
    ID_PATTERN,
    KV_PATTERN,
    LAT_PATTERN,
    LON_PATTERN,
    MEMBER_PATTERN,
    ND_PATTERN,
    batch_findall,
    batch_first_match,
    unescape_xml,
)
from ..schema import NODES, RELATIONS, REJECTS, WAYS

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _kind_masks(xmls: list[str]) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Dispatch by blob prefix (OsmJoin.java:119-127).  Blobs are stripped
    by the chunker, so a plain startswith suffices."""
    node = np.fromiter((x.startswith("<node") for x in xmls), bool, len(xmls))
    way = np.fromiter((x.startswith("<way") for x in xmls), bool, len(xmls))
    rel = np.fromiter((x.startswith("<relation") for x in xmls), bool, len(xmls))
    return node, way, rel


def _select(batch: pa.Table, mask: np.ndarray) -> tuple[pa.Table, list[str]]:
    sub = batch.filter(pa.array(mask))
    return sub, sub.column("xml").to_pylist()


def _tags_arrays(xmls: list[str], unescape: bool) -> pa.ListArray:
    """Per-row tag list with first-occurrence order + last-value-wins on
    duplicate keys (jsonj JsonObject semantics, OsmJoin.java:167-171).
    ``unescape`` only for nodes (OsmJoin.java:170; ways/rels :198 keep raw)."""
    row_idx, groups = batch_findall(xmls, KV_PATTERN)
    n = len(xmls)
    per_row_keys: list[list[str]] = [[] for _ in range(n)]
    per_row_map: list[dict] = [{} for _ in range(n)]
    for r, (k, v) in zip(row_idx.tolist(), groups):
        m = per_row_map[r]
        if k not in m:
            per_row_keys[r].append(k)
        m[k] = unescape_xml(v) if unescape else v
    keys_flat: list[str] = []
    vals_flat: list[str] = []
    offsets = np.zeros(n + 1, dtype=np.int32)
    for r in range(n):
        ks = per_row_keys[r]
        m = per_row_map[r]
        keys_flat.extend(ks)
        vals_flat.extend(m[k] for k in ks)
        offsets[r + 1] = len(keys_flat)
    struct = pa.StructArray.from_arrays(
        [pa.array(keys_flat, pa.string()), pa.array(vals_flat, pa.string())],
        names=["key", "value"],
    )
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


# ---------------------------------------------------------------------------
# P2 parseNode (OsmJoin.java:155-184)
# ---------------------------------------------------------------------------


def parse_nodes_batch(batch: pa.Table) -> pa.Table:
    node_mask, _, _ = _kind_masks(batch.column("xml").to_pylist())
    sub, xmls = _select(batch, node_mask)
    ids = batch_first_match(xmls, ID_PATTERN)
    lats = batch_first_match(xmls, LAT_PATTERN)
    lons = batch_first_match(xmls, LON_PATTERN)
    ok = np.fromiter(
        (i is not None and la is not None and lo is not None for i, la, lo in zip(ids, lats, lons)),
        bool,
        len(xmls),
    )
    keep = [i for i, v in enumerate(ok) if v]
    node_id = pa.array([int(ids[i][0]) for i in keep], pa.int64())
    lon = pa.array([float(lons[i][0]) for i in keep], pa.float64())
    lat = pa.array([float(lats[i][0]) for i in keep], pa.float64())
    tags = _tags_arrays([xmls[i] for i in keep], unescape=True)
    return pa.Table.from_arrays([node_id, lon, lat, tags], schema=NODES)


# ---------------------------------------------------------------------------
# P3 parseWay (OsmJoin.java:186-215)
# ---------------------------------------------------------------------------


def parse_ways_batch(batch: pa.Table) -> pa.Table:
    _, way_mask, _ = _kind_masks(batch.column("xml").to_pylist())
    sub, xmls = _select(batch, way_mask)
    ids = batch_first_match(xmls, ID_PATTERN)
    keep = [i for i, v in enumerate(ids) if v is not None]
    xmls_k = [xmls[i] for i in keep]
    way_id = pa.array([int(ids[i][0]) for i in keep], pa.int64())
    tags = _tags_arrays(xmls_k, unescape=False)
    row_idx, groups = batch_findall(xmls_k, ND_PATTERN)
    refs = pa.array([int(g[0]) for g in groups], pa.int64())
    ns, _, _ = _list_from_matches(len(xmls_k), row_idx, refs)
    return pa.Table.from_arrays([way_id, tags, ns], schema=WAYS)


# ---------------------------------------------------------------------------
# P4 parseRelation (OsmJoin.java:217-256)
# ---------------------------------------------------------------------------


def parse_relations_batch(batch: pa.Table) -> pa.Table:
    _, _, rel_mask = _kind_masks(batch.column("xml").to_pylist())
    sub, xmls = _select(batch, rel_mask)
    ids = batch_first_match(xmls, ID_PATTERN)
    keep = [i for i, v in enumerate(ids) if v is not None]
    xmls_k = [xmls[i] for i in keep]
    rel_id = pa.array([int(ids[i][0]) for i in keep], pa.int64())
    tags = _tags_arrays(xmls_k, unescape=False)
    row_idx, groups = batch_findall(xmls_k, MEMBER_PATTERN)
    # keep only way/node members, case-insensitive (OsmJoin.java:239-249);
    # 'relation' members ignored (FIXME :245-246), unknown types skipped.
    f_rows: list[int] = []
    f_ids: list[int] = []
    f_types: list[str] = []
    f_roles: list[str] = []
    for r, (mtype, ref, role) in zip(row_idx.tolist(), groups):
        t = mtype.lower()
        if t == "way" or t == "node":
            f_rows.append(r)
            f_ids.append(int(ref))
            f_types.append(mtype)
            f_roles.append(role)
    struct = pa.StructArray.from_arrays(
        [pa.array(f_ids, pa.int64()), pa.array(f_types, pa.string()), pa.array(f_roles, pa.string())],
        names=["id", "type", "role"],
    )
    members, _, _ = _list_from_matches(
        len(xmls_k), np.asarray(f_rows, dtype=np.int64), struct
    )
    return pa.Table.from_arrays([rel_id, tags, members], schema=RELATIONS)


# ---------------------------------------------------------------------------
# K3 rejects (OsmJoin.java:111-113,176-182,211-214,253-255)
# ---------------------------------------------------------------------------


def rejects_batch(batch: pa.Table) -> pa.Table:
    xml_list = batch.column("xml").to_pylist()
    node_mask, way_mask, rel_mask = _kind_masks(xml_list)
    doc_id = batch.column("doc_id").to_pylist()
    span_idx = batch.column("span_idx").to_pylist()
    elem_idx = batch.column("elem_idx").to_pylist()
    ids = batch_first_match(xml_list, ID_PATTERN)
    lats = batch_first_match(xml_list, LAT_PATTERN)
    lons = batch_first_match(xml_list, LON_PATTERN)
    rows = {k: [] for k in ("doc_id", "span_idx", "elem_idx", "kind", "reason", "xml")}
    for i, x in enumerate(xml_list):
        if node_mask[i]:
            kind = "node"
            reason = (
                "no-id" if ids[i] is None
                else ("no-coordinates" if lats[i] is None or lons[i] is None else None)
            )
        elif way_mask[i]:
            kind, reason = "way", ("no-id" if ids[i] is None else None)
        elif rel_mask[i]:
            kind, reason = "relation", ("no-id" if ids[i] is None else None)
        else:
            kind, reason = "unknown", "unexpected-blob-type"  # OsmJoin.java:125-127
        if reason is not None:
            rows["doc_id"].append(doc_id[i])
            rows["span_idx"].append(span_idx[i])
            rows["elem_idx"].append(elem_idx[i])
            rows["kind"].append(kind)
            rows["reason"].append(reason)
            rows["xml"].append(x)
    return pa.Table.from_pydict(rows, schema=REJECTS)


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
    return elements.map_batches(parse_nodes_batch, batch_format="pyarrow", zero_copy_batch=True)


def parse_ways(elements: ray.data.Dataset) -> ray.data.Dataset:
    return elements.map_batches(parse_ways_batch, batch_format="pyarrow", zero_copy_batch=True)


def parse_relations(elements: ray.data.Dataset) -> ray.data.Dataset:
    return elements.map_batches(parse_relations_batch, batch_format="pyarrow", zero_copy_batch=True)


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
