"""The J1..J6 join DAG (SURVEY.md §2.4; OsmJoin.java:258-461).

Reference flow (sorted-file merge co-groups) re-expressed as hash
shuffles — ONE exchange per stage, mirroring the reference's six
sorted-file joins:

    J1 wayid2nodejson      = nodes ⋈ node→way edges        (:270-288)
    J2 wayid2completejson  = ways ⋈ grouped(J1)            (:290-323)
    J3 relid2nodejson      = node→rel edges ⋈ nodes        (:325-345)
    J4 relid2jsonwithnodes = relations ⋈ grouped(J3)       (:347-372)
    J5 relid2wayjson       = way→rel edges ⋈ complete ways (:374-393)
    J6 relid2completejson  = J4 ⋈ grouped(J5)              (:396-421)

Each stage tags + unions its two sides, hash-partitions once on the
stage key, and runs a fully vectorized in-partition kernel (searchsorted
join + run-length list assembly).  Edge dedup (SortingWriter.java:76-80,
engine superset per SURVEY.md §1.4) happens *inside* the partition —
the partition key co-locates every duplicate pair, so no extra shuffle.

All joins are inner — the inner-join drop semantics are load-bearing:
ways with zero resolvable nodes vanish at J2, relations without node
members vanish at J4, relations without complete-way members vanish at
J6 (SURVEY.md §7.4).  Way-node order is restored from the data-carried
``pos`` column (never from shuffle order); per-relation member lists are
deterministically sorted by member id (§1.4: per-key value order is not
a reference contract).

``salt`` switches J2/J4/J6 to the salted collect for planet-scale
mega-key skew: phase-1 partial lists on (key, salt)
(functions.grouping.group_partials_salted) bound per-task fan-in, and
the partial-concat is fused into the join co-group — the salted path
costs the same 2 exchanges per stage as the unsalted one (r4; fusion
replaced the earlier dedicated phase-2 exchange).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..functions.grouping import (
    concat_partial_lists,
    group_partials_salted,
    group_table_to_lists,
)
from ..functions.joins import cogroup_apply, join_unique_np
from ..schema import (
    COMPLETE_WAY_STRUCT,
    NODE_STRUCT,
    RELATIONS,
    TAGS,
    WAYS,
)


def _single(col) -> pa.Array:
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def _offsets_of(list_col) -> pa.Array:
    lens = np.asarray(_single(list_col).value_lengths().fill_null(0), dtype=np.int64)
    off = np.zeros(len(lens) + 1, dtype=np.int32)
    np.cumsum(lens, out=off[1:])
    return pa.array(off)


def _resort_lists(t: pa.Table, key_list_col: str, list_cols: list[str]) -> pa.Table:
    """Re-sort the elements of parallel list columns within each row by the
    values of ``key_list_col`` — restores a data-carried order (pos / id)
    regardless of shuffle or salt emission order (SURVEY.md §7.4)."""
    t = t.combine_chunks()
    key_col = _single(t.column(key_list_col))
    lens = np.asarray(key_col.value_lengths().fill_null(0), dtype=np.int64)
    if len(lens) == 0 or lens.sum() == 0:
        return t
    row_idx = np.repeat(np.arange(len(lens)), lens)
    keys_flat = np.asarray(key_col.flatten())
    order = np.lexsort((keys_flat, row_idx))
    if np.array_equal(order, np.arange(len(order))):
        return t
    offsets = _offsets_of(key_col)
    take_idx = pa.array(order)
    cols = {}
    for name in t.column_names:
        if name in list_cols or name == key_list_col:
            flat = _single(t.column(name)).flatten().take(take_idx)
            cols[name] = pa.ListArray.from_arrays(offsets, flat)
        else:
            cols[name] = _single(t.column(name))
    return pa.Table.from_arrays(list(cols.values()), names=list(cols))


def _dedup(t: pa.Table, cols: list[str]) -> pa.Table:
    return t.group_by(cols).aggregate([]).select(cols)


# ---------------------------------------------------------------------------
# schemas for the tagged unions
# ---------------------------------------------------------------------------

_POS_EDGES = pa.schema(
    [("node_id", pa.int64()), ("way_id", pa.int64()), ("pos", pa.int32())]
)
_NODE_PAYLOAD = pa.schema(
    [("node_id", pa.int64()), ("lon", pa.float64()), ("lat", pa.float64()), ("node_tags", TAGS)]
)
_NODE_REL_EDGES = pa.schema([("node_id", pa.int64()), ("rel_id", pa.int64())])
_WAY_REL_EDGES = pa.schema([("way_id", pa.int64()), ("rel_id", pa.int64())])

_J1_OUT = pa.schema(
    [
        ("way_id", pa.int64()),
        ("pos", pa.int32()),
        ("node_id", pa.int64()),
        ("lon", pa.float64()),
        ("lat", pa.float64()),
        ("node_tags", TAGS),
    ]
)

_J3_OUT = pa.schema(
    [
        ("rel_id", pa.int64()),
        ("node_id", pa.int64()),
        ("lon", pa.float64()),
        ("lat", pa.float64()),
        ("node_tags", TAGS),
    ]
)

def _grouped_schema(s: pa.Schema, key: str) -> pa.Schema:
    """Schema of a collect-to-list (or salted partial-list) table: the
    key stays scalar, every other column becomes a list of its type."""
    return pa.schema(
        [(f.name, f.type if f.name == key else pa.list_(f.type)) for f in s]
    )


_GROUPED_J1 = _grouped_schema(_J1_OUT, "way_id")
_GROUPED_J3 = _grouped_schema(_J3_OUT, "rel_id")

_REL_WITH_NODES = pa.schema(
    [
        ("rel_id", pa.int64()),
        ("tags", TAGS),
        ("members", RELATIONS.field("members").type),
        ("nodes", pa.list_(NODE_STRUCT)),
    ]
)

_COMPLETE_WAYS = pa.schema(
    [
        ("way_id", pa.int64()),
        ("tags", TAGS),
        ("nodes", pa.list_(NODE_STRUCT)),
        ("missing_node_refs", pa.list_(pa.int64())),
    ]
)

_COMPLETE_WAYS_RENAMED = pa.schema(
    [
        ("way_id", pa.int64()),
        ("way_tags", TAGS),
        ("way_nodes", pa.list_(NODE_STRUCT)),
        ("way_missing", pa.list_(pa.int64())),
    ]
)

_J5_OUT = pa.schema(
    [
        ("rel_id", pa.int64()),
        ("way_id", pa.int64()),
        ("way_tags", TAGS),
        ("way_nodes", pa.list_(NODE_STRUCT)),
        ("way_missing", pa.list_(pa.int64())),
    ]
)


def _nodes_renamed(nodes: ray.data.Dataset) -> ray.data.Dataset:
    return nodes.map_batches(
        lambda t: t.rename_columns(["node_id", "lon", "lat", "node_tags"]),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# J1 / J3: edge ⋈ unique-node joins (one exchange each)
# ---------------------------------------------------------------------------


def j1_way_nodes(
    nodes: ray.data.Dataset, way_edges: ray.data.Dataset, num_parts: int = 64
) -> ray.data.Dataset:
    """nodes ⋈ node→way pos-edges → (way_id, pos, node_id, lon, lat, node_tags).

    The reference's wayid2nodejson (OsmJoin.java:270-288) carries deduped
    (node,way) pairs; the engine carries ``pos`` instead, which both
    subsumes the dedup (pairs are unique per pos) and makes the J2
    reassembly shuffle-order-independent."""

    def kernel(edges: pa.Table, nds: pa.Table) -> pa.Table:
        out = join_unique_np(
            edges, nds, "node_id", ["way_id", "pos"], ["lon", "lat", "node_tags"]
        )
        return out.select([f.name for f in _J1_OUT])

    return cogroup_apply(
        way_edges, _nodes_renamed(nodes), "node_id", _POS_EDGES, _NODE_PAYLOAD,
        kernel, num_parts,
    )


def j3_rel_nodes(
    nodes: ray.data.Dataset, node_rel_edges: ray.data.Dataset, num_parts: int = 64
) -> ray.data.Dataset:
    """deduped node→rel edges ⋈ nodes → (rel_id, node_id, lon, lat,
    node_tags) (OsmJoin.java:325-345).  The (node_id, rel_id) exact dedup
    runs inside the partition — the node_id hash co-locates every
    duplicate pair."""

    def kernel(edges: pa.Table, nds: pa.Table) -> pa.Table:
        edges = _dedup(edges, ["node_id", "rel_id"])
        out = join_unique_np(edges, nds, "node_id", ["rel_id"], ["lon", "lat", "node_tags"])
        return out.select([f.name for f in _J3_OUT])

    return cogroup_apply(
        node_rel_edges, _nodes_renamed(nodes), "node_id", _NODE_REL_EDGES, _NODE_PAYLOAD,
        kernel, num_parts,
    )


# ---------------------------------------------------------------------------
# J2: complete ways (one exchange: group + join + assemble in-partition)
# ---------------------------------------------------------------------------


def _assemble_complete_ways(t: pa.Table) -> pa.Table:
    """(way ⋈ grouped node lists) → COMPLETE_WAYS rows.

    nodes := resolved nodes in ns order (pos-sorted); missingNodeRefs :=
    ns entries at unresolved positions, in ns order (OsmJoin.java:297-315)."""
    t = _resort_lists(t, "pos", ["pos", "node_id", "lon", "lat", "node_tags"])
    offsets = _offsets_of(t.column("node_id"))
    nodes_struct = pa.StructArray.from_arrays(
        [
            _single(t.column("node_id")).flatten(),
            _single(t.column("lon")).flatten(),
            _single(t.column("lat")).flatten(),
            _single(t.column("node_tags")).flatten(),
        ],
        fields=list(NODE_STRUCT),
    )
    nodes_list = pa.ListArray.from_arrays(offsets, nodes_struct)

    ns_col = _single(t.column("ns"))
    pos_col = _single(t.column("pos"))
    ns_lens = np.asarray(ns_col.value_lengths().fill_null(0))
    pos_lens = np.asarray(pos_col.value_lengths().fill_null(0))
    n = t.num_rows
    missing_vals: list[int] = []
    missing_off = np.zeros(n + 1, dtype=np.int32)
    incomplete = np.nonzero(ns_lens != pos_lens)[0]
    if len(incomplete):
        ns_py = ns_col.to_pylist()
        pos_py = pos_col.to_pylist()
        per_row = {}
        for i in incomplete.tolist():
            have = set(pos_py[i])
            per_row[i] = [ref for p, ref in enumerate(ns_py[i]) if p not in have]
        for i in range(n):
            missing_vals.extend(per_row.get(i, ()))
            missing_off[i + 1] = len(missing_vals)
    missing_list = pa.ListArray.from_arrays(
        pa.array(missing_off), pa.array(missing_vals, pa.int64())
    )
    return pa.Table.from_arrays(
        [_single(t.column("way_id")), _single(t.column("tags")), nodes_list, missing_list],
        names=["way_id", "tags", "nodes", "missing_node_refs"],
    )


def j2_complete_ways(
    ways: ray.data.Dataset,
    way_nodes: ray.data.Dataset,
    num_parts: int = 64,
    salt: int | None = None,
) -> ray.data.Dataset:
    """ways ⋈ per-way node lists → complete ways (OsmJoin.java:290-323).

    Salted path (mega-way skew): phase-1 salted partial lists, then the
    partial-concat is FUSED into the join co-group on ``way_id`` — 2
    exchanges total, same as the unsalted path, and the concatenated
    mega list row never makes an extra object-store round trip (r4; the
    prior 3-exchange shape re-shipped it through a dedicated phase-2
    Sort+Repartition before the join)."""

    def kernel_grouped(grouped: pa.Table, wy: pa.Table) -> pa.Table:
        joined = join_unique_np(
            grouped, wy, "way_id",
            ["pos", "node_id", "lon", "lat", "node_tags"], ["tags", "ns"],
        )
        return _assemble_complete_ways(joined)

    if salt and salt > 1:
        partials = group_partials_salted(
            way_nodes, "way_id", "node_id", salt, sort_cols=["pos"], num_parts=num_parts
        )
        return cogroup_apply(
            partials, ways, "way_id", _GROUPED_J1, WAYS,
            lambda pt, wy: kernel_grouped(concat_partial_lists(pt, "way_id"), wy),
            num_parts,
        )

    return cogroup_apply(
        way_nodes, ways, "way_id", _J1_OUT, WAYS,
        lambda wn, wy: kernel_grouped(group_table_to_lists(wn, "way_id", ["pos"]), wy),
        num_parts,
    )


# ---------------------------------------------------------------------------
# J4: relations + node lists (one exchange)
# ---------------------------------------------------------------------------


def _pack_rel_nodes(t: pa.Table) -> pa.Table:
    t = _resort_lists(t, "node_id", ["node_id", "lon", "lat", "node_tags"])
    offsets = _offsets_of(t.column("node_id"))
    struct = pa.StructArray.from_arrays(
        [
            _single(t.column("node_id")).flatten(),
            _single(t.column("lon")).flatten(),
            _single(t.column("lat")).flatten(),
            _single(t.column("node_tags")).flatten(),
        ],
        fields=list(NODE_STRUCT),
    )
    return pa.Table.from_arrays(
        [_single(t.column("rel_id")), pa.ListArray.from_arrays(offsets, struct)],
        names=["rel_id", "nodes"],
    )


def j4_rel_with_nodes(
    relations: ray.data.Dataset,
    rel_nodes: ray.data.Dataset,
    num_parts: int = 64,
    salt: int | None = None,
) -> ray.data.Dataset:
    """relations ⋈ per-rel node lists (inner: node-less relations drop —
    OsmJoin.java:347-372).  Node list deterministically sorted by node_id."""
    def kernel_grouped(grouped: pa.Table, rels: pa.Table) -> pa.Table:
        packed = _pack_rel_nodes(grouped)
        out = join_unique_np(packed, rels, "rel_id", ["nodes"], ["tags", "members"])
        return out.select([f.name for f in _REL_WITH_NODES])

    if salt and salt > 1:
        # fused salted path: partial-concat + pack + join in ONE co-group
        # exchange on rel_id (2 exchanges total — see j2_complete_ways).
        partials = group_partials_salted(
            rel_nodes, "rel_id", "node_id", salt, sort_cols=["node_id"], num_parts=num_parts
        )
        return cogroup_apply(
            partials, relations, "rel_id", _GROUPED_J3, RELATIONS,
            lambda pt, rels: kernel_grouped(concat_partial_lists(pt, "rel_id"), rels),
            num_parts,
        )

    return cogroup_apply(
        rel_nodes, relations, "rel_id", _J3_OUT, RELATIONS,
        lambda rn, rels: kernel_grouped(group_table_to_lists(rn, "rel_id", ["node_id"]), rels),
        num_parts,
    )


# ---------------------------------------------------------------------------
# J5: way→rel edges ⋈ complete ways (one exchange)
# ---------------------------------------------------------------------------


def j5_rel_ways(
    complete_ways: ray.data.Dataset, way_rel_edges: ray.data.Dataset, num_parts: int = 64
) -> ray.data.Dataset:
    """deduped way→rel edges ⋈ complete ways (OsmJoin.java:374-393)."""
    renamed = complete_ways.map_batches(
        lambda t: t.rename_columns(["way_id", "way_tags", "way_nodes", "way_missing"]),
        batch_format="pyarrow",
    )

    def kernel(edges: pa.Table, cw: pa.Table) -> pa.Table:
        edges = _dedup(edges, ["way_id", "rel_id"])
        out = join_unique_np(
            edges, cw, "way_id", ["rel_id"], ["way_tags", "way_nodes", "way_missing"]
        )
        return out.select([f.name for f in _J5_OUT])

    return cogroup_apply(
        way_rel_edges, renamed, "way_id", _WAY_REL_EDGES, _COMPLETE_WAYS_RENAMED,
        kernel, num_parts,
    )


# ---------------------------------------------------------------------------
# J6: complete relations (one exchange)
# ---------------------------------------------------------------------------


def _pack_rel_ways(t: pa.Table) -> pa.Table:
    t = _resort_lists(t, "way_id", ["way_id", "way_tags", "way_nodes", "way_missing"])
    offsets = _offsets_of(t.column("way_id"))
    struct = pa.StructArray.from_arrays(
        [
            _single(t.column("way_id")).flatten(),
            _single(t.column("way_tags")).flatten(),
            _single(t.column("way_nodes")).flatten(),
            _single(t.column("way_missing")).flatten(),
        ],
        fields=list(COMPLETE_WAY_STRUCT),
    )
    return pa.Table.from_arrays(
        [_single(t.column("rel_id")), pa.ListArray.from_arrays(offsets, struct)],
        names=["rel_id", "ways"],
    )


def j6_complete_relations(
    rel_with_nodes: ray.data.Dataset,
    rel_ways: ray.data.Dataset,
    num_parts: int = 64,
    salt: int | None = None,
) -> ray.data.Dataset:
    """rel(+nodes) ⋈ per-rel complete-way lists (inner: way-less relations
    drop — OsmJoin.java:396-421).  Ways sorted by way_id."""
    def kernel_grouped(grouped: pa.Table, rwn: pa.Table) -> pa.Table:
        packed = _pack_rel_ways(grouped)
        out = join_unique_np(packed, rwn, "rel_id", ["ways"], ["tags", "members", "nodes"])
        return out.select(["rel_id", "tags", "members", "nodes", "ways"])

    if salt and salt > 1:
        # fused salted path (2 exchanges; see j2_complete_ways) — this is
        # the stage where fusion pays most: the mega relation's packed
        # ways list is the fattest single row in the DAG, and the fused
        # plan never re-ships it between concat and join.
        partials = group_partials_salted(
            rel_ways, "rel_id", "way_id", salt, sort_cols=["way_id"], num_parts=num_parts
        )
        return cogroup_apply(
            partials, rel_with_nodes, "rel_id",
            _grouped_schema(_J5_OUT, "rel_id"), _REL_WITH_NODES,
            lambda pt, rwn: kernel_grouped(concat_partial_lists(pt, "rel_id"), rwn),
            num_parts,
        )

    return cogroup_apply(
        rel_ways, rel_with_nodes, "rel_id", _J5_OUT, _REL_WITH_NODES,
        lambda rw, rwn: kernel_grouped(group_table_to_lists(rw, "rel_id", ["way_id"]), rwn),
        num_parts,
    )


def build_join_dag(
    nodes: ray.data.Dataset,
    ways: ray.data.Dataset,
    relations: ray.data.Dataset,
    way_edges: ray.data.Dataset,
    node_rel_edges: ray.data.Dataset,
    way_rel_edges: ray.data.Dataset,
    num_parts: int = 64,
    salt: int | None = None,
) -> dict[str, ray.data.Dataset]:
    """The full DAG (OsmJoin.processAll, :423-461) — 6 exchanges total.
    Stages 1-2 and 3-4 are independent branches; Ray's streaming executor
    runs them concurrently (the reference serializes them needlessly)."""
    wn = j1_way_nodes(nodes, way_edges, num_parts)
    complete_ways = j2_complete_ways(ways, wn, num_parts, salt)
    rn = j3_rel_nodes(nodes, node_rel_edges, num_parts)
    rel_nodes = j4_rel_with_nodes(relations, rn, num_parts, salt)
    rw = j5_rel_ways(complete_ways, way_rel_edges, num_parts)
    complete_rels = j6_complete_relations(rel_nodes, rw, num_parts, salt)
    return {
        "way_nodes": wn,
        "complete_ways": complete_ways,
        "rel_nodes": rn,
        "rel_with_nodes": rel_nodes,
        "rel_ways": rw,
        "complete_relations": complete_rels,
    }
