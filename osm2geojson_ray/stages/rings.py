"""[EXT] Multipolygon relation features — realizes the reference's P12 stub
(OsmPostProcessor.java:210-242 always returns null; the north star
requires outer/inner ring stitching and hole nesting, SURVEY.md §2.9).

Input: complete relations (J6 output).  For relations tagged
``type=multipolygon``: group member ways by role, stitch each role's ways
into closed rings on shared endpoint node ids (reversing as needed), nest
each inner ring into the outer ring containing it, emit a
Polygon/MultiPolygon feature (name + category gates as for ways).
Relations that fail to stitch go to a rejects side-channel with a reason
(lineage, SURVEY.md §4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..functions.geometry import ensure_orientation, points_in_ring, stitch_rings
from ..functions.tags import interpret_tags
from .postprocess import _FeatureRows, _name_of

RING_REJECTS_SCHEMA = pa.schema(
    [("rel_id", pa.int64()), ("reason", pa.string())]
)


def _tags_value(tag_items: list[dict], key: str) -> str | None:
    for t in tag_items:
        if t["key"] == key:
            return t["value"]
    return None


def assemble_relation_geometry(members: list[dict], ways: list[dict]):
    """(members, complete ways) → (geom_type, xs, ys, ring_offsets,
    poly_offsets) or (None, reason)."""
    roles = {m["id"]: m["role"] for m in members if m["type"].lower() == "way"}
    outer_segs, inner_segs = [], []
    for w in ways:
        role = roles.get(w["way_id"], "")
        if w["missing_node_refs"]:
            return None, "way-with-missing-nodes"
        ids = [n["id"] for n in w["nodes"]]
        xs = [n["lon"] for n in w["nodes"]]
        ys = [n["lat"] for n in w["nodes"]]
        seg = (ids, np.asarray(xs), np.asarray(ys))
        # OSM convention: empty role on multipolygons historically means outer
        if role in ("outer", ""):
            outer_segs.append(seg)
        elif role == "inner":
            inner_segs.append(seg)
        # other roles ignored
    if not outer_segs:
        return None, "no-outer-ways"
    outers = stitch_rings(outer_segs)
    if outers is None:
        return None, "unclosed-outer-ring"
    inners = stitch_rings(inner_segs) if inner_segs else []
    if inners is None:
        return None, "unclosed-inner-ring"

    # nest each inner ring into the outer ring containing its first vertex
    assignment: list[list[tuple[np.ndarray, np.ndarray]]] = [[] for _ in outers]
    for ids, ixs, iys in inners:
        placed = False
        for oi, (_, oxs, oys) in enumerate(outers):
            if points_in_ring(np.asarray([ixs[0]]), np.asarray([iys[0]]), oxs, oys)[0]:
                assignment[oi].append((ixs, iys))
                placed = True
                break
        if not placed:
            return None, "inner-ring-outside-all-outers"

    xs_all: list[float] = []
    ys_all: list[float] = []
    ring_offsets: list[int] = []
    poly_offsets: list[int] = []
    for oi, (_, oxs, oys) in enumerate(outers):
        poly_offsets.append(len(ring_offsets))
        oxs, oys = ensure_orientation(np.asarray(oxs), np.asarray(oys), ccw=True)
        ring_offsets.append(len(xs_all))
        xs_all.extend(oxs)
        ys_all.extend(oys)
        for ixs, iys in assignment[oi]:
            ixs, iys = ensure_orientation(np.asarray(ixs), np.asarray(iys), ccw=False)
            ring_offsets.append(len(xs_all))
            xs_all.extend(ixs)
            ys_all.extend(iys)
    geom_type = "MultiPolygon" if len(outers) > 1 else "Polygon"
    return (geom_type, xs_all, ys_all, ring_offsets, poly_offsets), None


def relation_features_batch(batch: pa.Table) -> pa.Table:
    out = _FeatureRows()
    rel_ids = batch.column("rel_id").to_pylist()
    tags = batch.column("tags").to_pylist()
    members = batch.column("members").to_pylist()
    ways = batch.column("ways").to_pylist()
    for i in range(batch.num_rows):
        if _tags_value(tags[i], "type") != "multipolygon":
            continue  # reference stub emits nothing for other types
        name = _name_of(tags[i])
        if name is None:
            continue
        interp = interpret_tags(tags[i])
        if interp is None:
            continue
        geom, _reason = assemble_relation_geometry(members[i], ways[i])
        if geom is None:
            continue
        geom_type, xs, ys, ring_offsets, poly_offsets = geom
        out.add(
            f"osmrelation/{rel_ids[i]}", "relation", rel_ids[i], name,
            geom_type, xs, ys, ring_offsets, poly_offsets, interp,
        )
    return out.table()


def ring_rejects_batch(batch: pa.Table) -> pa.Table:
    rel_ids = batch.column("rel_id").to_pylist()
    tags = batch.column("tags").to_pylist()
    members = batch.column("members").to_pylist()
    ways = batch.column("ways").to_pylist()
    out = {"rel_id": [], "reason": []}
    for i in range(batch.num_rows):
        if _tags_value(tags[i], "type") != "multipolygon":
            continue
        geom, reason = assemble_relation_geometry(members[i], ways[i])
        if geom is None:
            out["rel_id"].append(rel_ids[i])
            out["reason"].append(reason)
    return pa.Table.from_pydict(out, schema=RING_REJECTS_SCHEMA)


def relation_features(complete_relations: ray.data.Dataset) -> ray.data.Dataset:
    return complete_relations.map_batches(relation_features_batch, batch_format="pyarrow", zero_copy_batch=True)


def ring_rejects(complete_relations: ray.data.Dataset) -> ray.data.Dataset:
    return complete_relations.map_batches(ring_rejects_batch, batch_format="pyarrow", zero_copy_batch=True)
