"""Feature projections P6-P11 (OsmPostProcessor.java:115-208,244-354).

POIs from tagged nodes, LineString/Polygon features from complete ways —
each a ``map_batches`` kernel: vectorized prefilters (has tags, has name)
narrow the batch, then the per-row tag-rule kernel runs only on surviving
rows (the same per-record work the reference does on every line).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions.tags import interpret_tags
from ..schema import FEATURES


class _FeatureRows:
    def __init__(self) -> None:
        self.cols: dict[str, list] = {name: [] for name in FEATURES.names}

    def add(
        self,
        feature_id: str,
        osm_type: str,
        osm_id: int,
        title: str,
        geom_type: str,
        xs,
        ys,
        ring_offsets,
        poly_offsets,
        interp: dict,
    ) -> None:
        c = self.cols
        c["feature_id"].append(feature_id)
        c["osm_type"].append(osm_type)
        c["osm_id"].append(osm_id)
        c["title"].append(title)
        c["geom_type"].append(geom_type)
        c["xs"].append(list(xs))
        c["ys"].append(list(ys))
        c["ring_offsets"].append(list(ring_offsets))
        c["poly_offsets"].append(list(poly_offsets))
        c["categories"].append(interp["categories"])
        c["address"].append(interp["address"])
        c["names"].append(interp["names"])
        c["links"].append(interp["links"])

    def table(self) -> pa.Table:
        return pa.Table.from_pydict(self.cols, schema=FEATURES)


def _tags_nonempty_mask(tags_col) -> pa.Array:
    col = tags_col.combine_chunks() if isinstance(tags_col, pa.ChunkedArray) else tags_col
    return pc.greater(pc.coalesce(pc.list_value_length(col), pa.scalar(0, pa.int32())), 0)


def _name_of(tag_items: list[dict]) -> str | None:
    for t in tag_items:
        if t["key"] == "name":
            return t["value"]
    return None


def poi_features_batch(batch: pa.Table) -> pa.Table:
    """nodes → Point features (OsmPostProcessor.java:115-154).

    Prefilter = has tags (engine semantic for the reference's value-length
    >50 proxy, NodeJsonParsingProcessor :364-380 — a bare node JSON is
    always ≤50 chars; divergence documented in SURVEY.md §2.3 P6) then
    name required (:126-127), then the category gate."""
    batch = batch.filter(_tags_nonempty_mask(batch.column("tags")))
    out = _FeatureRows()
    ids = batch.column("node_id").to_pylist()
    lons = batch.column("lon").to_pylist()
    lats = batch.column("lat").to_pylist()
    tags = batch.column("tags").to_pylist()
    for i in range(batch.num_rows):
        name = _name_of(tags[i])
        if name is None:
            continue
        interp = interpret_tags(tags[i])
        if interp is None:
            continue
        out.add(
            f"osmnode/{ids[i]}", "poi", ids[i], name, "Point",
            [lons[i]], [lats[i]], [0], [0], interp,
        )
    return out.table()


def way_features_batch(batch: pa.Table) -> pa.Table:
    """complete ways → LineString/Polygon features
    (OsmPostProcessor.java:156-208): name required, coordinates are the
    resolved nodes' [lon,lat] in ns order, ring-closure test on first/last
    coordinate equality."""
    batch = batch.filter(_tags_nonempty_mask(batch.column("tags")))
    out = _FeatureRows()
    ids = batch.column("way_id").to_pylist()
    tags = batch.column("tags").to_pylist()
    nodes = batch.column("nodes").to_pylist()
    for i in range(batch.num_rows):
        name = _name_of(tags[i])
        if name is None:
            continue
        interp = interpret_tags(tags[i])
        if interp is None:
            continue
        nds = nodes[i]
        if not nds:
            continue  # cannot happen post-J2 (inner join guarantees ≥1)
        xs = [n["lon"] for n in nds]
        ys = [n["lat"] for n in nds]
        # coordinates.get(0).equals(coordinates.get(size-1)) — no length guard
        # in the reference (OsmPostProcessor.java:200): a 1-node way is a Polygon
        geom_type = "Polygon" if (xs[0] == xs[-1] and ys[0] == ys[-1]) else "LineString"
        out.add(
            f"osmway/{ids[i]}", "way", ids[i], name, geom_type,
            xs, ys, [0], [0], interp,
        )
    return out.table()


def poi_features(nodes: ray.data.Dataset) -> ray.data.Dataset:
    return nodes.map_batches(poi_features_batch, batch_format="pyarrow", zero_copy_batch=True)


def way_features(complete_ways: ray.data.Dataset) -> ray.data.Dataset:
    return complete_ways.map_batches(way_features_batch, batch_format="pyarrow", zero_copy_batch=True)
