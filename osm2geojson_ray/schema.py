"""Arrow schemas for every table the engine produces (SURVEY.md §1.5).

The reference models everything as sorted ``key;value`` gzip multimap files
of JSON blobs (mergesort/SortingWriter.java, osm2geojson/OsmJoin.java);
here each logical table is a columnar Arrow schema carried by a
``ray.data.Dataset``.
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------------------
# input surface (BASELINE.json input_hint): interleaved text+media documents
# ---------------------------------------------------------------------------

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),       # 'text' | 'media' | 'osm_xml'
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),      # monotonically increasing per row
    ]
)

DOCUMENTS = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_STRUCT)),
    ]
)

# extracted OSM XML fragments, keyed back to the source span
ELEMENTS = pa.schema(
    [
        ("doc_id", pa.string()),
        ("span_idx", pa.int32()),
        ("elem_idx", pa.int32()),    # position of the blob within the span
        ("xml", pa.string()),
    ]
)

# ---------------------------------------------------------------------------
# parsed entity tables (raw shapes: OsmJoin.java:155-256)
# ---------------------------------------------------------------------------

# tags keep first-occurrence order with last-value-wins on duplicate keys
# (jsonj JsonObject / LinkedHashMap semantics, OsmJoin.java:167-171)
TAGS = pa.list_(pa.struct([("key", pa.string()), ("value", pa.string())]))

NODES = pa.schema(
    [
        ("node_id", pa.int64()),
        ("lon", pa.float64()),       # GeoJSON axis order: lon first ("l" array)
        ("lat", pa.float64()),
        ("tags", TAGS),
    ]
)

WAYS = pa.schema(
    [
        ("way_id", pa.int64()),
        ("tags", TAGS),
        ("ns", pa.list_(pa.int64())),  # node refs in document order
    ]
)

MEMBER_STRUCT = pa.struct(
    [("id", pa.int64()), ("type", pa.string()), ("role", pa.string())]
)

RELATIONS = pa.schema(
    [
        ("rel_id", pa.int64()),
        ("tags", TAGS),
        # only 'way'/'node' members are kept (OsmJoin.java:239-249)
        ("members", pa.list_(MEMBER_STRUCT)),
    ]
)

# edge tables (the nodeid2wayid / nodeid2relid / wayid2relid multimaps,
# OsmJoin.java:45-47).  ``pos`` is the 0-based position within the parent's
# ref list — the engine's carrier of the ns-order contract (SURVEY.md §7.4).
WAY_EDGES = pa.schema(
    [("node_id", pa.int64()), ("way_id", pa.int64()), ("pos", pa.int32())]
)
NODE_REL_EDGES = pa.schema([("node_id", pa.int64()), ("rel_id", pa.int64())])
WAY_REL_EDGES = pa.schema([("way_id", pa.int64()), ("rel_id", pa.int64())])

REJECTS = pa.schema(
    [
        ("doc_id", pa.string()),
        ("span_idx", pa.int32()),
        ("elem_idx", pa.int32()),
        ("kind", pa.string()),       # node|way|relation
        ("reason", pa.string()),
        ("xml", pa.string()),
    ]
)

# ---------------------------------------------------------------------------
# joined shapes (OsmJoin.java:270-421)
# ---------------------------------------------------------------------------

NODE_STRUCT = pa.struct(
    [("id", pa.int64()), ("lon", pa.float64()), ("lat", pa.float64()), ("tags", TAGS)]
)

COMPLETE_WAYS = pa.schema(
    [
        ("way_id", pa.int64()),
        ("tags", TAGS),
        ("nodes", pa.list_(NODE_STRUCT)),          # in ns order
        ("missing_node_refs", pa.list_(pa.int64())),
    ]
)

COMPLETE_WAY_STRUCT = pa.struct(
    [
        ("way_id", pa.int64()),
        ("tags", TAGS),
        ("nodes", pa.list_(NODE_STRUCT)),
        ("missing_node_refs", pa.list_(pa.int64())),
    ]
)

COMPLETE_RELATIONS = pa.schema(
    [
        ("rel_id", pa.int64()),
        ("tags", TAGS),
        ("members", pa.list_(MEMBER_STRUCT)),
        ("nodes", pa.list_(NODE_STRUCT)),          # sorted by node id (§1.4)
        ("ways", pa.list_(COMPLETE_WAY_STRUCT)),   # sorted by way id
    ]
)

# ---------------------------------------------------------------------------
# features (OsmPostProcessor.java:119-208 + [EXT] ring assembly)
# ---------------------------------------------------------------------------

# geometry is carried flattened for vectorized tiling:
#   xs/ys: all vertices; ring_offsets: start index of each ring in xs;
#   poly_offsets: start ring index of each polygon (MultiPolygon support).
FEATURES = pa.schema(
    [
        ("feature_id", pa.string()),     # osmnode/<id> | osmway/<id> | osmrelation/<id>
        ("osm_type", pa.string()),       # poi | way | relation
        ("osm_id", pa.int64()),
        ("title", pa.string()),
        ("geom_type", pa.string()),      # Point | LineString | Polygon | MultiPolygon
        ("xs", pa.list_(pa.float64())),
        ("ys", pa.list_(pa.float64())),
        ("ring_offsets", pa.list_(pa.int32())),
        ("poly_offsets", pa.list_(pa.int32())),
        ("categories", pa.list_(pa.string())),   # sorted set, categories.osm
        ("address", TAGS),                        # addr:* suffix -> value
        ("names", pa.list_(pa.struct([("lang", pa.string()), ("values", pa.list_(pa.string()))]))),
        ("links", pa.list_(pa.string())),         # website hrefs
    ]
)

TILES = pa.schema([("feature_id", pa.string()), ("cell_id", pa.int64())])
