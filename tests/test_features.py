"""Tag-rule + projection + ring-assembly tests (SURVEY.md §2.8/§2.9)."""

import numpy as np
import pyarrow as pa

from osm2geojson_ray.functions.geometry import (
    points_in_ring,
    signed_area,
    stitch_rings,
)
from osm2geojson_ray.functions.tags import interpret_tags
from osm2geojson_ray.schema import COMPLETE_WAYS, NODES
from osm2geojson_ray.stages.postprocess import poi_features_batch, way_features_batch
from osm2geojson_ray.stages.rings import assemble_relation_geometry


def T(items):
    return [{"key": k, "value": v} for k, v in items]


# --- interpretTags rules ----------------------------------------------------


def test_highway_adds_both():
    r = interpret_tags(T([("name", "x"), ("highway", "residential")]))
    assert r["categories"] == ["highway:residential", "street"]


def test_whitelist_tags():
    for k in ["leisure", "amenity", "natural", "historic", "cuisine", "tourism", "shop", "admin-level"]:
        r = interpret_tags(T([(k, "v1")]))
        assert r["categories"] == [f"{k}:v1"]


def test_building_yes_rules():
    assert "building" in interpret_tags(T([("building", "yes")]))["categories"]
    r = interpret_tags(T([("building", "YES"), ("amenity", "public_building")]))
    assert "public-building" in r["categories"] and "building" not in r["categories"]
    # building=other only gets the whitelist category
    r = interpret_tags(T([("building", "hut")]))
    assert r["categories"] == ["building:hut"]


def test_railway_and_stop_position_rules():
    assert interpret_tags(T([("railway", "tram_stop")]))["categories"] == ["tram-stop"]
    assert interpret_tags(T([("railway", "station")]))["categories"] == ["train-station"]
    assert interpret_tags(T([("railway", "halt")]))["categories"] == ["train-station"]
    assert interpret_tags(T([("station", "light_rail")]))["categories"] == ["light-rail-station"]
    r = interpret_tags(T([("public_transport", "stop_position"), ("bus", "yes")]))
    assert r["categories"] == ["bus-stop"]
    r = interpret_tags(T([("public_transport", "stop_position"), ("light_rail", "yes"), ("bus", "yes")]))
    assert r["categories"] == ["light-rail-station"]  # first-match branch order
    assert interpret_tags(T([("public_transport", "stop_position")])) is None


def test_addr_name_links_and_drop():
    r = interpret_tags(
        T([("amenity", "cafe"), ("addr:street", "Main"), ("name:de", "Kaffee"), ("website", "http://x")])
    )
    assert r["address"] == [{"key": "street", "value": "Main"}]
    assert r["names"] == [{"lang": "de", "values": ["Kaffee"]}]
    assert r["links"] == ["http://x"]
    assert interpret_tags(T([("name", "plain"), ("foo", "bar")])) is None


# --- projections ------------------------------------------------------------


def _nodes_table(rows):
    return pa.Table.from_pylist(rows, schema=NODES)


def test_poi_projection_filters_and_shape():
    t = _nodes_table(
        [
            {"node_id": 1, "lon": 1.0, "lat": 2.0, "tags": T([("name", "A"), ("amenity", "pub")])},
            {"node_id": 2, "lon": 1.0, "lat": 2.0, "tags": T([("amenity", "pub")])},  # no name
            {"node_id": 3, "lon": 1.0, "lat": 2.0, "tags": []},  # no tags
            {"node_id": 4, "lon": 1.0, "lat": 2.0, "tags": T([("name", "B"), ("foo", "x")])},  # no cat
        ]
    )
    out = poi_features_batch(t).to_pylist()
    assert [r["feature_id"] for r in out] == ["osmnode/1"]
    r = out[0]
    assert r["title"] == "A" and r["geom_type"] == "Point" and r["xs"] == [1.0] and r["ys"] == [2.0]


def _cw(way_id, tags, coords):
    nodes = [{"id": i, "lon": x, "lat": y, "tags": []} for i, (x, y) in enumerate(coords)]
    return {"way_id": way_id, "tags": tags, "nodes": nodes, "missing_node_refs": []}


def test_way_projection_polygon_closure():
    t = pa.Table.from_pylist(
        [
            _cw(1, T([("name", "L"), ("highway", "x")]), [(0, 0), (1, 0), (1, 1)]),
            _cw(2, T([("name", "P"), ("building", "yes")]), [(0, 0), (1, 0), (1, 1), (0, 0)]),
        ],
        schema=COMPLETE_WAYS,
    )
    out = way_features_batch(t).to_pylist()
    assert out[0]["geom_type"] == "LineString" and out[1]["geom_type"] == "Polygon"
    assert out[1]["feature_id"] == "osmway/2"
    assert out[1]["xs"] == [0.0, 1.0, 1.0, 0.0]


# --- ring stitching ---------------------------------------------------------


def seg(ids, coords):
    xs = np.array([c[0] for c in coords], float)
    ys = np.array([c[1] for c in coords], float)
    return (ids, xs, ys)


def test_stitch_two_halves_with_reversal():
    a = seg([1, 2, 3], [(0, 0), (2, 0), (2, 2)])
    b = seg([1, 4, 3], [(0, 0), (0, 2), (2, 2)])  # needs reversal
    rings = stitch_rings([a, b])
    assert rings is not None and len(rings) == 1
    ids = rings[0][0]
    assert ids[0] == ids[-1] and set(ids) == {1, 2, 3, 4}


def test_stitch_unclosed_returns_none():
    a = seg([1, 2], [(0, 0), (1, 0)])
    b = seg([3, 4], [(5, 5), (6, 6)])
    assert stitch_rings([a, b]) is None


def test_points_in_ring():
    rx = np.array([0.0, 4.0, 4.0, 0.0, 0.0])
    ry = np.array([0.0, 0.0, 4.0, 4.0, 0.0])
    px = np.array([2.0, 5.0, -1.0])
    py = np.array([2.0, 2.0, 2.0])
    assert points_in_ring(px, py, rx, ry).tolist() == [True, False, False]


def _mp_member(way_id, role):
    return {"id": way_id, "type": "way", "role": role}


def _mp_way(way_id, ids, coords):
    return {
        "way_id": way_id,
        "tags": [],
        "nodes": [{"id": i, "lon": x, "lat": y, "tags": []} for i, (x, y) in zip(ids, coords)],
        "missing_node_refs": [],
    }


def test_assemble_polygon_with_hole():
    members = [_mp_member(10, "outer"), _mp_member(11, "outer"), _mp_member(12, "inner")]
    ways = [
        _mp_way(10, [1, 2, 3], [(0, 0), (4, 0), (4, 4)]),
        _mp_way(11, [3, 4, 1], [(4, 4), (0, 4), (0, 0)]),
        _mp_way(12, [5, 6, 7, 8, 5], [(1, 1), (2, 1), (2, 2), (1, 2), (1, 1)]),
    ]
    geom, reason = assemble_relation_geometry(members, ways)
    assert reason is None
    gt, xs, ys, ro, po = geom
    assert gt == "Polygon" and ro == [0, 5] and po == [0]
    # outer CCW, inner CW
    assert signed_area(np.array(xs[:5]), np.array(ys[:5])) > 0
    assert signed_area(np.array(xs[5:]), np.array(ys[5:])) < 0


def test_assemble_multipolygon_two_outers():
    members = [_mp_member(10, "outer"), _mp_member(11, "outer")]
    ways = [
        _mp_way(10, [1, 2, 3, 1], [(0, 0), (1, 0), (1, 1), (0, 0)]),
        _mp_way(11, [4, 5, 6, 4], [(10, 10), (11, 10), (11, 11), (10, 10)]),
    ]
    geom, reason = assemble_relation_geometry(members, ways)
    assert reason is None and geom[0] == "MultiPolygon"
    assert geom[4] == [0, 1]  # two polygons, one ring each


def test_assemble_rejects_unclosed():
    members = [_mp_member(10, "outer")]
    ways = [_mp_way(10, [1, 2, 3], [(0, 0), (1, 0), (1, 1)])]
    geom, reason = assemble_relation_geometry(members, ways)
    assert geom is None and reason == "unclosed-outer-ring"


def test_vectorized_kernels_match_reference(small_world):
    """features_vec (hot path) ≡ postprocess (per-row reference kernels)."""
    import ray.data as rdd

    from osm2geojson_ray.stages.features_vec import (
        poi_features_batch_vec,
        way_features_batch_vec,
    )
    from osm2geojson_ray.stages.join import j1_way_nodes, j2_complete_ways
    from osm2geojson_ray.stages.parse import way_edges_batch
    from osm2geojson_ray.schema import COMPLETE_WAYS

    nodes_t = small_world["nodes"]
    ways_t = small_world["ways"]

    def canon(t):
        return sorted(t.to_pylist(), key=lambda r: r["feature_id"])

    assert canon(poi_features_batch(nodes_t)) == canon(poi_features_batch_vec(nodes_t))

    cw = j2_complete_ways(
        rdd.from_arrow(ways_t),
        j1_way_nodes(rdd.from_arrow(nodes_t), rdd.from_arrow(way_edges_batch(ways_t)), 8),
        8,
    ).materialize()
    cw_t = pa.Table.from_pylist(cw.take_all(), schema=COMPLETE_WAYS)
    assert canon(way_features_batch(cw_t)) == canon(way_features_batch_vec(cw_t))
