"""Cell grid + cover + PIP + kNN tests (SURVEY.md §2.9 [EXT])."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from osm2geojson_ray.functions import cells as C
from osm2geojson_ray.functions.geometry import points_in_polygon
from osm2geojson_ray.schema import FEATURES
from osm2geojson_ray.stages.tiling import (
    assign_points_to_polygons,
    knn_points_to_centroids,
    polygon_centroids_batch,
    vertex_cells,
)


def test_cell_ids_roundtrip():
    lon = np.array([-180.0, 0.0, 179.99, 13.4])
    lat = np.array([-90.0, 0.0, 89.99, 52.5])
    for res in (0, 5, 15):
        cid = C.cell_ids(lon, lat, res)
        r, ix, iy = C.cell_components(cid)
        assert (r == res).all()
        assert (ix >= 0).all() and (ix < (1 << res)).all()
        cx, cy = C.cell_center(cid)
        w, h = C.cell_size_deg(res)
        assert (np.abs(cx - lon) <= w).all() and (np.abs(cy - lat) <= h).all()


def test_cell_ids_edge_clamp():
    cid = C.cell_ids(np.array([180.0]), np.array([90.0]), 10)
    _, ix, iy = C.cell_components(cid)
    assert ix[0] == (1 << 10) - 1 and iy[0] == (1 << 10) - 1


def test_neighbor_ring():
    cid = int(C.cell_ids(np.array([0.0]), np.array([0.0]), 8)[0])
    ring1 = C.neighbor_ring(cid, 1)
    assert len(ring1) == 9 and cid in ring1.tolist()


def test_polygon_cover_contains_interior_points():
    xs = np.array([0.0, 3.0, 3.0, 0.0, 0.0])
    ys = np.array([0.0, 0.0, 3.0, 3.0, 0.0])
    res = 10
    cover = set(C.polygon_cover(xs, ys, np.array([0]), res, points_in_polygon).tolist())
    rng = np.random.RandomState(7)
    px = rng.uniform(0.01, 2.99, 200)
    py = rng.uniform(0.01, 2.99, 200)
    pc_ids = C.cell_ids(px, py, res)
    assert set(pc_ids.tolist()) <= cover


def _feat(fid, gtype, xs, ys, ro=(0,), po=(0,)):
    return {
        "feature_id": fid, "osm_type": "way", "osm_id": 1, "title": fid,
        "geom_type": gtype, "xs": list(xs), "ys": list(ys),
        "ring_offsets": list(ro), "poly_offsets": list(po),
        "categories": ["building"], "address": [], "names": [], "links": [],
    }


def test_vertex_cells_distinct():
    t = pa.Table.from_pylist(
        [_feat("a", "LineString", [0.0, 0.0, 50.0], [0.0, 0.0, 50.0])], schema=FEATURES
    )
    out = vertex_cells(rd.from_arrow(t), 10, num_parts=4).take_all()
    assert len(out) == 2  # duplicate vertex cell deduped


def test_pip_assignment_and_knn():
    polys = pa.Table.from_pylist(
        [
            _feat("poly/1", "Polygon", [0, 4, 4, 0, 0], [0, 0, 4, 4, 0]),
            _feat("poly/2", "Polygon", [10, 14, 14, 10, 10], [10, 10, 14, 14, 10]),
        ],
        schema=FEATURES,
    )
    points = pa.Table.from_pylist(
        [
            _feat("pt/in1", "Point", [2.0], [2.0]),
            _feat("pt/in2", "Point", [11.0], [13.0]),
            _feat("pt/out", "Point", [7.0], [7.0]),
        ],
        schema=FEATURES,
    )
    pairs = assign_points_to_polygons(
        rd.from_arrow(points), rd.from_arrow(polys), res=8, num_partitions=4
    ).take_all()
    got = sorted((r["point_id"], r["polygon_id"]) for r in pairs)
    assert got == [("pt/in1", "poly/1"), ("pt/in2", "poly/2")]

    knn = knn_points_to_centroids(rd.from_arrow(points), rd.from_arrow(polys), k=2).take_all()
    by_pt = {}
    for r in knn:
        by_pt.setdefault(r["point_id"], []).append((r["rank"], r["polygon_id"]))
    assert sorted(by_pt["pt/in1"]) == [(1, "poly/1"), (2, "poly/2")]
    assert sorted(by_pt["pt/in2"]) == [(1, "poly/2"), (2, "poly/1")]


def test_centroid_definition():
    t = pa.Table.from_pylist(
        [_feat("p", "Polygon", [0, 2, 2, 0, 0], [0, 0, 2, 2, 0])], schema=FEATURES
    )
    c = polygon_centroids_batch(t).to_pylist()[0]
    # mean over stored vertices incl. closing dup: (0+2+2+0+0)/5, (0+0+2+2+0)/5
    assert c["cx"] == 0.8 and c["cy"] == 0.8


def test_knn_cell_ring_matches_bruteforce(small_world):
    import ray.data as rdd

    from osm2geojson_ray.stages.join import j1_way_nodes, j2_complete_ways
    from osm2geojson_ray.stages.parse import parse_nodes, parse_ways, way_edges
    from osm2geojson_ray.stages.postprocess import poi_features, way_features
    from osm2geojson_ray.stages.tiling import knn_cell_ring, knn_points_to_centroids

    els = rdd.from_arrow(small_world["elements"])
    nodes = parse_nodes(els).materialize()
    ways = parse_ways(els).materialize()
    cw = j2_complete_ways(ways, j1_way_nodes(nodes, way_edges(ways), 8), 8).materialize()
    points = poi_features(nodes).materialize()
    polys = way_features(cw).map_batches(
        lambda t: t.filter(pa.compute.equal(t["geom_type"], "Polygon")),
        batch_format="pyarrow",
    ).materialize()
    brute = sorted(
        (r["point_id"], r["rank"], r["polygon_id"])
        for r in knn_points_to_centroids(points, polys, k=3).take_all()
    )
    ring = sorted(
        (r["point_id"], r["rank"], r["polygon_id"])
        for r in knn_cell_ring(points, polys, k=3, index_res=6).take_all()
    )
    assert brute == ring and len(brute) > 0


def test_polygon_cover_corner_clip_exact():
    # a thin diagonal chord clips the NE cell at the (0,0) grid corner
    # (cell center far outside): the exact supercover must include it —
    # the old half-cell edge sampling missed it (ADVICE r1)
    res = 3  # 45 x 22.5 degree cells; corner (0,0) is a grid corner
    xs = np.array([-1.0, 1.2, -1.0, -1.0])
    ys = np.array([1.2, -1.0, -1.0, 1.2])
    cover = set(C.polygon_cover(xs, ys, np.array([0]), res, points_in_polygon).tolist())
    ne_cell = int(C.cell_ids(np.array([0.05]), np.array([0.05]), res)[0])
    assert ne_cell in cover
    # interior sampling invariant still holds
    rng = np.random.RandomState(3)
    px = rng.uniform(-0.99, 0.0, 100)
    py = rng.uniform(-0.99, 0.0, 100)
    assert set(C.cell_ids(px, py, res).tolist()) <= cover


def test_segment_cells_collinear_on_grid_line():
    # a segment running exactly along a grid line covers cells on BOTH sides
    res = 3
    n = 1 << res
    # grid-space segment along gy = 4 (lat = 0), from gx=3.2 to gx=4.8
    cells = set(C.segment_cells(3.2, 4.0, 4.8, 4.0, n, res).tolist())
    below = int(C.pack(np.array([3]), np.array([3]), res)[0])
    above = int(C.pack(np.array([3]), np.array([4]), res)[0])
    assert below in cells and above in cells


def test_knn_distributed_matches_bruteforce(small_world):
    import ray.data as rdd

    from osm2geojson_ray.stages.join import j1_way_nodes, j2_complete_ways
    from osm2geojson_ray.stages.parse import parse_nodes, parse_ways, way_edges
    from osm2geojson_ray.stages.postprocess import poi_features, way_features
    from osm2geojson_ray.stages.tiling import knn_distributed, knn_points_to_centroids

    els = rdd.from_arrow(small_world["elements"])
    nodes = parse_nodes(els).materialize()
    ways = parse_ways(els).materialize()
    cw = j2_complete_ways(ways, j1_way_nodes(nodes, way_edges(ways), 8), 8).materialize()
    points = poi_features(nodes).materialize()
    polys = way_features(cw).map_batches(
        lambda t: t.filter(pa.compute.equal(t["geom_type"], "Polygon")),
        batch_format="pyarrow",
    ).materialize()
    brute = sorted(
        (r["point_id"], r["rank"], r["polygon_id"])
        for r in knn_points_to_centroids(points, polys, k=3).take_all()
    )
    dist = sorted(
        (r["point_id"], r["rank"], r["polygon_id"])
        for r in knn_distributed(points, polys, k=3, index_res=6, num_parts=4).take_all()
    )
    assert dist == brute and len(brute) > 0


def test_knn_distributed_fine_res_matches_bruteforce(small_world):
    # index_res >= 8 makes min(cell_w, cell_h) < 1 deg: the resolve check
    # must compare the SQUARED kth distance to md*md (ADVICE r2 high) —
    # comparing d2 to linear md wrongly resolved points whose true
    # neighbor sat outside the 3x3 block.
    import ray.data as rdd

    from osm2geojson_ray.stages.join import j1_way_nodes, j2_complete_ways
    from osm2geojson_ray.stages.parse import parse_nodes, parse_ways, way_edges
    from osm2geojson_ray.stages.postprocess import poi_features, way_features
    from osm2geojson_ray.stages.tiling import knn_distributed, knn_points_to_centroids

    els = rdd.from_arrow(small_world["elements"])
    nodes = parse_nodes(els).materialize()
    ways = parse_ways(els).materialize()
    cw = j2_complete_ways(ways, j1_way_nodes(nodes, way_edges(ways), 8), 8).materialize()
    points = poi_features(nodes).materialize()
    polys = way_features(cw).map_batches(
        lambda t: t.filter(pa.compute.equal(t["geom_type"], "Polygon")),
        batch_format="pyarrow",
    ).materialize()
    brute = sorted(
        (r["point_id"], r["rank"], r["polygon_id"])
        for r in knn_points_to_centroids(points, polys, k=3).take_all()
    )
    for res in (8, 9):
        dist = sorted(
            (r["point_id"], r["rank"], r["polygon_id"])
            for r in knn_distributed(points, polys, k=3, index_res=res, num_parts=4).take_all()
        )
        assert dist == brute and len(brute) > 0


def test_knn_distributed_no_polygons(small_world):
    import ray.data as rdd

    from osm2geojson_ray.stages.parse import parse_nodes
    from osm2geojson_ray.stages.postprocess import poi_features
    from osm2geojson_ray.stages.tiling import knn_distributed

    els = rdd.from_arrow(small_world["elements"])
    points = poi_features(parse_nodes(els).materialize()).materialize()
    empty = points.filter(lambda r: False)
    out = knn_distributed(points, empty, k=2, index_res=4, num_parts=2).take_all()
    assert out == []


def test_bbox_query_matches_bruteforce(small_corpus_dir):
    """Tile-index-pruned bbox range query == exact any-vertex-in-box scan."""
    import numpy as np

    from osm2geojson_ray.pipelines.queries import _core
    from osm2geojson_ray.stages.tiling import bbox_query

    sf = "/root/testdata/sf0.001"
    feats = _core(sf, "poi_features").union(_core(sf, "way_features"))
    B = (-150.0, -70.0, -60.0, -20.0)
    got = sorted(bbox_query(feats, B[0], B[1], B[2], B[3], res=7).to_pandas().feature_id)
    t = feats.to_pandas()
    ref = sorted(
        r["feature_id"] for _, r in t.iterrows()
        if ((np.asarray(r["xs"]) >= B[0]) & (np.asarray(r["xs"]) <= B[2])
            & (np.asarray(r["ys"]) >= B[1]) & (np.asarray(r["ys"]) <= B[3])).any()
    )
    assert got == ref and len(got) > 0


def test_knn_distributed_empty_point_blocks():
    """Regression (32-CPU sf0.001): features blocks with NO Point rows
    filter to empty inside _points_flat, and the next map (cell-id
    append) turns them into ZERO-COLUMN blocks the native join planner
    rejects once a join partition receives only those.  knn_distributed
    now compacts the frontier; result must still match brute force."""
    import ray as raylib
    import ray.data as rdd

    from osm2geojson_ray.functions.joins import compact_nonempty_blocks
    from osm2geojson_ray.stages.tiling import knn_distributed, knn_points_to_centroids

    def feat(ids, gts, coords):
        return pa.table(
            {
                "feature_id": pa.array(ids, pa.string()),
                "geom_type": pa.array(gts, pa.string()),
                "xs": pa.array([[c[0]] for c in coords], pa.list_(pa.float64())),
                "ys": pa.array([[c[1]] for c in coords], pa.list_(pa.float64())),
            }
        )

    # 6 blocks, 4 of them carrying ONLY LineString rows (no Points)
    blocks = [
        feat(["p1", "p2"], ["Point", "Point"], [(1.0, 1.0), (50.0, 10.0)]),
        feat(["l1"], ["LineString"], [(0.0, 0.0)]),
        feat(["l2"], ["LineString"], [(0.0, 0.0)]),
        feat(["p3"], ["Point"], [(-40.0, -20.0)]),
        feat(["l3"], ["LineString"], [(0.0, 0.0)]),
        feat(["l4"], ["LineString"], [(0.0, 0.0)]),
    ]
    # chain an identity map so the Point filter inside _points_flat is
    # NOT the first map over the raw blocks (matches the real pipeline)
    points = rdd.from_arrow(blocks).map_batches(lambda t: t, batch_format="pyarrow")
    polys = rdd.from_arrow(
        feat(
            ["a", "b", "c"],
            ["Polygon"] * 3,
            [(0.0, 0.0), (45.0, 12.0), (-39.0, -21.0)],
        )
    )
    brute = sorted(
        (r["point_id"], r["rank"], r["polygon_id"])
        for r in knn_points_to_centroids(points, polys, k=2).take_all()
    )
    dist = sorted(
        (r["point_id"], r["rank"], r["polygon_id"])
        for r in knn_distributed(points, polys, k=2, index_res=4, num_parts=8).take_all()
    )
    assert dist == brute and len(brute) == 6  # 3 points x k=2

    # direct unit: compact drops zero-column empties, keeps all rows
    chain = (
        rdd.from_arrow(blocks)
        .map_batches(
            lambda t: t.filter(pa.compute.equal(t.column("geom_type"), "Point")),
            batch_format="pyarrow",
        )
        .map_batches(lambda t: t, batch_format="pyarrow")
    )
    compacted = compact_nonempty_blocks(chain)
    tabs = raylib.get(compacted.to_arrow_refs())
    assert all(t.num_rows > 0 and "feature_id" in t.schema.names for t in tabs)
    assert sum(t.num_rows for t in tabs) == 3


def test_knn_distributed_no_points():
    """review r5: an ALL-empty frontier cannot be repaired by compacting
    (no block carries a schema) — zero points must short-circuit to an
    empty result instead of feeding zero-column blocks to the join."""
    import ray.data as rdd

    from osm2geojson_ray.stages.tiling import knn_distributed

    def feat(ids, gts, coords):
        return pa.table(
            {
                "feature_id": pa.array(ids, pa.string()),
                "geom_type": pa.array(gts, pa.string()),
                "xs": pa.array([[c[0]] for c in coords], pa.list_(pa.float64())),
                "ys": pa.array([[c[1]] for c in coords], pa.list_(pa.float64())),
            }
        )

    # only LineStrings -> _points_flat output is empty in every block;
    # the identity map makes the empties zero-column
    points = rdd.from_arrow(
        [feat(["l1"], ["LineString"], [(0.0, 0.0)]),
         feat(["l2"], ["LineString"], [(1.0, 1.0)])]
    ).map_batches(lambda t: t, batch_format="pyarrow")
    polys = rdd.from_arrow(feat(["a"], ["Polygon"], [(0.0, 0.0)]))
    out = knn_distributed(points, polys, k=2, index_res=4, num_parts=4)
    assert out.count() == 0
    # (to_pandas on an empty Dataset drops columns — a Ray quirk —
    # so assert on the Dataset schema)
    assert out.schema().names == ["point_id", "polygon_id", "rank"]
