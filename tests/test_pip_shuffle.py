"""Shuffle-based PIP assignment matches the broadcast variant on the
synthetic corpus (scale path vs baseline)."""

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from osm2geojson_ray.stages.tiling import (
    assign_points_to_polygons,
    assign_points_to_polygons_broadcast,
)


def test_pip_shuffle_matches_broadcast(small_world):
    from osm2geojson_ray.stages.join import j1_way_nodes, j2_complete_ways
    from osm2geojson_ray.stages.parse import parse_nodes, parse_ways, way_edges
    from osm2geojson_ray.stages.postprocess import poi_features, way_features

    els = rd.from_arrow(small_world["elements"])
    nodes = parse_nodes(els).materialize()
    ways = parse_ways(els).materialize()
    cw = j2_complete_ways(ways, j1_way_nodes(nodes, way_edges(ways), 8), 8).materialize()
    points = poi_features(nodes).materialize()
    polys = (
        way_features(cw)
        .map_batches(
            lambda t: t.filter(pc.equal(t["geom_type"], "Polygon")), batch_format="pyarrow"
        )
        .materialize()
    )
    # default is now the shuffle scale path; broadcast is the baseline twin
    a = sorted(
        (r["point_id"], r["polygon_id"])
        for r in assign_points_to_polygons_broadcast(points, polys, res=15, num_partitions=4).take_all()
    )
    b = sorted(
        (r["point_id"], r["polygon_id"])
        for r in assign_points_to_polygons(points, polys, res=15, num_partitions=4).take_all()
    )
    assert a == b
    assert len(a) > 0
