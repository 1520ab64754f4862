"""Flagship pipeline: interleaved documents → parsed entities → join DAG →
features → tiles (the reference's OsmJoin.processAll + OsmPostProcessor.main
end-to-end, SURVEY.md §3, plus the [EXT] tiling layer)."""

from __future__ import annotations

from dataclasses import dataclass

import ray.data

from ..sources.documents import extract_elements, read_documents
from ..stages import join as J
from ..stages import parse as P
from ..stages.postprocess import poi_features, way_features
from ..stages.rings import relation_features, ring_rejects
from ..stages.tiling import (
    assign_points_to_polygons,
    knn_points_to_centroids,
    vertex_cells,
)


@dataclass
class OsmPipelineConfig:
    num_parts: int = 64          # hash-shuffle partition count
    salt: int | None = None      # >1 enables salted mega-key collect
    tile_res: int = 15           # cell grid resolution
    knn_k: int = 2


def build(documents: ray.data.Dataset, cfg: OsmPipelineConfig = OsmPipelineConfig()):
    """Lazy dataset graph for every stage output.  Nothing executes until a
    consuming call; Ray's streaming executor pipelines the whole DAG."""
    elements = extract_elements(documents)
    nodes = P.parse_nodes(elements)
    ways = P.parse_ways(elements)
    relations = P.parse_relations(elements)
    rejects = P.parse_rejects(elements)
    dag = J.build_join_dag(
        nodes, ways, relations,
        P.way_edges(ways), P.node_rel_edges(relations), P.way_rel_edges(relations),
        num_parts=cfg.num_parts, salt=cfg.salt,
    )
    pois = poi_features(nodes)
    wfeat = way_features(dag["complete_ways"])
    rfeat = relation_features(dag["complete_relations"])
    features = pois.union(wfeat).union(rfeat)
    return {
        "elements": elements,
        "nodes": nodes,
        "ways": ways,
        "relations": relations,
        "rejects": rejects,
        **dag,
        "poi_features": pois,
        "way_features": wfeat,
        "relation_features": rfeat,
        "ring_rejects": ring_rejects(dag["complete_relations"]),
        "features": features,
    }


def run_flagship(
    documents_path: str,
    cfg: OsmPipelineConfig = OsmPipelineConfig(),
    with_tiles: bool = True,
):
    """Materialize the feature table (and tiles) from a documents corpus.

    Returns dict of materialized datasets — features, tiles, pip pairs,
    knn pairs."""
    docs = read_documents(documents_path)
    g = build(docs, cfg)
    features = g["features"].materialize()
    out = {"features": features, "rejects": g["rejects"], "ring_rejects": g["ring_rejects"]}
    if with_tiles:
        out["tiles"] = vertex_cells(features, cfg.tile_res)
        import pyarrow as pa
        import pyarrow.compute as pc

        polys = features.map_batches(
            lambda t: t.filter(
                pc.is_in(t["geom_type"], value_set=pa.array(["Polygon", "MultiPolygon"]))
            ),
            batch_format="pyarrow",
        )
        points = features.map_batches(
            lambda t: t.filter(pc.equal(t["geom_type"], "Point")),
            batch_format="pyarrow",
        )
        out["pip"] = assign_points_to_polygons(points, polys, cfg.tile_res)
        out["knn"] = knn_points_to_centroids(points, polys, k=cfg.knn_k)
    return out
