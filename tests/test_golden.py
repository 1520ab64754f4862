"""F5 golden corpus: end-to-end feature + tile output of the 120-doc
mini-world, frozen as a JSON snapshot (tests/golden/).  Catches any
regression in parse → join → feature → tiling semantics that the
per-stage tests might miss.

Regenerate intentionally with:  OSMRAY_REGEN_GOLDEN=1 pytest tests/test_golden.py
"""

import gzip
import json
import os

import pytest

import ray.data as rd

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "mini_world.json.gz")


def _canonical_features(small_corpus_dir):
    from osm2geojson_ray.pipelines.osm import OsmPipelineConfig, build
    from osm2geojson_ray.sources.documents import read_documents
    from osm2geojson_ray.sources.sinks import feature_to_geojson
    from osm2geojson_ray.stages.tiling import vertex_cells

    g = build(read_documents(small_corpus_dir), OsmPipelineConfig(num_parts=8))
    feats = g["features"].materialize()
    rows = sorted(feats.take_all(), key=lambda r: r["feature_id"])
    tiles = sorted(
        (r["feature_id"], r["cell_id"])
        for r in vertex_cells(feats, 15, num_parts=8).take_all()
    )
    return {
        "features": [feature_to_geojson(r) for r in rows],
        "tiles": [[f, c] for f, c in tiles],
    }


def test_golden_end_to_end(small_corpus_dir):
    got = _canonical_features(small_corpus_dir)
    if os.environ.get("OSMRAY_REGEN_GOLDEN") or not os.path.exists(GOLDEN):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        with gzip.open(GOLDEN, "wt") as f:
            json.dump(got, f, sort_keys=True)
        if not os.environ.get("OSMRAY_REGEN_GOLDEN"):
            pytest.skip("golden snapshot created; rerun to verify")
    with gzip.open(GOLDEN, "rt") as f:
        want = json.load(f)
    assert got["tiles"] == [tuple(x) if isinstance(x, tuple) else x for x in want["tiles"]] or got["tiles"] == want["tiles"]
    assert len(got["features"]) == len(want["features"])
    for a, b in zip(got["features"], want["features"]):
        assert a == b, f"feature mismatch: {a.get('id')}"


def test_overlap_stages_parity(small_corpus_dir):
    """Concurrent materialization of independent DAG branches (overlap_stages)
    is a scheduling choice only — features identical to the serial path."""
    from osm2geojson_ray.pipelines.osm import OsmPipelineConfig, build
    from osm2geojson_ray.sources.documents import read_documents

    def feats(overlap):
        g = build(
            read_documents(small_corpus_dir),
            OsmPipelineConfig(num_parts=8, overlap_stages=overlap),
        )
        return sorted(
            ((r["feature_id"], r["geom_type"], tuple(r["xs"]), tuple(r["ys"]))
             for r in g["features"].take_all()),
        )

    assert feats(True) == feats(False)

def test_auto_num_parts_rule():
    """Byte-driven partition count with a parallelism floor and a cap."""
    from osm2geojson_ray.functions.grouping import auto_num_parts

    mb = 1024 * 1024
    assert auto_num_parts(10 * mb, cpus=4, target_mb=64) == 8      # floor max(8, cpus)
    assert auto_num_parts(10 * mb, cpus=32, target_mb=64) == 32    # cpu floor
    assert auto_num_parts(960 * mb, cpus=8, target_mb=64) == 15    # byte-driven
    assert auto_num_parts(960 * mb, cpus=2, target_mb=64) == 15    # same job at N and 4N
    assert auto_num_parts(10**15, cpus=32, target_mb=64) == 131072  # cap


def test_auto_num_parts_build_parity(small_corpus_dir):
    """num_parts='auto' is a partition-count choice only — identical
    features to an explicit count."""
    from osm2geojson_ray.pipelines.osm import OsmPipelineConfig, build
    from osm2geojson_ray.sources.documents import read_documents

    def feats(np_):
        g = build(
            read_documents(small_corpus_dir),
            OsmPipelineConfig(num_parts=np_),
        )
        return sorted(
            (r["feature_id"], r["geom_type"], tuple(r["xs"]), tuple(r["ys"]))
            for r in g["features"].take_all()
        )

    assert feats("auto") == feats(8)

def test_overlap_features_parity(small_corpus_dir):
    """Folding the feature projections into the join fanouts
    (overlap_features) is a scheduling choice only."""
    from osm2geojson_ray.pipelines.osm import OsmPipelineConfig, build
    from osm2geojson_ray.sources.documents import read_documents

    def feats(flag):
        g = build(
            read_documents(small_corpus_dir),
            OsmPipelineConfig(num_parts=8, overlap_features=flag),
        )
        return sorted(
            (r["feature_id"], r["geom_type"], tuple(r["xs"]), tuple(r["ys"]))
            for r in g["features"].take_all()
        )

    assert feats(True) == feats(False)
