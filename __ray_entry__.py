"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline (interleaved documents → parse →
join DAG → features) on the corpus derived from sf0.001;
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with DuckDB oracles (full-chain SQL re-derivations over the
same parquet bytes).  Ray is initialised by the driver — nothing here
calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

_SF001 = "/root/testdata/sf0.001"
_SF01 = "/root/testdata/sf0.01"


def entry() -> Any:
    """Flagship pipeline on the sf0.001-derived corpus; returns the
    feature table (Dataset)."""
    from osm2geojson_ray import synth
    from osm2geojson_ray.pipelines.osm import OsmPipelineConfig, run_flagship

    path = synth.ensure_corpus_for_sf(_SF001)
    out = run_flagship(path, OsmPipelineConfig(num_parts=16), with_tiles=False)
    return out["features"]


def queries() -> dict[str, Callable[[str], Any]]:
    from osm2geojson_ray.pipelines.queries import OSM_QUERIES

    q: dict[str, Callable[[str], Any]] = dict(OSM_QUERIES)
    try:
        from osm2geojson_ray.pipelines.training import TRAINING_QUERIES

        q.update(TRAINING_QUERIES)
    except ImportError:
        pass
    return q


def oracle_sql() -> dict[str, str]:
    from osm2geojson_ray import synth
    from osm2geojson_ray.pipelines.queries import oracle_queries

    corpus = synth.ensure_corpus_for_sf(_SF01)
    sql = oracle_queries(corpus)
    try:
        from osm2geojson_ray.pipelines.training import init_training_oracles

        sql.update(init_training_oracles(corpus))
    except ImportError:
        pass
    return sql
