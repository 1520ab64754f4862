"""osm2geojson_ray — a Ray-Data-native spatial data-processing engine.

A from-scratch engine with the query/data-processing semantics of
jillesvangurp/osm2geojson (reference at /root/reference, surveyed in
SURVEY.md), re-expressed Ray-Data-first:

- input: Lance/Parquet tables of interleaved text+media documents
  ``documents(doc_id, spans: list<struct<kind, text, media_ref, offset>>)``
  whose ``kind='osm_xml'`` spans embed OSM XML fragments;
- parsers: vectorized regex kernels in ``map_batches`` over zero-copy
  Arrow batches (semantics pinned to OsmJoin.java:63-68,155-256);
- joins: the J1..J6 join DAG (OsmJoin.java:258-461) as hash joins +
  hash-partitioned vectorized co-groups;
- post-processing: tag-interpretation rules (OsmPostProcessor.java:244-345)
  producing GeoJSON-like features;
- [EXT] multipolygon ring assembly, cell tiling (quadkey grid standing in
  for H3/S2 — the libraries are not in this container), point-in-polygon,
  kNN, plus training-data ops (dedup family, text analysis, ANN).

No code is copied from the reference; citations are file:line pointers
for semantics parity only.
"""

__version__ = "0.1.0"

import logging as _logging


class _EmptyNewSchemaFilter(_logging.Filter):
    """Drop ONLY the RefBundle-schema-divergence warning whose NEW schema
    is empty.  Ray's streaming executor already ignores an empty OLD
    schema (streaming_executor_state.py) but still warns when an empty
    block (a zero-row map_groups partition from the sort shuffle at small
    scale) follows a schema-ful one — pure noise that buried real drift
    in every bench tail (VERDICT r2 #7).  Divergence between two
    NON-empty schemas still warns."""

    def filter(self, record: _logging.LogRecord) -> bool:  # noqa: A003
        msg = record.getMessage()
        return not (
            "RefBundle with a different schema" in msg
            and "new schema: . This may lead" in msg
        )


_logging.getLogger(
    "ray.data._internal.execution.streaming_executor_state"
).addFilter(_EmptyNewSchemaFilter())
