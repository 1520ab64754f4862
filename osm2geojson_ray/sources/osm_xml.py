"""Raw OSM XML file source (reference S1: bzip2Reader + LineIterable +
OsmBlobIterable, ResourceUtil.java:60-62 / OsmJoin.java:108-109).

The reference streams one planet file serially.  Here each *file* is one
parallel unit: ``read_binary_files`` → per-file decompress (bz2/gzip by
extension, stdlib) → the same chunker the span source uses.  For
planet-scale input the corpus should be sharded into many files (or
pre-converted to the interleaved documents table, the engine's primary
input); within-file parallel splitting of one giant bz2 stream is
intentionally out of scope — bzip2 is not block-splittable without an
index.
"""

from __future__ import annotations

import bz2
import gzip
import os

import pyarrow as pa

import ray.data

from ..schema import ELEMENTS
from .documents import chunk_span_regex


def _decompress(path: str, data: bytes) -> str:
    # detect by magic bytes, not extension — ray's read_binary_files may
    # already have transparently decompressed .gz via the arrow filesystem
    if data[:3] == b"BZh":
        return bz2.decompress(data).decode("utf-8", errors="replace")
    if data[:2] == b"\x1f\x8b":
        return gzip.decompress(data).decode("utf-8", errors="replace")
    return data.decode("utf-8", errors="replace")


def elements_from_xml_text(doc_id: str, text: str) -> pa.Table:
    blobs = chunk_span_regex(text)
    return pa.Table.from_pydict(
        {
            "doc_id": [doc_id] * len(blobs),
            "span_idx": [0] * len(blobs),
            "elem_idx": list(range(len(blobs))),
            "xml": blobs,
        },
        schema=ELEMENTS,
    )


def read_osm_xml(paths: str | list[str]) -> ray.data.Dataset:
    """OSM XML file(s) → ELEMENTS dataset (doc_id = file basename)."""
    files = ray.data.read_binary_files(paths, include_paths=True)

    def f(batch: pa.Table) -> pa.Table:
        tables = []
        for path, data in zip(batch.column("path").to_pylist(), batch.column("bytes").to_pylist()):
            text = _decompress(path, data)
            tables.append(elements_from_xml_text(os.path.basename(path), text))
        if not tables:
            return pa.Table.from_pydict(
                {"doc_id": [], "span_idx": [], "elem_idx": [], "xml": []}, schema=ELEMENTS
            )
        return pa.concat_tables(tables)

    return files.map_batches(f, batch_format="pyarrow", batch_size=1)
