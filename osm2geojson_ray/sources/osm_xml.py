"""Raw OSM XML file source (reference S1: bzip2Reader + LineIterable +
OsmBlobIterable, ResourceUtil.java:60-62 / OsmJoin.java:108-109).

Two read modes, both with BOUNDED per-task memory (the r1 reader loaded a
whole file's bytes into one task — a real planet file would not fit):

* **Plain XML** — parallel byte-range ``ReadTask``s (one per
  ``chunk_bytes``), re-synced on element boundaries: a task processes
  exactly the elements whose start tag lies inside its range, reading up
  to ``overlap`` bytes past the range end to complete a straddling
  element (exactly-once per element; all offsets tracked in BYTES so
  multibyte UTF-8 can't shift the boundary arithmetic).
* **bzip2 / gzip** — neither format is block-splittable without an
  index, so one STREAMING ``ReadTask`` per file incrementally
  decompresses and carves complete elements, yielding one Arrow block
  per ~``stream_chunk`` of input; memory is bounded by the chunk size
  plus one partial element (the reference's serial scan, as a streaming
  datasource with backpressure).

Elements larger than ``overlap`` (plain) / unterminated at EOF
(streaming) are dropped — the reference's LineIterable likewise stops at
a truncated element (OsmBlobIterable.java:44-114) — and COUNTED via a
runtime warning (``_warn_truncated``) so truncation on a pathological
file is visible, mirroring the reference's problem-file reporting.
"""

from __future__ import annotations

import bz2
import gzip
import os
import re

import pyarrow as pa

import ray.data
from ray.data.block import BlockMetadata
from ray.data.datasource import Datasource, ReadTask

from ..schema import ELEMENTS
from .documents import chunk_span_regex, normalize_blob_b as _normalize_blob_b

# bytes twin of documents._BLOB_RE (anchor bytes are ASCII; UTF-8
# continuation bytes can't alias '<' or '>')
_BLOB_RE_B = re.compile(
    rb"<(node|way|relation)\b[^>]*?(?:/>|>.*?</\1>)",
    re.DOTALL,
)
# element start tags — used only to DETECT drops: node/way/relation never
# nest in OSM XML, so every start tag should begin exactly one carved blob
_START_RE_B = re.compile(rb"<(?:node|way|relation)\b")

_log = __import__("logging").getLogger(__name__)


def _warn_truncated(n: int, where: str) -> None:
    """Loud runtime counter for elements the reader had to drop (element
    larger than the overlap window, or unterminated at EOF) — mirrors the
    reference's problem-file reporting instead of silent loss."""
    _log.warning(
        "osm_xml: dropped %d truncated element(s) at %s — "
        "raise `overlap` (plain) or check for a cut-off file (streaming)",
        n,
        where,
    )


def _elements_table(doc_id: str, span_idx: int, blobs: list[str]) -> pa.Table:
    return pa.Table.from_pydict(
        {
            "doc_id": [doc_id] * len(blobs),
            "span_idx": [span_idx] * len(blobs),
            "elem_idx": list(range(len(blobs))),
            "xml": blobs,
        },
        schema=ELEMENTS,
    )


def _compression_of(path: str) -> str | None:
    with open(path, "rb") as f:
        magic = f.read(3)
    if magic[:3] == b"BZh":
        return "bz2"
    if magic[:2] == b"\x1f\x8b":
        return "gz"
    return None


def _range_read(path: str, start: int, end: int, overlap: int, span_idx: int):
    """Elements whose start tag lies in byte range [start, end)."""
    with open(path, "rb") as f:
        f.seek(start)
        data = f.read(end - start + overlap)
    limit = end - start
    blobs = [
        _normalize_blob_b(m.group(0))
        for m in _BLOB_RE_B.finditer(data)
        if m.start() < limit
    ]
    # drop detection: every start tag in [0, limit) should have carved a
    # blob (node/way/relation never nest); a surplus start tag is an
    # element bigger than the overlap window that the next task cannot
    # recover either — count it loudly instead of losing it silently
    n_starts = sum(1 for sm in _START_RE_B.finditer(data) if sm.start() < limit)
    if n_starts > len(blobs):
        _warn_truncated(n_starts - len(blobs), f"{path}[{start}:{end}]")
    yield _elements_table(os.path.basename(path), span_idx, blobs)


def _stream_read(path: str, compression: str, stream_chunk: int):
    """Serial streaming decompress; one block per ~stream_chunk of text."""
    opener = {"bz2": bz2.open, "gz": gzip.open}[compression]
    doc_id = os.path.basename(path)
    buf = b""
    span_idx = 0
    with opener(path, "rb") as f:
        while True:
            chunk = f.read(stream_chunk)
            if not chunk:
                break
            buf += chunk
            blobs: list[str] = []
            last_end = 0
            for m in _BLOB_RE_B.finditer(buf):
                blobs.append(_normalize_blob_b(m.group(0)))
                last_end = m.end()
            if blobs:
                yield _elements_table(doc_id, span_idx, blobs)
                span_idx += 1
            # keep only the unfinished tail (a partial element at most)
            buf = buf[last_end:]
    # trailing complete elements with no further input (e.g. final chunk
    # ended exactly at an element close) were already emitted above; an
    # unterminated tail is dropped like the reference's truncated element —
    # but counted loudly, not silently
    n_tail = sum(1 for _ in _START_RE_B.finditer(buf))
    if n_tail:
        _warn_truncated(n_tail, f"{path} (EOF tail)")


class OsmXmlDatasource(Datasource):
    """Ray Data datasource over raw OSM XML files (plain / gz / bz2)."""

    def __init__(
        self,
        paths: list[str],
        chunk_bytes: int = 64 << 20,
        overlap: int = 16 << 20,
        stream_chunk: int = 8 << 20,
    ) -> None:
        self._paths = paths
        self._chunk_bytes = chunk_bytes
        self._overlap = overlap
        self._stream_chunk = stream_chunk

    def estimate_inmemory_data_size(self) -> int | None:
        return sum(os.path.getsize(p) for p in self._paths)

    def get_name(self) -> str:
        return "OsmXml"

    def get_read_tasks(self, parallelism: int) -> list[ReadTask]:
        tasks: list[ReadTask] = []
        for path in self._paths:
            comp = _compression_of(path)
            size = os.path.getsize(path)
            if comp is not None:
                meta = BlockMetadata(
                    num_rows=None, size_bytes=size, exec_stats=None, input_files=[path]
                )
                tasks.append(
                    ReadTask(
                        lambda p=path, c=comp: _stream_read(p, c, self._stream_chunk),
                        meta,
                    )
                )
                continue
            n_chunks = max(1, (size + self._chunk_bytes - 1) // self._chunk_bytes)
            for i in range(n_chunks):
                start = i * self._chunk_bytes
                end = min(size, start + self._chunk_bytes)
                meta = BlockMetadata(
                    num_rows=None,
                    size_bytes=end - start,
                    exec_stats=None,
                    input_files=[path],
                )
                tasks.append(
                    ReadTask(
                        lambda p=path, s=start, e=end, i=i: _range_read(
                            p, s, e, self._overlap, i
                        ),
                        meta,
                    )
                )
        return tasks


def read_osm_xml(
    paths: str | list[str],
    chunk_bytes: int = 64 << 20,
    overlap: int = 16 << 20,
    stream_chunk: int = 8 << 20,
) -> ray.data.Dataset:
    """OSM XML file(s) → ELEMENTS dataset (doc_id = file basename,
    span_idx = read-chunk index, elem_idx = order within chunk).  Plain
    files read as parallel byte ranges; .bz2/.gz stream serially with
    bounded memory."""
    if isinstance(paths, str):
        paths = [paths]
    return ray.data.read_datasource(
        OsmXmlDatasource(
            paths, chunk_bytes=chunk_bytes, overlap=overlap, stream_chunk=stream_chunk
        )
    )


def elements_from_xml_text(doc_id: str, text: str) -> pa.Table:
    """In-memory text → ELEMENTS table (kept for small inputs/tests)."""
    return _elements_table(doc_id, 0, chunk_span_regex(text))
