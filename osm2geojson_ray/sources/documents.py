"""Document source + OSM-element span extraction.

The reference streams one bzip2 XML file through ``OsmBlobIterable``
(OsmBlobIterable.java:44-114), an inherently serial scan.  Here the input
is a table of interleaved documents whose ``osm_xml`` spans each embed a
small, self-contained chunk of OSM XML lines — so chunking becomes an
embarrassingly parallel per-span kernel inside ``map_batches``
(SURVEY.md §2.1 S2).

Span invariant (BASELINE.json input_hint): extraction produces a *new*
elements dataset keyed by (doc_id, span_idx, elem_idx) and never mutates
the source rows, so per-row span-sequence equality on
(kind, text, media_ref, order) holds trivially; ``span_signature`` lets
tests assert it through any stage that carries ``spans``.
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa

import ray.data

from ..schema import ELEMENTS

# fast path: one C-regex scan per span.  Matches a complete element blob —
# self-closing or with matching close tag.  Equivalent to the line-based
# reference chunker on well-formed input (asserted in tests).
_BLOB_RE = re.compile(
    r"<(node|way|relation)\b[^>]*?(?:/>|>.*?</\1>)",
    re.DOTALL,
)

_WS_RE = re.compile(r"\n\s*")

# bytes twins for the batched buffer scan (extract_elements hot path):
# every wildcard additionally excludes the \x00 batch sentinel so a
# truncated element in one span can never close on a tag in the next row
_BLOB_RE_B = re.compile(rb"<(node|way|relation)\b[^>\x00]*?(?:/>|>[^\x00]*?</\1>)")
_WS_RE_B = re.compile(rb"\n\s*")


def normalize_blob_b(raw: bytes) -> str:
    """Decode one element blob and apply the chunker's newline
    normalization (bytes twin of the chunk_span_regex normalization)."""
    return _WS_RE_B.sub(lambda m: m.group(0).replace(b"\n", b""), raw).decode(
        "utf-8", errors="replace"
    )


def chunk_span_lines(text: str) -> list[str]:
    """Line-based chunker, semantics ported from OsmBlobIterable.java:44-114.

    Yields one complete <node>/<way>/<relation> blob per element; skips
    junk lines; concatenates continuation lines without separators (the
    reference appends raw lines to one StringBuilder) and strips the
    result.  Divergence (documented): the reference tests the *stripped*
    line for ``/>`` on nodes but the raw line on ways/relations
    (OsmBlobIterable.java:64 vs :74,:84); we use the stripped line for all
    three — they differ only for trailing whitespace on self-closing
    way/relation lines, which would make the reference lose the blob.
    """
    out: list[str] = []
    lines = text.split("\n")
    i = 0
    n = len(lines)
    while i < n:
        line = lines[i]
        stripped = line.strip()
        kind = None
        for k in ("node", "way", "relation"):
            if stripped.startswith(f"<{k}"):
                kind = k
                break
        if kind is None:
            i += 1
            continue
        buf = [line]
        if not stripped.endswith("/>"):
            close = f"</{kind}>"
            while not lines[i].strip().endswith(close):
                i += 1
                if i >= n:  # truncated element: reference would StopIteration
                    buf = None
                    break
                buf.append(lines[i])
        if buf is not None:
            out.append("".join(buf).strip())
        i += 1
    return out


def chunk_span_regex(text: str) -> list[str]:
    """Regex fast-path chunker; blobs normalized like the line chunker:
    the reference concatenates raw lines into one StringBuilder, so EVERY
    newline disappears while all other whitespace (indentation, blank-line
    spaces) is kept — hence ``replace("\\n", "")`` over each whitespace
    run, which also keeps the two chunkers equal on blank lines inside an
    element (equality-tested in tests/test_sources_sinks.py)."""
    return [
        _WS_RE.sub(lambda m: m.group(0).replace("\n", ""), m.group(0))
        for m in _BLOB_RE.finditer(text)
    ]


def read_documents(path: str, **kwargs) -> ray.data.Dataset:
    """Read a documents table.  Lance is the intended at-scale format
    (read_lance); this container has no lance wheel, so parquet is the
    tested storage with identical schema."""
    try:  # pragma: no cover - lance not installed in this container
        import lance  # noqa: F401

        return ray.data.read_lance(path, **kwargs)
    except ImportError:
        return ray.data.read_parquet(path, **kwargs)


def extract_elements_batch(batch: pa.Table) -> pa.Table:
    """documents batch → elements batch (ELEMENTS schema).

    Vectorized: spans flatten + kind filter in Arrow; ONE bytes regex
    scan over the filtered text column's UTF-8 buffer carves every
    element (functions.regex.batch_finditer); only the matched blobs
    touch Python.  Output equals the per-span chunk_span_regex path
    (parity-tested in tests/test_parse.py)."""
    import numpy as np
    import pyarrow.compute as pc

    from ..functions.regex import batch_finditer

    spans = batch.column("spans").combine_chunks()
    lens = np.asarray(spans.value_lengths().fill_null(0), dtype=np.int64)
    doc_rep = np.repeat(np.asarray(batch.column("doc_id").to_pandas(), dtype=object), lens)
    span_idx = (
        np.concatenate([np.arange(n, dtype=np.int64) for n in lens])
        if lens.sum()
        else np.empty(0, np.int64)
    )
    flat = spans.flatten()
    mask = pc.equal(flat.field("kind"), "osm_xml")
    mask_np = np.asarray(mask.combine_chunks() if isinstance(mask, pa.ChunkedArray) else mask)
    texts = flat.field("text").filter(mask)
    d_ids = doc_rep[mask_np]
    s_idx = span_idx[mask_np]
    row_idx, matches = batch_finditer(texts, _BLOB_RE_B)
    xmls = [normalize_blob_b(m) for m in matches]
    # per-span element index (matches are emitted in row-major order)
    counts = (
        np.bincount(row_idx, minlength=len(texts)) if len(row_idx) else np.zeros(len(texts), np.int64)
    )
    offsets = np.zeros(len(texts) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    elem_idx = (
        (np.arange(len(row_idx)) - offsets[row_idx]).astype(np.int64)
        if len(row_idx)
        else np.empty(0, np.int64)
    )
    return pa.Table.from_pydict(
        {
            "doc_id": d_ids[row_idx] if len(row_idx) else [],
            "span_idx": s_idx[row_idx] if len(row_idx) else [],
            "elem_idx": elem_idx,
            "xml": xmls,
        },
        schema=ELEMENTS,
    )


def extract_elements(documents: ray.data.Dataset) -> ray.data.Dataset:
    return documents.map_batches(extract_elements_batch, batch_format="pyarrow", zero_copy_batch=True)


def span_signature(batch: pa.Table) -> list[str]:
    """Per-row digest of the span sequence (kind, text, media_ref, order) —
    the invariant every documents-touching stage must preserve."""
    sigs = []
    for spans in batch.column("spans").to_pylist():
        h = hashlib.sha256()
        for order, s in enumerate(spans or []):
            h.update(
                f"{order}\x1f{s['kind']}\x1f{s['text']}\x1f{s['media_ref']}\x1e".encode()
            )
        sigs.append(h.hexdigest())
    return sigs
