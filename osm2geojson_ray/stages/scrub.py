"""Pattern scanning and redaction over the documents table — the
PII-scrub family every production training-data pipeline runs before
release (emails, phone numbers, SSNs, IPs → counts for auditing,
sentinel replacement for the released corpus).

Same execution shape as the XML regex battery (functions/regex.py,
SURVEY §2.3 P1): the batch's texts are joined with a ``\\x00`` separator
no pattern can cross, each compiled pattern runs ONE C scan over the
joined blob, and match positions bin back to documents via
``np.searchsorted`` on the document offsets — per-batch cost is one
``finditer``/``sub`` pass per pattern, never a Python loop over rows.
Patterns are compiled once per actor in ``__init__``.

Patterns must behave identically under Python ``re`` and RE2 (the
DuckDB oracle side): no backreferences, no lookaround, and no
alternation whose branches are prefixes of each other (leftmost-greedy
vs leftmost-longest would then diverge).  The defaults below and the
registry patterns respect this.
"""

from __future__ import annotations

import re
from collections.abc import Mapping

import numpy as np
import pyarrow as pa
import ray.data

SEP = "\x00"

# production battery: the usual release-scrub targets.  On the synthetic
# corpus these match nothing — the registry query uses corpus-calibrated
# patterns instead so the oracle compare carries signal.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def _offsets(texts: list[str]) -> np.ndarray:
    """Start offset of each document inside the SEP-joined blob."""
    lens = np.fromiter((len(s) + 1 for s in texts), np.int64, count=len(texts))
    offs = np.zeros(len(texts) + 1, np.int64)
    np.cumsum(lens, out=offs[1:])
    return offs


def _clean_texts(col: pa.ChunkedArray) -> list[str]:
    """Null → '' and NUL bytes stripped: a document containing ``\\x00``
    would corrupt the blob's document framing (redact's ``split`` would
    yield extra pieces) — NUL is never legitimate text, and a scrub
    stage dropping it is part of the cleaning contract (review r5)."""
    return [
        (s.replace(SEP, "") if s is not None else "") for s in col.to_pylist()
    ]


class PatternScan:
    """Actor-pool stage: per-document match counts for each named
    pattern → (doc_id, n_<name>...).  One C scan per pattern per batch."""

    def __init__(self, patterns: Mapping[str, str] | None = None) -> None:
        self.pats = {k: re.compile(v) for k, v in (patterns or PII_PATTERNS).items()}

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = _clean_texts(t.column("text"))
        n = len(texts)
        cols: dict[str, pa.Array] = {"doc_id": t.column("doc_id")}
        if n == 0:
            for name in self.pats:
                cols[f"n_{name}"] = pa.array([], pa.int64())
            return pa.table(cols)
        blob = SEP.join(texts)
        offs = _offsets(texts)
        for name, pat in self.pats.items():
            starts = np.fromiter(
                (m.start() for m in pat.finditer(blob)), np.int64
            )
            counts = np.bincount(
                np.searchsorted(offs, starts, side="right") - 1, minlength=n
            ) if len(starts) else np.zeros(n, np.int64)
            cols[f"n_{name}"] = pa.array(counts, pa.int64())
        return pa.table(cols)


class PatternRedact:
    """Actor-pool stage: replace every match of every pattern with
    ``<name_upper>`` sentinels → (doc_id, clean_text).  One C ``sub``
    pass per pattern per batch over the joined blob (the separator can
    never match, so substitutions stay within documents)."""

    def __init__(self, patterns: Mapping[str, str] | None = None) -> None:
        self.pats = {k: re.compile(v) for k, v in (patterns or PII_PATTERNS).items()}

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = _clean_texts(t.column("text"))
        if not texts:
            return pa.table(
                {"doc_id": t.column("doc_id"), "clean_text": pa.array([], pa.string())}
            )
        blob = SEP.join(texts)
        for name, pat in self.pats.items():
            blob = pat.sub(f"<{name.upper()}>", blob)
        return pa.table(
            {"doc_id": t.column("doc_id"),
             "clean_text": pa.array(blob.split(SEP), pa.string())}
        )


def pattern_scan(
    docs: ray.data.Dataset,
    patterns: Mapping[str, str] | None = None,
    concurrency=(1, 8),
) -> ray.data.Dataset:
    return docs.map_batches(
        PatternScan,
        fn_constructor_kwargs={"patterns": patterns},
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def pattern_redact(
    docs: ray.data.Dataset,
    patterns: Mapping[str, str] | None = None,
    concurrency=(1, 8),
) -> ray.data.Dataset:
    return docs.map_batches(
        PatternRedact,
        fn_constructor_kwargs={"patterns": patterns},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
