"""Batch regex kernels.

The reference parses OSM XML with six compiled regexes, no XML parser
(OsmJoin.java:63-68).  Those exact patterns define the conformance
semantics (attribute-order tolerance, first-match-wins, lazy groups), so
they are reproduced here verbatim as Python patterns.

To keep the hot path out of per-row Python, ``batch_findall`` runs one
``finditer`` over a single separator-joined blob of the whole batch and
maps matches back to rows with ``numpy.searchsorted`` — one C regex scan
per batch instead of one per row.
"""

from __future__ import annotations

import re

import numpy as np

# OsmJoin.java:63-68 — ported pattern-for-pattern.  The reference's lazy
# wildcard groups ``(.*?)"`` are rewritten as the equivalent negated
# classes ``([^\n\x00"]*)"`` — identical matches on any real row (``.``
# already excludes ``\n``; a lazy group stopping at the first ``"`` can
# never contain one) with the batch separator ``\x00`` additionally
# excluded, so a match can never straddle two joined rows even on
# malformed input (a ``k=`` with no following ``v=``).
ID_PATTERN = re.compile(r'id="([0-9]+)')
LAT_PATTERN = re.compile(r'lat="(-?[0-9]+(?:\.[0-9]+)?)')
LON_PATTERN = re.compile(r'lon="(-?[0-9]+(?:\.[0-9]+)?)')
KV_PATTERN = re.compile(r'k="([^\n\x00"]*)"\s+v="([^\n\x00"]*)"')
ND_PATTERN = re.compile(r'nd ref="([0-9]+)')
MEMBER_PATTERN = re.compile(r'member type="([^\n\x00"]*)" ref="([0-9]+)" role="([^\n\x00"]*)"')

# Separator that can never appear inside OSM XML text (control char).
_SEP = "\x00"


def _join_with_offsets(texts: list[str]) -> tuple[str, np.ndarray]:
    """Join texts with a sentinel; return blob + start offset of each row."""
    starts = np.empty(len(texts) + 1, dtype=np.int64)
    pos = 0
    for i, t in enumerate(texts):
        starts[i] = pos
        pos += len(t) + 1
    starts[len(texts)] = pos
    return _SEP.join(texts) + _SEP, starts


def batch_findall(texts: list[str], pattern: re.Pattern) -> tuple[np.ndarray, list[tuple]]:
    """All matches of ``pattern`` across a batch of rows.

    Returns ``(row_idx, groups)`` where ``row_idx[i]`` is the row of match i
    and ``groups[i]`` is the match's group tuple.  Matches cannot straddle
    rows: every wildcard group in the pattern battery explicitly excludes
    the ``\\x00`` separator (see pattern definitions above), and every
    fixed part of each pattern is separator-free, so no match can span two
    joined rows even on malformed input.
    """
    if not texts:
        return np.empty(0, dtype=np.int64), []
    blob, starts = _join_with_offsets(texts)
    positions: list[int] = []
    groups: list[tuple] = []
    for m in pattern.finditer(blob):
        positions.append(m.start())
        groups.append(m.groups())
    if not positions:
        return np.empty(0, dtype=np.int64), []
    row_idx = np.searchsorted(starts, np.asarray(positions, dtype=np.int64), side="right") - 1
    return row_idx, groups


def batch_first_match(texts: list[str], pattern: re.Pattern) -> list[tuple | None]:
    """First match per row (Java ``Matcher.find()`` semantics) or None."""
    row_idx, groups = batch_findall(texts, pattern)
    out: list[tuple | None] = [None] * len(texts)
    for r, g in zip(row_idx.tolist(), groups):
        if out[r] is None:
            out[r] = g
    return out


# ---------------------------------------------------------------------------
# XML unescape (nodes only — OsmJoin.java:170 vs the :198 quirk where way /
# relation tag values are NOT unescaped; replicated by the callers).
# ---------------------------------------------------------------------------

_ENTITY = re.compile(r"&(amp|lt|gt|quot|apos|#[0-9]+|#x[0-9a-fA-F]+);")
_NAMED = {"amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'"}


def _entity_repl(m: re.Match) -> str:
    body = m.group(1)
    if body in _NAMED:
        return _NAMED[body]
    if body.startswith("#x") or body.startswith("#X"):
        return chr(int(body[2:], 16))
    return chr(int(body[1:]))


def unescape_xml(value: str) -> str:
    """Single-pass XML entity unescape (StringEscapeUtils.unescapeXml analog)."""
    if "&" not in value:
        return value
    return _ENTITY.sub(_entity_repl, value)
