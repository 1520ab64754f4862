"""Pattern scan / redact (stages/scrub.py) vs per-document re reference."""

import re

import pyarrow as pa

import ray.data as rd


def test_pattern_scan_pii_defaults():
    from osm2geojson_ray.stages.scrub import PII_PATTERNS, pattern_scan

    docs = [
        "contact me at alice@example.com or bob.smith@mail.co.uk thanks",
        "call 555-123-4567 or 555.987.6543; ssn 123-45-6789 leaked",
        "server at 192.168.0.1 and 10.0.0.255 no pii here otherwise",
        "perfectly clean document with nothing sensitive at all",
        "",
    ]
    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()), "text": docs})
    # two blocks so the joined-blob offsets are exercised across batches
    ds = rd.from_arrow([t.slice(0, 2), t.slice(2, 3)])
    got = pattern_scan(ds).to_pandas().set_index("doc_id").sort_index()

    for name, pat in PII_PATTERNS.items():
        ref = [len(re.findall(pat, s)) for s in docs]
        assert got[f"n_{name}"].tolist() == ref, name
    assert got["n_email"].tolist() == [2, 0, 0, 0, 0]
    assert got["n_phone"].tolist() == [0, 2, 0, 0, 0]
    assert got["n_ssn"].tolist() == [0, 1, 0, 0, 0]
    assert got["n_ipv4"].tolist() == [0, 0, 2, 0, 0]


def test_pattern_redact_matches_sequential_sub():
    from osm2geojson_ray.stages.scrub import pattern_redact

    pats = {"vowel_run": "[aeiou]{2,}", "scan_sort": r"\b(scan|sort)\b"}
    docs = [
        "scan the stream then sort the queue again",
        "sorting scans are not whole-word scan matches? scan",
        "aeiou ae a e i o u",
        "",
    ]
    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()), "text": docs})
    got = (
        pattern_redact(rd.from_arrow([t.slice(0, 2), t.slice(2, 2)]), pats)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()["clean_text"]
        .tolist()
    )
    ref = docs
    for name, p in pats.items():
        ref = [re.sub(p, f"<{name.upper()}>", s) for s in ref]
    assert got == ref
    # sentinel from pass 1 must not feed pass 2: "stream" -> str<VOWEL_RUN>m
    assert "<VOWEL_RUN>" in got[0] and "<SCAN_SORT>" in got[0]


def test_pattern_scan_separator_never_matches():
    # a match can never span documents: "sca" + "n" split across docs
    from osm2geojson_ray.stages.scrub import pattern_scan

    t = pa.table(
        {"doc_id": pa.array([0, 1], pa.int64()), "text": ["ends with sca", "n starts"]}
    )
    got = (
        pattern_scan(rd.from_arrow(t), {"scan": r"scan"})
        .to_pandas()
        .set_index("doc_id")["n_scan"]
        .tolist()
    )
    assert got == [0, 0]


def test_pattern_redact_nul_in_text():
    # review r5: a NUL byte inside a document must not corrupt the
    # blob's document framing (it is stripped — never legitimate text)
    from osm2geojson_ray.stages.scrub import pattern_redact, pattern_scan

    t = pa.table(
        {"doc_id": pa.array([0, 1], pa.int64()),
         "text": ["evil\x00scan doc", "plain sort doc"]}
    )
    pats = {"scan_sort": r"\b(scan|sort)\b"}
    got = (
        pattern_redact(rd.from_arrow(t), pats)
        .to_pandas().set_index("doc_id")["clean_text"].tolist()
    )
    # NUL stripped -> "evilscan doc": no word boundary before "scan",
    # so nothing redacts in doc 0 — but crucially the framing holds
    # (2 rows out, no ArrowInvalid) and doc 1 is untouched by doc 0
    assert got == ["evilscan doc", "plain <SCAN_SORT> doc"]
    counts = (
        pattern_scan(rd.from_arrow(t), pats)
        .to_pandas().set_index("doc_id")["n_scan_sort"].tolist()
    )
    assert counts == [0, 1]
