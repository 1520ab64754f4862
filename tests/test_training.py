"""Training-data ops: dedup family, text analysis, ANN, events, media
stub — plus the span-sequence invariant property test."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from osm2geojson_ray.functions import hashing as H
from osm2geojson_ray.stages import dedup as D
from osm2geojson_ray.stages import events as EV
from osm2geojson_ray.stages import similarity as S
from osm2geojson_ray.stages import text as T

SF = "/root/testdata/sf0.001"


def docs_ds():
    return rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text", "source"])


def test_hashing_matches_duckdb():
    import duckdb

    con = duckdb.connect()
    for s in ["abc", "the fast key", "media://img/000001-3.png"]:
        sql = con.execute(
            "SELECT ('0x' || substr(md5(?),1,15))::BIGINT", [s]
        ).fetchone()[0]
        assert sql == H.md5int60(s)


def test_minhash_similar_texts_collide():
    a = "the fast key order sort table scan merge part window small hash"
    b = "the fast key order sort table scan merge part window small join"  # 1 token diff
    c = "completely different words entirely unrelated content here now ok"
    sa, sb, sc = (H.band_keys(H.minhash_signature(x)) for x in (a, b, c))
    assert set(sa) & set(sb)          # near-dups share ≥1 band
    assert not (set(sa) & set(sc))


def test_simhash_stability():
    a = "the fast key order sort"
    assert H.simhash16(a) == H.simhash16(a)
    assert 0 <= H.simhash16(a) < (1 << 16)


def test_dedup_exact_keeps_min_id():
    t = pa.table({"doc_id": [5, 3, 9, 7], "text": ["x", "x", "y", "y"]})
    out = sorted(r["doc_id"] for r in D.dedup_exact(rd.from_arrow(t), num_parts=4).take_all())
    assert out == [3, 7]


def test_ngram_jaccard_finds_planted_dup():
    rows = [
        {"doc_id": 1, "source": "s", "text": "a b c d e f g h"},
        {"doc_id": 2, "source": "s", "text": "a b c d e f g x"},   # high overlap
        {"doc_id": 3, "source": "s", "text": "q r s t u v w z"},
        {"doc_id": 4, "source": "t", "text": "a b c d e f g h"},   # other source
    ]
    out = D.ngram_jaccard_pairs(rd.from_arrow(pa.Table.from_pylist(rows)), 0.4, num_parts=4).take_all()
    assert sorted((r["doc_a"], r["doc_b"]) for r in out) == [(1, 2)]


def test_ngram_jaccard_short_doc_fallback_parity():
    """Docs with < SHINGLE_K tokens take the whole-text-hash fallback in
    the vectorized explode (r5); the emitted pairs must match brute-force
    jaccard over the scalar H.shingles() string sets — including
    short×short exact matches and short×long non-matches."""
    rows = [
        {"doc_id": 1, "source": "s", "text": "a b"},          # 2 tokens
        {"doc_id": 2, "source": "s", "text": "a b"},          # dup of 1
        {"doc_id": 3, "source": "s", "text": "a"},            # 1 token
        {"doc_id": 4, "source": "s", "text": ""},             # empty
        {"doc_id": 5, "source": "s", "text": ""},             # dup of 4
        {"doc_id": 6, "source": "s", "text": "a b c d"},      # long
        {"doc_id": 7, "source": "s", "text": "a b c d"},      # dup of 6
    ]
    thr = 0.5
    exp = []
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            sa, sb = set(H.shingles(rows[i]["text"])), set(H.shingles(rows[j]["text"]))
            if sa | sb and len(sa & sb) / len(sa | sb) >= thr:
                exp.append((rows[i]["doc_id"], rows[j]["doc_id"]))
    assert exp  # the fixture plants short-doc pairs by construction
    for small_plan_rows in (10_000, 0):  # both plans
        got = sorted(
            (r["doc_a"], r["doc_b"])
            for r in D.ngram_jaccard_pairs(
                rd.from_arrow(pa.Table.from_pylist(rows)), thr, num_parts=4,
                small_plan_rows=small_plan_rows,
            ).take_all()
        )
        assert got == sorted(exp)


def test_embedding_dups_lsh_mode_matches_exact_at_gate_scale():
    # VERDICT r2 #4: the ANN-gated candidate generation (L seeded
    # hyperplane tables + exact verify) must reproduce the exact-mode
    # pair set at the gate scale (deterministic: seeded planes).
    from osm2geojson_ray.pipelines.training import EMB_DUP_THRESHOLD

    sf = "/root/testdata/sf0.01"
    emb = rd.read_parquet(f"{sf}/embeddings.parquet")
    exact = sorted(
        (r["vec_a"], r["vec_b"])
        for r in D.embedding_dup_pairs(emb, EMB_DUP_THRESHOLD, num_parts=4).take_all()
    )
    lsh = sorted(
        (r["vec_a"], r["vec_b"])
        for r in D.embedding_dup_pairs(
            emb, EMB_DUP_THRESHOLD, num_parts=4, mode="lsh"
        ).take_all()
    )
    assert exact == lsh and len(exact) > 0


def test_ann_lsh_recall_vs_bruteforce():
    emb = rd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    brute = S.ann_bruteforce(emb, query_every=50, k=5, num_parts=4).take_all()
    lsh = S.ann_lsh(emb, query_every=50, k=5, num_parts=4).take_all()
    bset = {(r["query_id"], r["neighbor_id"]) for r in brute}
    lset = {(r["query_id"], r["neighbor_id"]) for r in lsh}
    # self-match must always be found by LSH (same bucket)
    queries = {r["query_id"] for r in brute}
    assert all((q, q) in lset for q in queries)
    recall = len(bset & lset) / len(bset)
    assert recall > 0.2  # approximate by design; bucketing trades recall for scale


def test_ann_lsh_matches_sql_oracle_at_gate_scale():
    # The LSH oracle embeds seeded sf0.01-shaped planes as SQL literals
    # (training.py); pin the engine/oracle equivalence at that scale.
    import duckdb

    from osm2geojson_ray.pipelines.training import training_oracles

    sf = "/root/testdata/sf0.01"
    emb = rd.read_parquet(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    got = (
        S.ann_lsh(emb, query_every=50, k=5, num_parts=4)
        .to_pandas()
        .sort_values(["query_id", "rnk"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf}/embeddings.parquet')"
    )
    want = (
        con.execute(training_oracles("unused")["ann_lsh"])
        .df()
        .sort_values(["query_id", "rnk"])
        .reset_index(drop=True)
    )
    assert got[["query_id", "neighbor_id", "rnk"]].equals(
        want[["query_id", "neighbor_id", "rnk"]]
    )


def test_sessionize_gap_semantics():
    import pandas as pd

    ts = pd.to_datetime(
        ["2024-01-01 10:00", "2024-01-01 10:10", "2024-01-01 11:00", "2024-01-01 11:20"]
    )
    t = pa.table({"event_id": [1, 2, 3, 4], "user_id": [7, 7, 7, 7], "ts": ts})
    out = {r["event_id"]: r["session_id"] for r in EV.sessionize(rd.from_arrow(t), 30, 4).take_all()}
    assert out == {1: 1, 2: 1, 3: 2, 4: 2}


def test_windowed_agg_counts():
    import pandas as pd

    ts = pd.to_datetime(["2024-01-01 10:05", "2024-01-01 10:55", "2024-01-01 11:05"])
    t = pa.table(
        {"event_id": [1, 2, 3], "user_id": [7, 7, 7], "ts": ts, "value": [1.0, 2.0, 3.0]}
    )
    out = EV.windowed_agg(rd.from_arrow(t), num_parts=4).take_all()
    got = {(r["user_id"], str(r["window_start"])): (r["n"], r["min_value"], r["max_value"]) for r in out}
    assert got[(7, "2024-01-01 10:00:00")] == (2, 1.0, 2.0)
    assert got[(7, "2024-01-01 11:00:00")] == (1, 3.0, 3.0)


def test_media_stub_actor_pipeline(small_corpus_dir):
    from osm2geojson_ray.sources.documents import read_documents
    from osm2geojson_ray.stages.multimodal import MediaDecodeStub, media_features

    out = media_features(read_documents(small_corpus_dir)).take_all()
    assert len(out) > 0
    r = out[0]
    assert 64 <= r["width"] < 64 + 1024 and 1 <= r["n_frames"] <= 16
    with pytest.raises(NotImplementedError):
        MediaDecodeStub._decode("s3://not-supported/x.png")


def test_span_invariant_through_stages(small_corpus_dir):
    """The per-row span sequence (kind, text, media_ref, order) must be
    preserved by every documents-touching stage (BASELINE.json input_hint)."""
    import pyarrow.dataset as pads

    from osm2geojson_ray.sources.documents import extract_elements, span_signature
    from osm2geojson_ray.stages.multimodal import extract_media_spans

    before = pads.dataset(small_corpus_dir, format="parquet").to_table()
    sig_before = dict(zip(before.column("doc_id").to_pylist(), span_signature(before)))

    docs = rd.read_parquet(small_corpus_dir)
    # run both extraction stages, then re-read the source rows
    extract_elements(docs).materialize()
    extract_media_spans(docs).materialize()
    after_rows = docs.take_all()
    after = pa.Table.from_pylist(after_rows, schema=before.schema)
    sig_after = dict(zip(after.column("doc_id").to_pylist(), span_signature(after)))
    assert sig_before == sig_after


def test_jaccard_plans_agree():
    # the PPJoin (prefix-filter) plan and the small single-exchange plan
    # must produce identical pair sets
    docs = docs_ds()
    small = sorted(
        (r["doc_a"], r["doc_b"])
        for r in D.ngram_jaccard_pairs(docs, 0.5, num_parts=4).take_all()
    )
    pp = sorted(
        (r["doc_a"], r["doc_b"])
        for r in D.ngram_jaccard_pairs(docs, 0.5, num_parts=4, small_plan_rows=0).take_all()
    )
    assert small == pp


def test_ann_ivf_matches_sql_oracle_at_gate_scale():
    # The IVF oracle re-derives the sample-trained centroids via the
    # shared _lloyd_spherical and inlines them as SQL literals
    # (training.py); pin the engine/oracle equivalence at sf0.01.
    import duckdb

    from osm2geojson_ray.pipelines.training import (
        ANN_IVF_ITERS,
        ANN_IVF_NPROBE,
        training_oracles,
    )

    sf = "/root/testdata/sf0.01"
    emb = rd.read_parquet(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    got = (
        S.ann_ivf(emb, query_every=50, k=5, nprobe=ANN_IVF_NPROBE,
                  n_iters=ANN_IVF_ITERS, num_parts=4)
        .to_pandas()
        .sort_values(["query_id", "rnk"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf}/embeddings.parquet')"
    )
    want = (
        con.execute(training_oracles("unused")["ann_ivf"])
        .df()
        .sort_values(["query_id", "rnk"])
        .reset_index(drop=True)
    )
    assert got[["query_id", "neighbor_id", "rnk"]].equals(
        want[["query_id", "neighbor_id", "rnk"]]
    )


def test_ann_ivf_recall_vs_bruteforce():
    emb = rd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    brute = S.ann_bruteforce(emb, query_every=50, k=5, num_parts=4).take_all()
    ivf = S.ann_ivf(emb, query_every=50, k=5, nprobe=4, num_parts=4).take_all()
    bset = {(r["query_id"], r["neighbor_id"]) for r in brute}
    iset = {(r["query_id"], r["neighbor_id"]) for r in ivf}
    queries = {r["query_id"] for r in brute}
    # a query's own inverted list is always probed → self-match guaranteed
    assert all((q, q) in iset for q in queries)
    recall = len(bset & iset) / len(bset)
    assert recall > 0.4  # approximate by design; nprobe trades recall for scale
