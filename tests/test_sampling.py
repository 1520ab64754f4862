"""Deterministic hash split / sample (stages/sampling.py) vs
hashlib/pandas references."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def _md5int60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _docs_table(n=400):
    rng = np.random.default_rng(7)
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "text": pa.array(["w " * int(rng.integers(1, 30)) for _ in range(n)]),
        }
    )


def test_hash_split_matches_reference_and_is_reshard_stable():
    from osm2geojson_ray.stages.sampling import hash_split

    t = _docs_table()
    got = hash_split(rd.from_arrow(t)).to_pandas().set_index("doc_id")["split"]

    ref = {}
    for d in t.column("doc_id").to_pylist():
        b = _md5int60(f"split-v1:{d}") % 100
        ref[d] = "train" if b < 90 else ("val" if b < 95 else "test")
    assert got.to_dict() == ref
    # all three splits non-empty at n=400 and roughly weighted
    counts = got.value_counts()
    assert set(counts.index) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]

    # content-addressing: assignment is independent of sharding — the
    # same doc lands in the same split when the dataset is split into
    # many blocks (the property that makes hash splits scale-stable)
    sharded = rd.from_arrow([t.slice(i * 50, 50) for i in range(8)])
    got2 = hash_split(sharded).to_pandas().set_index("doc_id")["split"]
    assert got2.to_dict() == ref


def test_split_stats_matches_pandas():
    from osm2geojson_ray.stages.sampling import split_stats

    t = _docs_table()
    got = (
        split_stats(rd.from_arrow(t))
        .to_pandas()
        .sort_values("split")
        .reset_index(drop=True)
    )
    df = t.to_pandas()
    df["split"] = [
        ("train" if (b := _md5int60(f"split-v1:{d}") % 100) < 90 else "val" if b < 95 else "test")
        for d in df.doc_id
    ]
    df["n_chars"] = df.text.str.len()
    ref = (
        df.groupby("split")
        .agg(n_docs=("doc_id", "size"), sum_chars=("n_chars", "sum"))
        .reset_index()
        .sort_values("split")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, ref, check_dtype=False)


def test_hash_sample_exact_topn_and_bounds():
    from osm2geojson_ray.stages.sampling import hash_sample

    t = _docs_table()
    ds = rd.from_arrow([t.slice(i * 50, 50) for i in range(8)])  # multi-block
    got = hash_sample(ds, n=25).to_pandas()

    prio = {d: _md5int60(f"sample-v1:{d}") for d in t.column("doc_id").to_pylist()}
    ref = sorted(prio.items(), key=lambda kv: (kv[1], kv[0]))[:25]
    assert list(zip(got.doc_id, got.priority)) == ref

    # n beyond the dataset returns every row, once
    all_rows = hash_sample(ds, n=10_000).to_pandas()
    assert sorted(all_rows.doc_id.tolist()) == list(range(400))


def test_pack_sequences_matches_pandas():
    from osm2geojson_ray.stages.text import pack_sequences

    rng = np.random.default_rng(11)
    n = 300
    srcs = rng.choice(["s1", "s2", "s3"], n)
    texts = ["w " * int(rng.integers(1, 40)) + "end" for _ in range(n)]
    t = pa.table(
        {
            "doc_id": pa.array(rng.permutation(n), pa.int64()),  # unsorted ids
            "source": pa.array(srcs, pa.string()),
            "text": pa.array(texts),
        }
    )
    got = (
        pack_sequences(rd.from_arrow([t.slice(i * 50, 50) for i in range(6)]), capacity=64)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    df = t.to_pandas()
    df["n_tokens"] = df.text.str.count(" ") + 1
    df = df.sort_values("doc_id")
    df["prev"] = df.groupby("source")["n_tokens"].cumsum() - df["n_tokens"]
    df["chunk_id"] = df["prev"] // 64
    ref = df[["doc_id", "source", "n_tokens", "chunk_id"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["doc_id", "source", "n_tokens", "chunk_id"]], ref, check_dtype=False
    )
    assert got.chunk_id.max() > 3  # multiple chunks actually formed


def test_hash_sample_string_keys():
    # review r5: the output must preserve the key column's type — the
    # old int64 hard-cast crashed on string-keyed corpora.
    from osm2geojson_ray.stages.sampling import hash_sample

    ids = [f"doc-{i:03d}" for i in range(60)]
    t = pa.table({"uid": pa.array(ids, pa.string())})
    got = hash_sample(rd.from_arrow(t), n=10, key="uid").to_pandas()
    prio = {d: _md5int60(f"sample-v1:{d}") for d in ids}
    ref = sorted(prio.items(), key=lambda kv: (kv[1], kv[0]))[:10]
    assert list(zip(got.uid, got.priority)) == ref
