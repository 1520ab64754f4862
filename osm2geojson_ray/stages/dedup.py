"""Deduplication operators (exact, MinHash+LSH, SimHash banding, n-gram
Jaccard, embedding cosine) — the large-scale training-data cleaning suite.

Shuffle discipline: every op pre-reduces inside ``map_batches`` (local
min / local distinct) before its single hash-partitioned group stage, and
candidate pairs are generated inside partitions, vectorized — no
driver-side loops."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..functions import hashing as H
from ..functions.grouping import partition_map


def _md5_batch(texts: list[str]) -> list[str]:
    return [hashlib.md5(s.encode()).hexdigest() for s in texts]


def dedup_exact(docs: ray.data.Dataset, num_parts: int = 32) -> ray.data.Dataset:
    """Keep min(doc_id) per exact text (md5 digest group).  Two-level min:
    per-batch combiner then hash-partitioned reduce — the aggregation
    never ships full texts through the shuffle, only digests."""

    def local_min(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"digest": _md5_batch(t.column("text").to_pylist()),
             "doc_id": t.column("doc_id").to_pandas()}
        )
        g = df.groupby("digest", sort=False)["doc_id"].min().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    def part_min(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby("digest", sort=False)["doc_id"].min().reset_index()
        return pa.Table.from_pandas(g[["doc_id"]], preserve_index=False)

    pre = docs.map_batches(local_min, batch_format="pyarrow", zero_copy_batch=True)
    return partition_map(pre, ["digest"], num_parts, part_min)


def _pairs_within_groups(df: pd.DataFrame, key_cols: list[str]) -> pd.DataFrame:
    """Vectorized candidate pairs (a<b) within each key group via a
    self-merge (groups are LSH buckets — small by construction)."""
    m = df.merge(df, on=key_cols, suffixes=("_a", "_b"))
    m = m[m["doc_id_a"] < m["doc_id_b"]]
    return m[["doc_id_a", "doc_id_b"]].drop_duplicates()


def minhash_signatures(docs: ray.data.Dataset) -> ray.data.Dataset:
    def sig(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        out = {"doc_id": [], "band_key": []}
        for i, text in zip(ids, t.column("text").to_pylist()):
            for bk in H.band_keys(H.minhash_signature(text)):
                out["doc_id"].append(i)
                out["band_key"].append(bk)
        return pa.table({"doc_id": pa.array(out["doc_id"], pa.int64()),
                         "band_key": pa.array(out["band_key"], pa.string())})

    return docs.map_batches(sig, batch_format="pyarrow", zero_copy_batch=True)


def dedup_minhash_pairs(docs: ray.data.Dataset, num_parts: int = 32) -> ray.data.Dataset:
    """LSH candidate pairs: docs sharing any full band of the 16-perm
    minhash signature (4 bands × 4 rows)."""
    sigs = minhash_signatures(docs)

    def pairs(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        out = _pairs_within_groups(df, ["band_key"])
        return pa.Table.from_pandas(
            out.rename(columns={"doc_id_a": "doc_a", "doc_id_b": "doc_b"}),
            preserve_index=False,
        )

    cand = partition_map(sigs, ["band_key"], num_parts, pairs)
    # distinct across bands
    def dd(t: pa.Table) -> pa.Table:
        return t.group_by(["doc_a", "doc_b"]).aggregate([]).select(["doc_a", "doc_b"])

    return partition_map(cand.map_batches(dd, batch_format="pyarrow", zero_copy_batch=True),
                         ["doc_a", "doc_b"], num_parts, dd)


def simhash_bands(docs: ray.data.Dataset, num_parts: int = 32) -> ray.data.Dataset:
    """SimHash near-dup candidates: 16-bit simhash split into 2 bands of 8
    bits; docs sharing any band value are candidates (catches every
    hamming-distance ≤ 1 pair with certainty)."""

    def sig(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        out = {"doc_id": [], "band_key": []}
        for i, text in zip(ids, t.column("text").to_pylist()):
            h = H.simhash16(text)
            for b in range(2):
                out["doc_id"].append(i)
                out["band_key"].append(f"{b}:{(h >> (8 * b)) & 0xFF}")
        return pa.table({"doc_id": pa.array(out["doc_id"], pa.int64()),
                         "band_key": pa.array(out["band_key"], pa.string())})

    sigs = docs.map_batches(sig, batch_format="pyarrow", zero_copy_batch=True)

    def pairs(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        out = _pairs_within_groups(df, ["band_key"])
        return pa.Table.from_pandas(
            out.rename(columns={"doc_id_a": "doc_a", "doc_id_b": "doc_b"}),
            preserve_index=False,
        )

    cand = partition_map(sigs, ["band_key"], num_parts, pairs)

    def dd(t: pa.Table) -> pa.Table:
        return t.group_by(["doc_a", "doc_b"]).aggregate([]).select(["doc_a", "doc_b"])

    return partition_map(cand.map_batches(dd, batch_format="pyarrow", zero_copy_batch=True),
                         ["doc_a", "doc_b"], num_parts, dd)


def ngram_jaccard_pairs(
    docs: ray.data.Dataset, threshold: float = 0.5, num_parts: int = 32
) -> ray.data.Dataset:
    """Exact n-gram Jaccard near-dup pairs within each ``source``
    partition: explode distinct 3-token shingles, co-group by source,
    vectorized pair intersection counts via a pandas self-merge."""

    def explode(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        srcs = t.column("source").to_pylist()
        out = {"source": [], "doc_id": [], "shingle": []}
        for i, s, text in zip(ids, srcs, t.column("text").to_pylist()):
            for sh in set(H.shingles(text)):
                out["source"].append(s)
                out["doc_id"].append(i)
                out["shingle"].append(sh)
        return pa.table({"source": pa.array(out["source"], pa.string()),
                         "doc_id": pa.array(out["doc_id"], pa.int64()),
                         "shingle": pa.array(out["shingle"], pa.string())})

    sh = docs.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)

    def pairs(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        sizes = df.groupby("doc_id").size()
        m = df.merge(df, on=["source", "shingle"], suffixes=("_a", "_b"))
        m = m[m["doc_id_a"] < m["doc_id_b"]]
        inter = m.groupby(["doc_id_a", "doc_id_b"]).size().reset_index(name="n_inter")
        inter["n_a"] = inter["doc_id_a"].map(sizes)
        inter["n_b"] = inter["doc_id_b"].map(sizes)
        union = inter["n_a"] + inter["n_b"] - inter["n_inter"]
        jac = inter["n_inter"].astype(float) / union.astype(float)
        keep = inter[jac >= threshold]
        out = keep.rename(columns={"doc_id_a": "doc_a", "doc_id_b": "doc_b"})[
            ["doc_a", "doc_b"]
        ]
        return pa.Table.from_pandas(out, preserve_index=False)

    return partition_map(sh, ["source"], num_parts, pairs)


def embedding_dup_pairs(
    embeddings: ray.data.Dataset, threshold: float = 0.95, num_parts: int = 16
) -> ray.data.Dataset:
    """Embedding-cosine near-dup pairs within each ``label`` partition
    (blocked all-pairs, numpy matmul per partition in float64)."""

    def pairs(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column("vec_id"))
        mat = np.asarray(t.column("embedding").combine_chunks().to_pylist(), dtype=np.float64)
        norms = np.sqrt((mat * mat).sum(axis=1))
        normed = mat / norms[:, None]
        sim = normed @ normed.T
        ii, jj = np.nonzero(np.triu(sim >= threshold, k=1))
        a = np.minimum(ids[ii], ids[jj])
        b = np.maximum(ids[ii], ids[jj])
        return pa.table({"vec_a": pa.array(a, pa.int64()), "vec_b": pa.array(b, pa.int64())})

    return partition_map(embeddings, ["label"], num_parts, pairs)
