"""Similarity search over an embedding column (list<float>):
brute-force cosine top-k as the exact baseline (numpy matmul per batch
against a broadcast query matrix), and an LSH-bucketed approximate
variant (seeded random hyperplanes) as the scale path."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _matrix(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = np.asarray(t.column("vec_id"))
    mat = np.asarray(t.column("embedding").combine_chunks().to_pylist(), dtype=np.float64)
    return ids, mat


def select_queries_batch(t: pa.Table, every: int) -> pa.Table:
    ids = np.asarray(t.column("vec_id"))
    return t.filter(pa.array(ids % every == 0))


def ann_bruteforce(
    embeddings: ray.data.Dataset,
    query_every: int = 50,
    k: int = 5,
    num_parts: int = 16,
) -> ray.data.Dataset:
    """Exact top-k: queries (vec_id % query_every == 0) are the broadcast
    small side; each batch computes cosine of its rows against all queries
    and emits local candidates; a final per-query group-by keeps global
    top-k.  Similarity = dot/(|a|*|b|) in float64 (matches the oracle's
    list_cosine_similarity on DOUBLE lists); ties broken by neighbor id."""
    # query side stays OFF the driver: materialized in the object store,
    # actors assemble the matrix from the block refs in __init__ (one
    # fetch per actor, zero rows through the driver)
    q_refs = (
        embeddings.map_batches(
            lambda t: select_queries_batch(t, query_every), batch_format="pyarrow"
        )
        .materialize()
        .to_arrow_refs()
    )

    class LocalTopK:
        def __init__(self) -> None:
            tabs = [tb for tb in ray.get(list(q_refs)) if tb.num_rows]
            if tabs:
                qt = pa.concat_tables(tabs)
                self.q_ids, self.q_mat = _matrix(qt)
            else:
                self.q_ids = np.empty(0, np.int64)
                self.q_mat = np.empty((0, 0), np.float64)
            self.q_norm = np.sqrt((self.q_mat * self.q_mat).sum(axis=1))

        def __call__(self, t: pa.Table) -> pa.Table:
            ids, mat = _matrix(t)
            if len(ids) == 0 or len(self.q_ids) == 0:
                return pa.table({"query_id": pa.array([], pa.int64()),
                                 "neighbor_id": pa.array([], pa.int64()),
                                 "sim": pa.array([], pa.float64())})
            n = np.sqrt((mat * mat).sum(axis=1))
            sim = (self.q_mat @ mat.T) / (self.q_norm[:, None] * n[None, :])
            kk = min(k, sim.shape[1])
            # local top-k per query (keep kk best rows of this batch)
            idx = np.argpartition(-sim, kk - 1, axis=1)[:, :kk]
            qq = np.repeat(self.q_ids, kk)
            nn = ids[idx.ravel()]
            ss = np.take_along_axis(sim, idx, axis=1).ravel()
            return pa.table({"query_id": pa.array(qq, pa.int64()),
                             "neighbor_id": pa.array(nn, pa.int64()),
                             "sim": pa.array(ss, pa.float64())})

    local = embeddings.map_batches(LocalTopK, batch_format="pyarrow", concurrency=(1, 8))

    from ..functions.grouping import partition_map

    def global_topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df.sort_values(["query_id", "sim", "neighbor_id"],
                            ascending=[True, False, True], kind="mergesort")
        df["rnk"] = df.groupby("query_id").cumcount() + 1
        df = df[df["rnk"] <= k]
        return pa.Table.from_pandas(
            df[["query_id", "neighbor_id", "rnk"]], preserve_index=False
        )

    return partition_map(local, ["query_id"], num_parts, global_topk)


def ann_lsh(
    embeddings: ray.data.Dataset,
    query_every: int = 50,
    k: int = 5,
    n_planes: int | None = None,
    seed: int = 42,
    num_parts: int = 16,
    probe_hamming: int = 1,
) -> ray.data.Dataset:
    """LSH-bucketed ANN with MULTI-PROBE: seeded random hyperplanes give
    each vector a sign-pattern bucket; data vectors land in their own
    bucket, queries are replicated into every bucket within
    ``probe_hamming`` bit flips (1 + n_planes probes at hamming 1).
    ``n_planes=None`` auto-sizes planes to ~8k vectors per bucket
    (planes = log2(n / 8k), clamped to [4, 24]) so buckets stay BOUNDED
    as data grows — no global-bucket quadratic merge (the r1 fixed
    6-plane/64-bucket variant grew every bucket linearly with data).
    Per-query global top-k over all probed buckets is merged in a final
    exchange.  Approximate — recall measured against ann_bruteforce."""

    def dim_of() -> int:
        row = embeddings.take(1)[0]
        return len(row["embedding"])

    d = dim_of()
    if n_planes is None:
        n = embeddings.count()
        n_planes = min(24, max(4, int(round(np.log2(max(n / (8.0 * k), 2.0))))))
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(n_planes, d)).astype(np.float64)
    pref = ray.put(planes)

    def bucketize(t: pa.Table) -> pa.Table:
        ids, mat = _matrix(t)
        pl = ray.get(pref)
        signs = (mat @ pl.T) > 0
        bucket = np.zeros(len(ids), dtype=np.int64)
        for b in range(n_planes):
            bucket |= signs[:, b].astype(np.int64) << b
        is_q = ids % query_every == 0
        base = pa.table({"vec_id": pa.array(ids, pa.int64()),
                         "bucket": pa.array(bucket, pa.int64()),
                         "is_query": pa.array(np.zeros(len(ids), bool)),
                         "embedding": t.column("embedding")})
        tables = [base]  # every vector is searchable data in its bucket
        if is_q.any() and probe_hamming >= 1:
            q_sel = np.nonzero(is_q)[0]
            probes = [bucket[q_sel]]
            for b in range(n_planes):
                probes.append(bucket[q_sel] ^ (np.int64(1) << np.int64(b)))
            emb_q = t.column("embedding").combine_chunks().take(pa.array(q_sel))
            for pb in probes:
                tables.append(
                    pa.table({"vec_id": pa.array(ids[q_sel], pa.int64()),
                              "bucket": pa.array(pb, pa.int64()),
                              "is_query": pa.array(np.ones(len(q_sel), bool)),
                              "embedding": emb_q})
                )
        return pa.concat_tables(tables)

    bucketed = embeddings.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)

    from ..functions.grouping import partition_map

    def search(t: pa.Table) -> pa.Table:
        # local top-k per (query, bucket); global merge happens next stage
        df_ids = np.asarray(t.column("vec_id"))
        buckets = np.asarray(t.column("bucket"))
        isq = np.asarray(t.column("is_query"))
        mat = np.asarray(t.column("embedding").combine_chunks().to_pylist(), dtype=np.float64)
        norms = np.sqrt((mat * mat).sum(axis=1))
        out_q: list[np.ndarray] = []
        out_n: list[np.ndarray] = []
        out_s: list[np.ndarray] = []
        for b in np.unique(buckets[isq]):
            sel = buckets == b
            dsel = sel & ~isq
            qsel = sel & isq
            if not dsel.any() or not qsel.any():
                continue
            sim = (mat[qsel] @ mat[dsel].T) / (norms[qsel][:, None] * norms[dsel][None, :])
            kk = min(k, sim.shape[1])
            idx = np.argpartition(-sim, kk - 1, axis=1)[:, :kk]
            out_q.append(np.repeat(df_ids[qsel], kk))
            out_n.append(df_ids[dsel][idx.ravel()])
            out_s.append(np.take_along_axis(sim, idx, axis=1).ravel())
        if out_q:
            q = np.concatenate(out_q); nn = np.concatenate(out_n); ss = np.concatenate(out_s)
        else:
            q = np.empty(0, np.int64); nn = np.empty(0, np.int64); ss = np.empty(0, np.float64)
        return pa.table({"query_id": pa.array(q, pa.int64()),
                         "neighbor_id": pa.array(nn, pa.int64()),
                         "sim": pa.array(ss, pa.float64())})

    local = partition_map(bucketed, ["bucket"], num_parts, search)

    def global_topk(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = t.to_pandas().drop_duplicates(["query_id", "neighbor_id"])
        df = df.sort_values(["query_id", "sim", "neighbor_id"],
                            ascending=[True, False, True], kind="mergesort")
        df["rnk"] = df.groupby("query_id", sort=False).cumcount() + 1
        df = df[df["rnk"] <= k]
        return pa.Table.from_pandas(
            df[["query_id", "neighbor_id", "rnk"]], preserve_index=False
        )

    return partition_map(local, ["query_id"], num_parts, global_topk)
