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
    q_rows = embeddings.map_batches(
        lambda t: select_queries_batch(t, query_every), batch_format="pyarrow"
    ).take_all()
    q_ids = np.asarray([r["vec_id"] for r in q_rows], dtype=np.int64)
    q_mat = np.asarray([r["embedding"] for r in q_rows], dtype=np.float64)
    q_norm = np.sqrt((q_mat * q_mat).sum(axis=1))
    bref = ray.put((q_ids, q_mat, q_norm))

    class LocalTopK:
        def __init__(self) -> None:
            self.q_ids, self.q_mat, self.q_norm = ray.get(bref)

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
    n_planes: int = 6,
    seed: int = 42,
    num_parts: int = 16,
) -> ray.data.Dataset:
    """LSH-bucketed ANN: seeded random hyperplanes assign each vector a
    sign-pattern bucket; search runs only within the query's bucket.
    Approximate — recall measured against ann_bruteforce in tests."""

    def dim_of() -> int:
        row = embeddings.take(1)[0]
        return len(row["embedding"])

    d = dim_of()
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
        return pa.table({"vec_id": pa.array(ids, pa.int64()),
                         "bucket": pa.array(bucket, pa.int64()),
                         "is_query": pa.array(is_q),
                         "embedding": t.column("embedding")})

    bucketed = embeddings.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)

    from ..functions.grouping import partition_map

    def search(t: pa.Table) -> pa.Table:
        df_ids = np.asarray(t.column("vec_id"))
        buckets = np.asarray(t.column("bucket"))
        isq = np.asarray(t.column("is_query"))
        mat = np.asarray(t.column("embedding").combine_chunks().to_pylist(), dtype=np.float64)
        out_q, out_n, out_r = [], [], []
        for b in np.unique(buckets[isq]):
            sel = buckets == b
            ids_b = df_ids[sel]
            mat_b = mat[sel]
            isq_b = isq[sel]
            norms = np.sqrt((mat_b * mat_b).sum(axis=1))
            qi = np.nonzero(isq_b)[0]
            sim = (mat_b[qi] @ mat_b.T) / (norms[qi][:, None] * norms[None, :])
            kk = min(k, sim.shape[1])
            order = np.argsort(-sim, axis=1, kind="stable")[:, :kk]
            for row, q in enumerate(qi):
                for r in range(order.shape[1]):
                    out_q.append(ids_b[q])
                    out_n.append(ids_b[order[row, r]])
                    out_r.append(r + 1)
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "neighbor_id": pa.array(out_n, pa.int64()),
                         "rnk": pa.array(out_r, pa.int64())})

    return partition_map(bucketed, ["bucket"], num_parts, search)
