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

    return _bucketed_topk(bucketed, k, num_parts)


def _bucketed_topk(bucketed: ray.data.Dataset, k: int, num_parts: int) -> ray.data.Dataset:
    """Shared tail of the bucketed ANN variants (LSH / IVF): per-bucket
    local top-k (queries × data matmul), then per-query global merge."""
    from ..functions.grouping import partition_map

    def search(t: pa.Table) -> pa.Table:
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
        import pandas as pd  # noqa: F401

        df = t.to_pandas().drop_duplicates(["query_id", "neighbor_id"])
        df = df.sort_values(["query_id", "sim", "neighbor_id"],
                            ascending=[True, False, True], kind="mergesort")
        df["rnk"] = df.groupby("query_id", sort=False).cumcount() + 1
        df = df[df["rnk"] <= k]
        return pa.Table.from_pandas(
            df[["query_id", "neighbor_id", "rnk"]], preserve_index=False
        )

    return partition_map(local, ["query_id"], num_parts, global_topk)


def _centroid_refs(tables_refs) -> tuple[np.ndarray, np.ndarray]:
    """Assemble the (cluster_ids, centroid matrix) from object-store refs
    (never through the driver)."""
    tabs = [t for t in ray.get(list(tables_refs)) if t.num_rows]
    if not tabs:
        return np.empty(0, np.int64), np.empty((0, 0), np.float64)
    t = pa.concat_tables(tabs)
    ids = np.asarray(t.column("cluster"))
    mat = np.asarray(t.column("centroid").combine_chunks().to_pylist(), dtype=np.float64)
    return ids, mat


def kmeans_centroids(
    embeddings: ray.data.Dataset,
    n_centroids: int,
    n_iters: int = 3,
    num_parts: int = 16,
):
    """Distributed Lloyd k-means on the unit sphere (cosine): per-batch
    partial (cluster, sum, count) combiner → one small exchange per
    iteration; centroid tables live in the object store (refs broadcast,
    no driver gather).  Deterministic init: every (n/n_centroids)-th
    vec_id."""
    from ..functions.grouping import partition_map

    n = embeddings.count()
    every = max(1, n // max(1, n_centroids))

    def init_sel(t: pa.Table) -> pa.Table:
        ids, mat = _matrix(t)
        sel = ids % every == 0
        norm = np.sqrt((mat[sel] * mat[sel]).sum(axis=1))
        return pa.table(
            {"cluster": pa.array(ids[sel], pa.int64()),
             "centroid": pa.array((mat[sel] / norm[:, None]).tolist(),
                                  pa.list_(pa.float64()))}
        )

    refs = embeddings.map_batches(init_sel, batch_format="pyarrow").materialize().to_arrow_refs()

    for _ in range(n_iters):
        def partial(t: pa.Table, r=refs) -> pa.Table:
            if t.num_rows == 0:
                return pa.table(
                    {"cluster": pa.array([], pa.int64()),
                     "vsum": pa.array([], pa.list_(pa.float64())),
                     "count": pa.array([], pa.int64())}
                )
            cids, cmat = _centroid_refs(r)
            ids, mat = _matrix(t)
            norm = np.sqrt((mat * mat).sum(axis=1))
            normed = mat / norm[:, None]
            cl = np.argmax(normed @ cmat.T, axis=1)
            order = np.argsort(cl, kind="stable")
            cls = cl[order]
            bounds = np.concatenate([[0], np.nonzero(cls[1:] != cls[:-1])[0] + 1])
            sums = np.add.reduceat(normed[order], bounds, axis=0)
            counts = np.diff(np.concatenate([bounds, [len(cls)]]))
            return pa.table(
                {"cluster": pa.array(cids[cls[bounds]], pa.int64()),
                 "vsum": pa.array(sums.tolist(), pa.list_(pa.float64())),
                 "count": pa.array(counts, pa.int64())}
            )

        partials = embeddings.map_batches(partial, batch_format="pyarrow")

        def reduce_cent(t: pa.Table) -> pa.Table:
            cl = np.asarray(t.column("cluster"))
            vs = np.asarray(t.column("vsum").combine_chunks().to_pylist(), dtype=np.float64)
            ct = np.asarray(t.column("count"), dtype=np.float64)
            order = np.argsort(cl, kind="stable")
            cls = cl[order]
            bounds = np.concatenate([[0], np.nonzero(cls[1:] != cls[:-1])[0] + 1])
            sums = np.add.reduceat(vs[order], bounds, axis=0)
            counts = np.add.reduceat(ct[order], bounds)
            cent = sums / counts[:, None]
            norm = np.sqrt((cent * cent).sum(axis=1))
            norm[norm == 0] = 1.0
            return pa.table(
                {"cluster": pa.array(cls[bounds], pa.int64()),
                 "centroid": pa.array((cent / norm[:, None]).tolist(), pa.list_(pa.float64()))}
            )

        refs = (
            partition_map(partials, ["cluster"], max(4, num_parts // 4), reduce_cent)
            .materialize()
            .to_arrow_refs()
        )
    return refs


def ann_ivf(
    embeddings: ray.data.Dataset,
    query_every: int = 50,
    k: int = 5,
    n_centroids: int | None = None,
    nprobe: int = 2,
    n_iters: int = 3,
    num_parts: int = 16,
) -> ray.data.Dataset:
    """IVF ANN — the k-means-quantized scale path: a coarse quantizer
    (distributed Lloyd on the unit sphere) assigns every vector to its
    nearest centroid's inverted list; queries probe their ``nprobe``
    nearest lists.  ``n_centroids=None`` auto-sizes to ~sqrt(n) (bounded
    inverted lists, candidate work per query ≈ nprobe·n/√n).
    Approximate — recall measured against ann_bruteforce in tests."""
    n = embeddings.count()
    if n_centroids is None:
        n_centroids = max(4, int(np.sqrt(max(n, 1))))
    refs = kmeans_centroids(embeddings, n_centroids, n_iters=n_iters, num_parts=num_parts)

    def bucketize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()),
                 "bucket": pa.array([], pa.int64()),
                 "is_query": pa.array([], pa.bool_()),
                 "embedding": pa.array([], pa.list_(pa.float64()))}
            )
        cids, cmat = _centroid_refs(refs)
        ids, mat = _matrix(t)
        norm = np.sqrt((mat * mat).sum(axis=1))
        normed = mat / norm[:, None]
        sim = normed @ cmat.T
        own = np.argmax(sim, axis=1)
        base = pa.table(
            {"vec_id": pa.array(ids, pa.int64()),
             "bucket": pa.array(cids[own], pa.int64()),
             "is_query": pa.array(np.zeros(len(ids), bool)),
             "embedding": t.column("embedding")}
        )
        tables = [base]
        is_q = ids % query_every == 0
        if is_q.any():
            q_sel = np.nonzero(is_q)[0]
            np_probe = min(nprobe, sim.shape[1])
            probes = np.argpartition(-sim[q_sel], np_probe - 1, axis=1)[:, :np_probe]
            emb_q = t.column("embedding").combine_chunks().take(pa.array(np.repeat(q_sel, np_probe)))
            tables.append(
                pa.table(
                    {"vec_id": pa.array(np.repeat(ids[q_sel], np_probe), pa.int64()),
                     "bucket": pa.array(cids[probes.ravel()], pa.int64()),
                     "is_query": pa.array(np.ones(len(q_sel) * np_probe, bool)),
                     "embedding": emb_q}
                )
            )
        return pa.concat_tables(tables)

    bucketed = embeddings.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
    return _bucketed_topk(bucketed, k, num_parts)
