"""Similarity search over an embedding column (list<float>):
brute-force cosine top-k as the exact baseline (numpy matmul per batch
against a broadcast query matrix), and an LSH-bucketed approximate
variant (seeded random hyperplanes) as the scale path."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..functions.grouping import from_pandas_clean


def _emb64(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """float64 (n, d) matrix from a fixed-length list<float> column —
    zero-copy via the list values buffer (flatten + reshape), upcast to
    float64 (bit-identical to the old per-row to_pylist path, without the
    full Python materialization)."""
    emb = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(emb)
    if n == 0:
        return np.empty((0, 0), np.float64)
    vals = np.asarray(emb.flatten())
    return vals.reshape(n, -1).astype(np.float64, copy=False)


def _matrix(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = np.asarray(t.column("vec_id"))
    return ids, _emb64(t.column("embedding"))


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
        return from_pandas_clean(df[["query_id", "neighbor_id", "rnk"]])

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

    def bucketize(t: pa.Table) -> pa.Table:
        # the plane matrix is tiny (n_planes x d) — shipped once per task
        # in the closure; no object-store round-trip needed
        ids, mat = _matrix(t)
        signs = (mat @ planes.T) > 0
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
    return _bucketed_topk(bucketed, k, num_parts)


def _bucketed_topk(bucketed: ray.data.Dataset, k: int, num_parts: int) -> ray.data.Dataset:
    """Shared tail of the bucketed ANN variants (LSH / IVF): per-bucket
    local top-k (queries × data matmul), then per-query global merge."""
    from ..functions.grouping import partition_map

    def search(t: pa.Table) -> pa.Table:
        df_ids = np.asarray(t.column("vec_id"))
        buckets = np.asarray(t.column("bucket"))
        isq = np.asarray(t.column("is_query"))
        mat = _emb64(t.column("embedding"))
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
        return from_pandas_clean(df[["query_id", "neighbor_id", "rnk"]])

    return partition_map(local, ["query_id"], num_parts, global_topk)


def _lloyd_spherical(mat: np.ndarray, n_centroids: int, n_iters: int) -> np.ndarray:
    """Pure, DETERMINISTIC spherical k-means (Lloyd) in float64.

    Shared VERBATIM by the engine quantizer (``ivf_train``) and the
    DuckDB oracle generator (``training.py`` inlines the resulting
    centroids as SQL literals) — same input bits in, same centroid bits
    out, regardless of how the engine partitioned the data.  Contract:
    ``mat`` rows in a fixed order (callers sort the sample by vec_id).

    Init: every (n//k)-th row.  Assignment: argmax cosine (first-max on
    ties).  Empty clusters keep their previous centroid.  Centroids are
    re-normalized to the unit sphere each iteration.
    """
    n = len(mat)
    norm = np.sqrt((mat * mat).sum(axis=1))
    norm[norm == 0] = 1.0
    normed = mat / norm[:, None]
    k = max(1, min(n_centroids, n))
    step = max(1, n // k)
    cent = normed[::step][:k].copy()
    for _ in range(n_iters):
        assign = np.argmax(normed @ cent.T, axis=1)
        order = np.argsort(assign, kind="stable")
        aa = assign[order]
        bounds = np.concatenate([[0], np.nonzero(aa[1:] != aa[:-1])[0] + 1])
        sums = np.add.reduceat(normed[order], bounds, axis=0)
        counts = np.diff(np.concatenate([bounds, [n]]))
        newc = cent.copy()
        newc[aa[bounds]] = sums / counts[:, None]
        cn = np.sqrt((newc * newc).sum(axis=1))
        cn[cn == 0] = 1.0
        cent = newc / cn[:, None]
    return cent


def ivf_sample_params(n: int, n_centroids: int | None, sample_every: int | None) -> tuple[int, int]:
    """Deterministic (n_centroids, sample_every) from the row count —
    one shared formula so the oracle generator derives the exact same
    quantizer inputs from the parquet row count alone."""
    if n_centroids is None:
        n_centroids = max(4, int(np.sqrt(max(n, 1))))
    if sample_every is None:
        # ~64 training vectors per centroid; at sf0.01 (n=500) this is 1
        # (full data), at 1e9 rows / 31k centroids it samples ~2M rows
        sample_every = max(1, n // (64 * n_centroids))
    return n_centroids, sample_every


def ivf_train(
    embeddings: ray.data.Dataset,
    n_centroids: int,
    sample_every: int,
    n_iters: int = 3,
) -> "ray.ObjectRef":
    """Sample-trained coarse quantizer — the IVF scale path (train on a
    deterministic sample, then ONE full-data assignment pass; the r2
    distributed-Lloyd variant cost a full-data exchange PER iteration and
    rebuilt centroid state per batch).

    The sample (vec_id % sample_every == 0, sorted by vec_id — bounded at
    ~64 vectors/centroid by ``ivf_sample_params``) flows map_batches →
    object store → a single remote training task; only the (k, d) float64
    centroid matrix ref comes back for per-actor broadcast.  Nothing
    passes through the driver.
    """

    def sample_batch(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column("vec_id"))
        return t.select(["vec_id", "embedding"]).filter(pa.array(ids % sample_every == 0))

    refs = (
        embeddings.map_batches(sample_batch, batch_format="pyarrow")
        .materialize()
        .to_arrow_refs()
    )

    @ray.remote
    def train(ref_list: list) -> np.ndarray:
        tabs = [tb for tb in ray.get(ref_list) if tb.num_rows]
        if not tabs:
            return np.empty((0, 0), np.float64)
        ids, mat = _matrix(pa.concat_tables(tabs))
        order = np.argsort(ids)  # block order is partition-dependent; vec_id order is not
        return _lloyd_spherical(mat[order], n_centroids, n_iters)

    return train.remote(list(refs))


def ann_ivf(
    embeddings: ray.data.Dataset,
    query_every: int = 50,
    k: int = 5,
    n_centroids: int | None = None,
    nprobe: int = 2,
    n_iters: int = 3,
    num_parts: int = 16,
    sample_every: int | None = None,
) -> ray.data.Dataset:
    """IVF ANN — the k-means-quantized scale path: a coarse quantizer
    (sample-trained deterministic spherical k-means, see ``ivf_train``)
    assigns every vector to its nearest centroid's inverted list; queries
    probe their ``nprobe`` nearest lists (stable tie-break: lower cluster
    id first, matching the SQL oracle's ORDER BY dot DESC, c ASC).
    ``n_centroids=None`` auto-sizes to ~sqrt(n) (bounded inverted lists,
    candidate work per query ≈ nprobe·n/√n).  Fully deterministic →
    oracle-backed: training.py re-derives the identical centroids via the
    shared ``_lloyd_spherical`` and pins assignment + probing + top-k in
    DuckDB."""
    n = embeddings.count()
    n_centroids, sample_every = ivf_sample_params(n, n_centroids, sample_every)
    cent_ref = ivf_train(embeddings, n_centroids, sample_every, n_iters=n_iters)

    class IvfBucketize:
        """Centroid matrix fetched ONCE per actor (r2 rebuilt it per
        batch — the round's flagged anti-pattern)."""

        def __init__(self) -> None:
            self.cmat = ray.get(cent_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or len(self.cmat) == 0:
                # empty branch reuses the INPUT's embedding type (the
                # testdata is list<float32>) so empty blocks don't emit a
                # divergent schema into the downstream sort
                return pa.table(
                    {"vec_id": pa.array([], pa.int64()),
                     "bucket": pa.array([], pa.int64()),
                     "is_query": pa.array([], pa.bool_()),
                     "embedding": pa.array([], t.schema.field("embedding").type)}
                )
            ids, mat = _matrix(t)
            sim = mat @ self.cmat.T  # |v| > 0 scales rows uniformly: argmax/top-nprobe unchanged
            own = np.argmax(sim, axis=1)
            base = pa.table(
                {"vec_id": pa.array(ids, pa.int64()),
                 "bucket": pa.array(own, pa.int64()),
                 "is_query": pa.array(np.zeros(len(ids), bool)),
                 "embedding": t.column("embedding")}
            )
            tables = [base]
            is_q = ids % query_every == 0
            if is_q.any():
                q_sel = np.nonzero(is_q)[0]
                np_probe = min(nprobe, sim.shape[1])
                # stable sort: ties → lower cluster id, matching the oracle
                probes = np.argsort(-sim[q_sel], axis=1, kind="stable")[:, :np_probe]
                emb_q = t.column("embedding").combine_chunks().take(
                    pa.array(np.repeat(q_sel, np_probe))
                )
                tables.append(
                    pa.table(
                        {"vec_id": pa.array(np.repeat(ids[q_sel], np_probe), pa.int64()),
                         "bucket": pa.array(probes.ravel(), pa.int64()),
                         "is_query": pa.array(np.ones(len(q_sel) * np_probe, bool)),
                         "embedding": emb_q}
                    )
                )
            return pa.concat_tables(tables)

    bucketed = embeddings.map_batches(
        IvfBucketize, batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 8)
    )
    return _bucketed_topk(bucketed, k, num_parts)


# --- persistent IVF index (build once, query many) ----------------------

IVF_SHARDS = 16  # inverted lists are sharded by bucket range for pruned reads


def ivf_index_build(
    embeddings: ray.data.Dataset,
    out_dir: str,
    n_centroids: int | None = None,
    n_iters: int = 3,
    sample_every: int | None = None,
    num_shards: int = IVF_SHARDS,
) -> dict:
    """Materialize an IVF index on disk: ``centroids.parquet`` (the
    quantizer) + ``lists/shard=S/`` (inverted lists, hive-partitioned by
    bucket range).  Build once, then ``ivf_index_search`` serves any
    number of query batches reading ONLY the probed shards — at
    ``nprobe ≪ n_centroids`` most index bytes never leave storage, the
    property that makes an ANN index worth persisting at 10^12 rows.

    Assignment is one map pass (centroid matrix per actor `__init__`);
    the partitioned write is the engine's resumable-output shape (one
    directory per shard, many files)."""
    import os

    import pyarrow.parquet as pq

    n = embeddings.count()
    n_centroids, sample_every = ivf_sample_params(n, n_centroids, sample_every)
    cent_ref = ivf_train(embeddings, n_centroids, sample_every, n_iters=n_iters)
    cmat = ray.get(cent_ref)
    os.makedirs(out_dir, exist_ok=True)
    d = cmat.shape[1] if len(cmat) else 0
    pq.write_table(
        pa.table(
            {
                "centroid_id": pa.array(np.arange(len(cmat), dtype=np.int64)),
                "centroid": pa.FixedSizeListArray.from_arrays(
                    pa.array(cmat.ravel(), pa.float64()), d
                ) if d else pa.array([], pa.list_(pa.float64())),
            }
        ),
        f"{out_dir}/centroids.parquet",
    )
    buckets_per_shard = max(1, (n_centroids + num_shards - 1) // num_shards)

    class Assign:
        def __init__(self) -> None:
            self.cmat = ray.get(cent_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or len(self.cmat) == 0:
                return pa.table(
                    {"vec_id": pa.array([], pa.int64()),
                     "bucket": pa.array([], pa.int64()),
                     "shard": pa.array([], pa.int64()),
                     "embedding": pa.array([], t.schema.field("embedding").type)}
                )
            ids, mat = _matrix(t)
            own = np.argmax(mat @ self.cmat.T, axis=1).astype(np.int64)
            return pa.table(
                {"vec_id": pa.array(ids, pa.int64()),
                 "bucket": pa.array(own),
                 "shard": pa.array(own // buckets_per_shard),
                 "embedding": t.column("embedding")}
            )

    embeddings.map_batches(
        Assign, batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 8)
    ).write_parquet(f"{out_dir}/lists", partition_cols=["shard"])
    meta = {
        "n": n, "n_centroids": n_centroids, "sample_every": sample_every,
        "n_iters": n_iters, "buckets_per_shard": buckets_per_shard,
    }
    import json

    with open(f"{out_dir}/_META.json", "w") as f:
        json.dump(meta, f)
    return meta


def ivf_index_search(
    index_dir: str,
    queries: ray.data.Dataset,
    k: int = 5,
    nprobe: int = 2,
    num_parts: int = 16,
) -> ray.data.Dataset:
    """Serve ANN queries from a persisted IVF index, reading ONLY the
    shards the queries probe: probe buckets are computed per query
    (centroid matrix once per actor), the distinct probed-shard set is a
    bounded aggregate (≤ IVF_SHARDS rows), and the inverted lists load
    via hive-partition-pruned ``read_parquet`` on exactly those shard
    directories.  The search tail is the shared bucketed top-k."""
    import json

    import pyarrow.parquet as pq

    with open(f"{index_dir}/_META.json") as f:
        meta = json.load(f)
    bps = int(meta["buckets_per_shard"])
    ctab = pq.read_table(f"{index_dir}/centroids.parquet")
    cmat = _emb64(ctab.column("centroid"))
    cent_ref = ray.put(cmat)

    class Probe:
        def __init__(self) -> None:
            self.cmat = ray.get(cent_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or len(self.cmat) == 0:
                return pa.table(
                    {"vec_id": pa.array([], pa.int64()),
                     "bucket": pa.array([], pa.int64()),
                     "is_query": pa.array([], pa.bool_()),
                     "embedding": pa.array([], t.schema.field("embedding").type)}
                )
            ids, mat = _matrix(t)
            sim = mat @ self.cmat.T
            np_probe = min(nprobe, sim.shape[1])
            probes = np.argsort(-sim, axis=1, kind="stable")[:, :np_probe]
            emb = t.column("embedding").combine_chunks().take(
                pa.array(np.repeat(np.arange(t.num_rows), np_probe))
            )
            return pa.table(
                {"vec_id": pa.array(np.repeat(ids, np_probe), pa.int64()),
                 "bucket": pa.array(probes.ravel().astype(np.int64)),
                 "is_query": pa.array(np.ones(t.num_rows * np_probe, bool)),
                 "embedding": emb}
            )

    probed = queries.map_batches(
        Probe, batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 8)
    ).materialize()

    # bounded aggregate: which shards do the probes touch?
    def shard_of(t: pa.Table) -> pa.Table:
        b = np.unique(np.asarray(t.column("bucket")))
        return pa.table({"shard": pa.array(b // bps)})

    shards = sorted(
        {r["shard"] for r in probed.map_batches(
            shard_of, batch_format="pyarrow", zero_copy_batch=True
        ).take_all()}
    )
    import glob

    paths = [
        p
        for s in shards
        for p in sorted(glob.glob(f"{index_dir}/lists/shard={s}/*.parquet"))
    ]
    if not paths:
        # empty result must still carry the documented RESULT schema
        # (query_id, neighbor_id, rnk), not the internal probe schema —
        # downstream column selection on the empty dataset would fail
        return ray.data.from_arrow(
            pa.table(
                {"query_id": pa.array([], pa.int64()),
                 "neighbor_id": pa.array([], pa.int64()),
                 "rnk": pa.array([], pa.int64())}
            )
        )
    lists = ray.data.read_parquet(paths, columns=["vec_id", "bucket", "embedding"])

    def tag_data(t: pa.Table) -> pa.Table:
        return pa.table(
            {"vec_id": t.column("vec_id"), "bucket": t.column("bucket"),
             "is_query": pa.array(np.zeros(t.num_rows, bool)),
             "embedding": t.column("embedding")}
        )

    data = lists.map_batches(tag_data, batch_format="pyarrow", zero_copy_batch=True)
    return _bucketed_topk(data.union(probed), k, num_parts)
