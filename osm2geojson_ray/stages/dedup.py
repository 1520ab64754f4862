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
from ..functions.grouping import from_pandas_clean, distinct, partition_map
from .similarity import _emb64


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
        return from_pandas_clean(g)

    def part_min(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby("digest", sort=False)["doc_id"].min().reset_index()
        return from_pandas_clean(g[["doc_id"]])

    pre = docs.map_batches(local_min, batch_format="pyarrow", zero_copy_batch=True)
    return partition_map(pre, ["digest"], num_parts, part_min)


def _pairs_within_groups(df: pd.DataFrame, key_cols: list[str]) -> pd.DataFrame:
    """Vectorized candidate pairs (a<b) within each key group via a
    self-merge (groups are LSH buckets — small by construction)."""
    m = df.merge(df, on=key_cols, suffixes=("_a", "_b"))
    m = m[m["doc_id_a"] < m["doc_id_b"]]
    return m[["doc_id_a", "doc_id_b"]].drop_duplicates()


def minhash_signatures(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, band_key) rows for the 16-perm/4-band minhash LSH.

    Fully vectorized (r4, VERDICT r3 #4 — this was the dominant CPU of
    the two most expensive dedup queries as a per-doc Python md5 loop):
    md5 once per DISTINCT token of the batch (``text.token_hash_flat``),
    composed 3-token shingle hashes as three shifted int64 multiplies
    over the flat token-hash array, per-doc distinct via one lexsort,
    the 16 permutations as ``minimum.reduceat`` over doc segments, and
    band keys via numpy string concatenation.  Scalar reference twin:
    ``functions.hashing.minhash_signature`` (equality pinned in tests).
    """

    def sig(t: pa.Table) -> pa.Table:
        from .text import token_hash_flat

        ids = np.asarray(t.column("doc_id"))
        text = t.column("text").combine_chunks()
        n = t.num_rows
        if n == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "band_key": pa.array([], pa.string())})
        lens, th60 = token_hash_flat(text)
        th = th60 % H.MOD
        # composed shingle hashes over the flat array; a window is valid
        # iff all 3 positions fall in the same doc
        rows = np.zeros(0, np.int64)
        xs = np.zeros(0, np.int64)
        if len(th) >= H.SHINGLE_K:
            x_all = (th[:-2] * H.SHINGLE_C1 + th[1:-1] * H.SHINGLE_C2 + th[2:]) % H.MOD
            row_of = np.repeat(np.arange(n, dtype=np.int64), lens)
            valid = row_of[:-2] == row_of[2:]
            rows, xs = row_of[:-2][valid], x_all[valid]
        short = lens < H.SHINGLE_K
        if short.any():
            stext = text.filter(pa.array(short))
            sx = H.md5int60_batch(np.asarray(stext.to_pandas(), dtype=object)) % H.MOD
            rows = np.concatenate([rows, np.nonzero(short)[0]])
            xs = np.concatenate([xs, sx])
        # distinct (doc, x), doc-sorted segments
        order = np.lexsort((xs, rows))
        r, x = rows[order], xs[order]
        first = np.ones(len(r), bool)
        first[1:] = (r[1:] != r[:-1]) | (x[1:] != x[:-1])
        r, x = r[first], x[first]
        seg_first = np.ones(len(r), bool)
        seg_first[1:] = r[1:] != r[:-1]
        seg_starts = np.nonzero(seg_first)[0]
        # every doc yields >= 1 shingle hash (>=3 tokens -> windows;
        # <3 tokens -> whole-text fallback), so segments == docs
        assert len(seg_starts) == n, "minhash: doc without shingle hash"
        sig16 = np.empty((H.N_PERM, n), np.int64)
        for j, (a, b) in enumerate(zip(H.PERM_A, H.PERM_B)):
            sig16[j] = np.minimum.reduceat((a * x + b) % H.MOD, seg_starts)
        rpb = H.ROWS_PER_BAND
        keys = []
        for b in range(H.N_BANDS):
            k = np.full(n, f"{b}", dtype=object)
            for jj in range(rpb):
                k = np.char.add(np.char.add(k.astype(str), ":"),
                                sig16[b * rpb + jj].astype(str))
            keys.append(k)
        return pa.table(
            {"doc_id": pa.array(np.tile(ids, H.N_BANDS), pa.int64()),
             "band_key": pa.array(np.concatenate(keys).astype(object), pa.string())}
        )

    return docs.map_batches(sig, batch_format="pyarrow", zero_copy_batch=True)


def dedup_minhash_pairs(docs: ray.data.Dataset, num_parts: int = 32) -> ray.data.Dataset:
    """LSH candidate pairs: docs sharing any full band of the 16-perm
    minhash signature (4 bands × 4 rows)."""
    sigs = minhash_signatures(docs)

    def pairs(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        out = _pairs_within_groups(df, ["band_key"])
        return from_pandas_clean(out.rename(columns={"doc_id_a": "doc_a", "doc_id_b": "doc_b"}))

    cand = partition_map(sigs, ["band_key"], num_parts, pairs)
    # distinct across bands
    def dd(t: pa.Table) -> pa.Table:
        return t.group_by(["doc_a", "doc_b"]).aggregate([]).select(["doc_a", "doc_b"])

    return partition_map(cand.map_batches(dd, batch_format="pyarrow", zero_copy_batch=True),
                         ["doc_a", "doc_b"], num_parts, dd)


def simhash_bands(docs: ray.data.Dataset, num_parts: int = 32) -> ray.data.Dataset:
    """SimHash near-dup candidates: 60-bit simhash split into 4 bands of
    15 bits; docs sharing any band value are candidates (catches every
    hamming-distance ≤ 3 pair with certainty).  15-bit band values keep
    bucket sizes tiny at scale (the old 16-bit/2-band scheme had 512
    distinct band values globally — quadratic in-bucket merges)."""

    def sig(t: pa.Table) -> pa.Table:
        from .text import simhash60_col

        ids = np.asarray(t.column("doc_id"))
        sims = simhash60_col(t.column("text").combine_chunks())
        out = {"doc_id": [], "band_key": []}
        mask = np.int64((1 << H.SIMHASH_BAND_BITS) - 1)
        for b in range(H.SIMHASH_BANDS):
            vals = (sims >> np.int64(H.SIMHASH_BAND_BITS * b)) & mask
            out["doc_id"].append(ids)
            out["band_key"].append(
                np.char.add(f"{b}:", vals.astype(np.int64).astype(str))
            )
        return pa.table(
            {"doc_id": pa.array(np.concatenate(out["doc_id"]), pa.int64()),
             "band_key": pa.array(np.concatenate(out["band_key"]).astype(object), pa.string())}
        )

    sigs = docs.map_batches(sig, batch_format="pyarrow", zero_copy_batch=True)

    def pairs(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        out = _pairs_within_groups(df, ["band_key"])
        return from_pandas_clean(out.rename(columns={"doc_id_a": "doc_a", "doc_id_b": "doc_b"}))

    cand = partition_map(sigs, ["band_key"], num_parts, pairs)

    def dd(t: pa.Table) -> pa.Table:
        return t.group_by(["doc_a", "doc_b"]).aggregate([]).select(["doc_a", "doc_b"])

    return partition_map(cand.map_batches(dd, batch_format="pyarrow", zero_copy_batch=True),
                         ["doc_a", "doc_b"], num_parts, dd)


def _jaccard_small_plan(
    sh: ray.data.Dataset, threshold: float, num_parts: int
) -> ray.data.Dataset:
    """Single-exchange exact plan for SMALL shingle tables (gated by row
    count): co-group by source, pair-count via a pandas self-merge.  The
    in-task work is quadratic in the source's doc count, which the gate
    bounds; above the gate the PPJoin plan amortizes its ~10 exchanges."""

    def pairs(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        m = df.merge(df, on=["source", "h"], suffixes=("_a", "_b"))
        m = m[m["doc_id_a"] < m["doc_id_b"]]
        inter = m.groupby(["doc_id_a", "doc_id_b"]).agg(
            ni=("h", "size"), na=("size_a", "first"), nb=("size_b", "first")
        ).reset_index()
        jac = inter["ni"].astype(float) / (inter["na"] + inter["nb"] - inter["ni"]).astype(float)
        keep = inter[jac >= threshold]
        out = keep.rename(columns={"doc_id_a": "doc_a", "doc_id_b": "doc_b"})[["doc_a", "doc_b"]]
        return from_pandas_clean(out)

    return partition_map(sh, ["source"], num_parts, pairs)


def ngram_jaccard_pairs(
    docs: ray.data.Dataset,
    threshold: float = 0.5,
    num_parts: int = 32,
    small_plan_rows: int = 2_000_000,
) -> ray.data.Dataset:
    """Exact n-gram Jaccard near-dup pairs within each ``source`` —
    PPJoin-style prefix-filtered plan (replaces the r1 per-source
    all-pairs merge, which materialized a whole source in one task):

    1. explode distinct shingle HASHES (uint64-composed token md5s,
       vectorized) with per-doc set size;
    2. global shingle document-frequency (per-batch combiner + one
       hash exchange on (source, shingle));
    3. per-doc PREFIX under the global (df, hash) total order:
       p = n - ceil(t*n) + 1 — the standard prefix-filter guarantee:
       any pair with Jaccard >= t shares at least one prefix element;
    4. candidate pairs generated only inside prefix-shingle groups
       (bounded by prefix df, not source size);
    5. exact verification per candidate: both docs' full sorted hash
       lists joined in (nested-capable engine join), |A∩B| by sorted
       intersection.

    Hashing shingles to 64-bit composed ids bounds false intersections
    at ~2^-64 per pair (disclosed divergence from the string-exact
    oracle; no observable effect at any tested scale).  No kernel's
    work grows quadratically with its partition size."""
    from ..functions.grouping import group_to_lists
    from ..functions.joins import flat_join, join_on_unique

    def explode(t: pa.Table) -> pa.Table:
        # vectorized (r5, VERDICT r4 #6): md5 once per DISTINCT token via
        # text.token_hash_flat, shingle ids composed as uint64-wrap
        # arithmetic over the flat hash array (functions.hashing.SHINGLE_U*),
        # per-doc distinct via one lexsort — same machinery as
        # minhash_signatures.sig, no per-shingle Python/crypto loop.
        from .text import token_hash_flat

        empty = pa.table(
            {"source": pa.array([], pa.string()),
             "doc_id": pa.array([], pa.int64()),
             "h": pa.array([], pa.int64()),
             "size": pa.array([], pa.int64())}
        )
        n = t.num_rows
        if n == 0:
            return empty
        ids = np.asarray(t.column("doc_id"))
        src = t.column("source").combine_chunks()
        text = t.column("text").combine_chunks()
        lens, th60 = token_hash_flat(text)
        th = th60.astype(np.uint64)
        rows = np.zeros(0, np.int64)
        xs = np.zeros(0, np.uint64)
        if len(th) >= H.SHINGLE_K:
            x_all = (th[:-2] * np.uint64(H.SHINGLE_U1)
                     + th[1:-1] * np.uint64(H.SHINGLE_U2) + th[2:])
            row_of = np.repeat(np.arange(n, dtype=np.int64), lens)
            valid = row_of[:-2] == row_of[2:]
            rows, xs = row_of[:-2][valid], x_all[valid]
        short = lens < H.SHINGLE_K
        if short.any():
            stext = text.filter(pa.array(short))
            sx = H.md5int60_batch(
                np.asarray(stext.to_pandas(), dtype=object)).astype(np.uint64)
            rows = np.concatenate([rows, np.nonzero(short)[0]])
            xs = np.concatenate([xs, sx])
        if len(rows) == 0:
            return empty
        order = np.lexsort((xs, rows))
        r, x = rows[order], xs[order]
        first = np.ones(len(r), bool)
        first[1:] = (r[1:] != r[:-1]) | (x[1:] != x[:-1])
        r, x = r[first], x[first]
        sizes = np.bincount(r, minlength=n)
        return pa.table(
            {"source": src.take(pa.array(r)),
             "doc_id": pa.array(ids[r], pa.int64()),
             "h": pa.array(x.view(np.int64), pa.int64()),
             "size": pa.array(sizes[r], pa.int64())}
        )

    sh = docs.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True).materialize()

    # scale-adaptive plan: under ``small_plan_rows`` exploded shingles the
    # exchange latency of the PPJoin plan dominates — use the bounded
    # single-exchange plan instead (same exact result)
    if sh.count() <= small_plan_rows:
        return _jaccard_small_plan(sh, threshold, min(num_parts, 8))

    # (2) document frequency with a per-batch combiner before the exchange
    def local_cnt(t: pa.Table) -> pa.Table:
        g = t.group_by(["source", "h"]).aggregate([("doc_id", "count")])
        return g.rename_columns(["source", "h", "df"])

    def merge_cnt(t: pa.Table) -> pa.Table:
        g = t.group_by(["source", "h"]).aggregate([("df", "sum")])
        return g.rename_columns(["source", "h", "df"])

    df_tab = partition_map(
        sh.map_batches(local_cnt, batch_format="pyarrow", zero_copy_batch=True),
        ["source", "h"], num_parts, merge_cnt,
    )

    joined = flat_join(sh, df_tab, on=("source", "h"), num_partitions=num_parts)

    # (3) per-doc prefix under the global (df, h) order
    def prefix(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["doc_id", "df", "h"], kind="mergesort")
        rnk = df.groupby("doc_id", sort=False).cumcount()
        p = df["size"] - np.ceil(threshold * df["size"]).astype(np.int64) + 1
        keep = df[rnk < p]
        return from_pandas_clean(keep[["source", "doc_id", "h", "size"]])

    pref = partition_map(joined, ["doc_id"], num_parts, prefix)

    # (4) candidates within prefix-shingle groups
    def pairs(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        m = df.merge(df, on=["source", "h"], suffixes=("_a", "_b"))
        m = m[m["doc_id_a"] < m["doc_id_b"]]
        out = m.rename(
            columns={"doc_id_a": "doc_a", "doc_id_b": "doc_b",
                     "size_a": "n_a", "size_b": "n_b"}
        )[["doc_a", "doc_b", "n_a", "n_b"]].drop_duplicates()
        return from_pandas_clean(out)

    cand = distinct(
        partition_map(pref, ["source", "h"], num_parts, pairs),
        ["doc_a", "doc_b", "n_a", "n_b"], num_parts,
    )

    # (5) exact verification against full sorted hash lists
    lists = group_to_lists(
        sh.map_batches(lambda t: t.select(["doc_id", "h"]), batch_format="pyarrow"),
        "doc_id", sort_cols=["h"], num_parts=num_parts,
    )
    la = lists.map_batches(
        lambda t: t.rename_columns(["doc_a", "ha"]), batch_format="pyarrow"
    )
    lb = lists.map_batches(
        lambda t: t.rename_columns(["doc_b", "hb"]), batch_format="pyarrow"
    )
    cand_schema = pa.schema(
        [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("n_a", pa.int64()), ("n_b", pa.int64())]
    )
    la_schema = pa.schema([("doc_a", pa.int64()), ("ha", pa.list_(pa.int64()))])
    lb_schema = pa.schema([("doc_b", pa.int64()), ("hb", pa.list_(pa.int64()))])
    j1 = join_on_unique(cand, la, "doc_a", cand_schema, la_schema, num_parts=num_parts)
    j1_schema = pa.schema(list(cand_schema) + [pa.field("ha", pa.list_(pa.int64()))])
    j2 = join_on_unique(j1, lb, "doc_b", j1_schema, lb_schema, num_parts=num_parts)

    def verify(t: pa.Table) -> pa.Table:
        ha = t.column("ha").to_pylist()
        hb = t.column("hb").to_pylist()
        na = np.asarray(t.column("n_a"), dtype=np.float64)
        nb = np.asarray(t.column("n_b"), dtype=np.float64)
        ni = np.fromiter(
            (len(np.intersect1d(np.asarray(a), np.asarray(b), assume_unique=True))
             for a, b in zip(ha, hb)),
            dtype=np.float64, count=t.num_rows,
        )
        jac = ni / (na + nb - ni)
        keep = pa.array(jac >= threshold)
        return t.filter(keep).select(["doc_a", "doc_b"])

    return j2.map_batches(verify, batch_format="pyarrow", zero_copy_batch=True)


def embedding_dup_pairs(
    embeddings: ray.data.Dataset,
    threshold: float = 0.95,
    num_parts: int = 16,
    n_blocks: int = 4,
    mode: str = "auto",
    seed: int = 42,
    target_recall: float = 0.9999,
    auto_lsh_above: int = 100_000,
) -> ray.data.Dataset:
    """Embedding-cosine near-dup pairs within each ``label``.

    ``mode='auto'`` (default — VERDICT r3 #3): size-gated plan choice.
    Below ``auto_lsh_above`` total vectors the exact block-tiled plan
    runs (cheap at that size, zero recall risk — and it keeps the
    sf0.01/sf0.1 gate scales on the oracle-exact path); above it the
    O(n²)-flop bill of exactness is the 100-TB scale-killer, so the
    ANN-gated LSH plan takes over (linear flops, exact-verify
    precision, ``target_recall`` recall).  The gate counts TOTAL rows
    (one metadata-cheap pass) as a proxy for the per-label max — labels
    are a small enum here, so total/n_labels tracks the per-label cost
    within a constant.

    ``mode='exact'``: BLOCK-TILED exact all-pairs (replaces the r1
    whole-label matmul): vectors hash into ``n_blocks`` blocks per
    label; every unordered block pair (bi <= bj) is one partition whose
    kernel computes a bounded cross matmul.  Total flops stay O(n²) per
    label — inherent to exactness — but per-task memory and work are
    bounded by the block size.  At scale set
    ``n_blocks ≈ n_label / 4096``; replication factor is ``n_blocks``.

    ``mode='lsh'`` (VERDICT r2 #4 — the scale path for the flop bill):
    ANN-gated candidate generation + exact verify.  L independent
    hyperplane tables of b bits each bucket the vectors; candidate pairs
    come only from shared (label, table, code) buckets, each verified
    with the exact cosine kernel, then globally deduped.  Precision is
    exact (the verify step); recall is 1-(1-p^b)^L with
    p = 1 - arccos(threshold)/π, and (b, L) are auto-sized: b bounds
    buckets at ~8k vectors (b = log2(n/8k)), L hits ``target_recall``.
    Flops per label ≈ L·n·8k — LINEAR in n at fixed duplicate density,
    vs the exact mode's n²; replication factor is L.  A probabilistic
    recall<1 is the disclosed trade (tests pin lsh==exact at the gate
    scale, where the seeded tables are deterministic).
    """
    n_total: int | None = None
    if mode == "auto":
        # materialize BEFORE counting so a non-trivial upstream pipeline
        # executes once, not once for the plan gate and again for the
        # chosen plan (count() on a bare read stays metadata-cheap; on a
        # computed dataset it would otherwise run the whole thing)
        embeddings = embeddings.materialize()
        n_total = embeddings.count()
        mode = "lsh" if n_total > auto_lsh_above else "exact"
    if mode == "lsh":
        return _embedding_dup_pairs_lsh(
            embeddings, threshold, num_parts, seed, target_recall, n=n_total
        )
    if mode != "exact":
        raise ValueError(f"mode must be 'auto', 'exact' or 'lsh', got {mode!r}")

    def replicate(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column("vec_id"))
        blk = (ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15) % np.uint64(n_blocks)).astype(
            np.int32
        )
        tables = []
        for other in range(n_blocks):
            bi = np.minimum(blk, other)
            bj = np.maximum(blk, other)
            tables.append(
                pa.table(
                    {
                        "label": t.column("label"),
                        "bi": pa.array(bi, pa.int32()),
                        "bj": pa.array(bj, pa.int32()),
                        "blk": pa.array(blk, pa.int32()),
                        "vec_id": t.column("vec_id"),
                        "embedding": t.column("embedding"),
                    }
                )
            )
        return pa.concat_tables(tables)

    rep = embeddings.map_batches(replicate, batch_format="pyarrow", zero_copy_batch=True)

    def pairs(t: pa.Table) -> pa.Table:
        # a hash partition can hold several (label, bi, bj) groups; each
        # group's kernel is a bounded block×block matmul.  A row appears
        # in group (b, b) exactly once (other == b), so no dedup needed.
        # Group bounds via lexsort over the composite key (no pandas, no
        # per-group embedding tolist — the matrix is built ONCE zero-copy).
        if t.num_rows == 0:
            return pa.table({"vec_a": pa.array([], pa.int64()),
                             "vec_b": pa.array([], pa.int64())})
        lab = np.asarray(t.column("label"))
        bia = np.asarray(t.column("bi"))
        bja = np.asarray(t.column("bj"))
        blka = np.asarray(t.column("blk"))
        idsa = np.asarray(t.column("vec_id"))
        mat = _emb64(t.column("embedding"))
        norms = np.sqrt((mat * mat).sum(axis=1))
        normed = mat / norms[:, None]
        order = np.lexsort((bja, bia, lab))
        ls, is_, js = lab[order], bia[order], bja[order]
        change = (ls[1:] != ls[:-1]) | (is_[1:] != is_[:-1]) | (js[1:] != js[:-1])
        bounds = np.concatenate([[0], np.nonzero(change)[0] + 1, [len(order)]])
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        for s, e in zip(bounds[:-1], bounds[1:]):
            sel = order[s:e]
            bi, bj = is_[s], js[s]
            ids = idsa[sel]
            gn = normed[sel]
            blk = blka[sel]
            if bi == bj:
                sim = gn @ gn.T
                ii, jj = np.nonzero(np.triu(sim >= threshold, k=1))
                ai, bj_ = ids[ii], ids[jj]
            else:
                am = blk == bi
                bm = ~am
                if not am.any() or not bm.any():
                    continue
                sim = gn[am] @ gn[bm].T
                ii, jj = np.nonzero(sim >= threshold)
                ai, bj_ = ids[am][ii], ids[bm][jj]
            out_a.append(np.minimum(ai, bj_))
            out_b.append(np.maximum(ai, bj_))
        a = np.concatenate(out_a) if out_a else np.empty(0, np.int64)
        b = np.concatenate(out_b) if out_b else np.empty(0, np.int64)
        return pa.table({"vec_a": pa.array(a, pa.int64()), "vec_b": pa.array(b, pa.int64())})

    return partition_map(rep, ["label", "bi", "bj"], num_parts, pairs)


def _lsh_params(n: int, threshold: float, target_recall: float) -> tuple[int, int]:
    """(bits_per_table, n_tables): b bounds buckets at ~8k vectors under a
    uniform spread; L = ceil(log(1-recall)/log(1-p^b)) hits the recall
    target for pairs AT the threshold (closer pairs collide more often)."""
    p = 1.0 - np.arccos(np.clip(threshold, -1.0, 1.0)) / np.pi
    b = int(np.clip(round(np.log2(max(n / 8192.0, 2.0))), 1, 20))
    pb = max(p**b, 1e-12)
    L = int(np.ceil(np.log(max(1.0 - target_recall, 1e-12)) / np.log(max(1.0 - pb, 1e-12))))
    return b, int(np.clip(L, 1, 64))


def _embedding_dup_pairs_lsh(
    embeddings: ray.data.Dataset,
    threshold: float,
    num_parts: int,
    seed: int,
    target_recall: float,
    n: int | None = None,
) -> ray.data.Dataset:
    if n is None:
        n = embeddings.count()

    def dim_of() -> int:
        return len(embeddings.take(1)[0]["embedding"])

    b, L = _lsh_params(n, threshold, target_recall)
    d = dim_of()
    planes = np.random.RandomState(seed).normal(size=(L, b, d))

    def bucketize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"label": pa.array([], pa.int32()),
                 "table_id": pa.array([], pa.int32()),
                 "code": pa.array([], pa.int64()),
                 "vec_id": pa.array([], pa.int64()),
                 "embedding": pa.array([], t.schema.field("embedding").type)}
            )
        mat = _emb64(t.column("embedding"))
        tables = []
        for li in range(L):
            signs = (mat @ planes[li].T) > 0
            code = np.zeros(t.num_rows, dtype=np.int64)
            for bi in range(b):
                code |= signs[:, bi].astype(np.int64) << bi
            tables.append(
                pa.table(
                    {"label": t.column("label"),
                     "table_id": pa.array(np.full(t.num_rows, li, np.int32)),
                     "code": pa.array(code, pa.int64()),
                     "vec_id": t.column("vec_id"),
                     "embedding": t.column("embedding")}
                )
            )
        return pa.concat_tables(tables)

    rep = embeddings.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)

    def verify(t: pa.Table) -> pa.Table:
        # per (label, table, code) bucket: exact cosine all-pairs inside
        # the bucket only (bounded by the ~8k bucket-size target)
        empty = pa.table({"vec_a": pa.array([], pa.int64()),
                          "vec_b": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        lab = np.asarray(t.column("label"))
        tid = np.asarray(t.column("table_id"))
        code = np.asarray(t.column("code"))
        ids = np.asarray(t.column("vec_id"))
        mat = _emb64(t.column("embedding"))
        norms = np.sqrt((mat * mat).sum(axis=1))
        normed = mat / norms[:, None]
        order = np.lexsort((code, tid, lab))
        l2, t2, c2 = lab[order], tid[order], code[order]
        change = (l2[1:] != l2[:-1]) | (t2[1:] != t2[:-1]) | (c2[1:] != c2[:-1])
        bounds = np.concatenate([[0], np.nonzero(change)[0] + 1, [len(order)]])
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e - s < 2:
                continue
            sel = order[s:e]
            gn = normed[sel]
            gids = ids[sel]
            sim = gn @ gn.T
            ii, jj = np.nonzero(np.triu(sim >= threshold, k=1))
            if len(ii):
                ai, bj = gids[ii], gids[jj]
                out_a.append(np.minimum(ai, bj))
                out_b.append(np.maximum(ai, bj))
        if not out_a:
            return empty
        return pa.table({"vec_a": pa.array(np.concatenate(out_a), pa.int64()),
                         "vec_b": pa.array(np.concatenate(out_b), pa.int64())})

    cand = partition_map(rep, ["label", "table_id", "code"], num_parts, verify)
    # a pair can surface from several tables: one global exact dedup
    return distinct(cand, ["vec_a", "vec_b"], num_parts)


def connected_components(
    pairs: ray.data.Dataset,
    vertices: ray.data.Dataset,
    num_parts: int = 32,
    max_iters: int = 50,
    round_stats: list | None = None,
    on_nonconverge: str = "raise",
) -> ray.data.Dataset:
    """Connected components over an undirected pair graph →
    (doc_id, cluster_id), where ``cluster_id`` is the minimum doc_id
    reachable from the vertex (isolated vertices map to themselves).
    ``pairs`` carries (doc_a, doc_b) int edges; ``vertices`` any dataset
    with a ``doc_id`` column, UNIQUE per doc_id, covering every edge
    endpoint (an endpoint without a vertex row is silently dropped; a
    duplicated vertex row would leave a stale label copy behind).

    Distributed min-label propagation over a CO-PARTITIONED edge index
    with a FRONTIER (delta) round — the one operator in the engine that
    drops below the Dataset API, because Ray Data cannot express "keep
    this big side partitioned and resident across iterations":

    * Setup (once): the bidirectional edge list and the label seed are
      hash-partitioned by ``hash(doc_id) % P`` into P pyarrow tables
      pinned in the object store.  The O(E) edge bytes move exactly
      once; Ray's locality-aware scheduling then runs each round's
      per-partition task next to its resident edge shard.
    * Per round: partition p joins its edge shard against its frontier
      shard (vertices whose label changed last round; round 1 = all) and
      emits min-label proposals split by ``hash(dst) % P`` — only
      frontier labels and proposals cross the wire, so per-round traffic
      is O(edges incident to the frontier), decaying geometrically as
      components settle, instead of O(E) per round.  Partition q then
      min-merges proposals into its resident label shard and reports a
      scalar changed-count; the driver only sums P scalars per round.

    Correct by induction: a label reaches a neighbor in the round after
    it last decreased, and every label proposes in round 1.  LSH
    components are band-bucket unions, so diameters stay small.  For
    adversarial long-chain graphs swap in star-contraction; the
    partitioning/merge shape here is unchanged.

    ``round_stats``, if given, receives one int per round: the number of
    labels that changed (== next round's frontier size) — the frontier
    decay curve, recorded for the scale evidence in BASELINE.md.

    Convergence contract (r5, ADVICE r4): min-label propagation needs
    ~diameter rounds; if the frontier is still nonzero after
    ``max_iters`` rounds the labels are PARTIAL.  ``on_nonconverge``
    selects what happens then: ``'raise'`` (default — wrong cluster ids
    must not flow silently downstream) or ``'warn'`` (returns the
    partial labels after a ``RuntimeWarning``; ``round_stats`` ending
    nonzero identifies the partial result programmatically).
    """
    import ray

    from ..functions.grouping import hash_keys

    # validate BEFORE the exchanges: a bad argument must not cost two
    # full cluster-wide hash exchanges first (review r5)
    if on_nonconverge not in ("raise", "warn"):
        raise ValueError(f"on_nonconverge must be 'raise' or 'warn', got {on_nonconverge!r}")

    P = max(2, int(num_parts))  # num_returns=1 would unwrap the shard tuple

    def bidir(t: pa.Table) -> pa.Table:
        a = t.column("doc_a").combine_chunks().cast(pa.int64())
        b = t.column("doc_b").combine_chunks().cast(pa.int64())
        return pa.table(
            {"doc_id": pa.concat_arrays([a, b]), "dst": pa.concat_arrays([b, a])}
        )

    edges = pairs.map_batches(bidir, batch_format="pyarrow", zero_copy_batch=True).materialize()

    seeds = vertices.map_batches(
        lambda t: pa.table(
            {"doc_id": t.column("doc_id").combine_chunks().cast(pa.int64()),
             "label": t.column("doc_id").combine_chunks().cast(pa.int64())}
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()

    def _split(t: pa.Table, parts: int) -> tuple:
        """Hash-split a table by doc_id into `parts` sub-tables (schema-
        preserving slices, so empty shards still carry the schema)."""
        if t.num_rows == 0:
            return tuple(t for _ in range(parts))
        part = (hash_keys(t, ["doc_id"]) % np.uint64(parts)).astype(np.int64)
        order = np.argsort(part, kind="stable")
        ts = t.take(pa.array(order)).combine_chunks()
        offs = np.searchsorted(part[order], np.arange(parts + 1))
        return tuple(ts.slice(offs[p], offs[p + 1] - offs[p]) for p in range(parts))

    @ray.remote
    def split_block(t: pa.Table, parts: int, schema: pa.Schema) -> tuple:
        # empty upstream blocks arrive ZERO-COLUMN (a map task with no
        # output rows emits a schemaless block); normalize to the shard
        # schema so concat_part's pa.concat_tables sees one schema
        if t.num_rows == 0:
            t = schema.empty_table()
        return _split(t, parts)

    @ray.remote
    def concat_part(*tabs: pa.Table) -> pa.Table:
        return pa.concat_tables(tabs).combine_chunks()

    def exchange_once(ds: ray.data.Dataset, schema: pa.Schema) -> list:
        """One-time hash exchange: Dataset → P pinned partition tables."""
        blocks = ds.to_arrow_refs()
        if not blocks:  # zero-block dataset: P empty shards of the schema
            empty = ray.put(schema.empty_table())
            return [empty for _ in range(P)]
        split_refs = [
            split_block.options(num_returns=P).remote(b, P, schema) for b in blocks
        ]
        return [concat_part.remote(*[sr[p] for sr in split_refs]) for p in range(P)]

    @ray.remote
    def propose(edge_t: pa.Table, frontier_t: pa.Table) -> tuple:
        """Inner-join the resident edge shard with this round's frontier
        shard on source doc_id; emit (dst, label) proposals hash-split by
        dst so each lands on its label shard."""
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "label": pa.array([], pa.int64())})
        if edge_t.num_rows == 0 or frontier_t.num_rows == 0:
            return tuple(empty for _ in range(P))
        ek = np.asarray(edge_t.column("doc_id"))
        fk = np.asarray(frontier_t.column("doc_id"))
        order = np.argsort(fk, kind="stable")
        fks = fk[order]
        ri = np.searchsorted(fks, ek)
        ric = np.minimum(ri, len(fks) - 1)
        matched = fks[ric] == ek
        dst = np.asarray(edge_t.column("dst"))[matched]
        lab = np.asarray(frontier_t.column("label"))[order[ric[matched]]]
        props = pa.table({"doc_id": pa.array(dst, pa.int64()),
                          "label": pa.array(lab, pa.int64())})
        return _split(props, P)

    @ray.remote(num_returns=3)
    def merge_min(label_t: pa.Table, *prop_tabs: pa.Table):
        """Min-merge proposals into the resident label shard; return the
        new shard, a scalar changed-count, and the changed-rows frontier."""
        props = pa.concat_tables(prop_tabs).combine_chunks()
        empty_frontier = label_t.slice(0, 0)
        if props.num_rows == 0 or label_t.num_rows == 0:
            return label_t, 0, empty_frontier
        d = np.asarray(label_t.column("doc_id"))
        old = np.asarray(label_t.column("label"))
        order = np.argsort(d, kind="stable")
        ds_ = d[order]
        new = old[order].copy()
        pd_ = np.asarray(props.column("doc_id"))
        pl_ = np.asarray(props.column("label"))
        idx = np.minimum(np.searchsorted(ds_, pd_), len(ds_) - 1)
        hit = ds_[idx] == pd_  # every dst is a seeded doc; guard anyway
        np.minimum.at(new, idx[hit], pl_[hit])
        changed = new < old[order]
        shard = pa.table({"doc_id": pa.array(ds_, pa.int64()),
                          "label": pa.array(new, pa.int64())})
        frontier = pa.table({"doc_id": pa.array(ds_[changed], pa.int64()),
                             "label": pa.array(new[changed], pa.int64())})
        return shard, int(changed.sum()), frontier

    edge_schema = pa.schema([("doc_id", pa.int64()), ("dst", pa.int64())])
    label_schema = pa.schema([("doc_id", pa.int64()), ("label", pa.int64())])
    edge_parts = exchange_once(edges, edge_schema)
    label_parts = exchange_once(seeds, label_schema)
    frontier_parts = label_parts  # round 1: every vertex proposes

    n_changed = 0
    # max_iters + 1 rounds: labels that changed in round max_iters may
    # already be COMPLETE (a graph of diameter exactly max_iters), and
    # only a further all-quiet round can tell complete-at-the-boundary
    # from partial — without it, a converged-in-exactly-max_iters graph
    # raised a false non-convergence error (review r5).  The extra round
    # costs one frontier pass and only runs when round max_iters changed
    # something.
    for _ in range(max_iters + 1):
        prop_grid = [
            propose.options(num_returns=P).remote(edge_parts[p], frontier_parts[p])
            for p in range(P)
        ]
        new_labels, changed_refs, new_frontiers = [], [], []
        for q in range(P):
            nl, ch, fr = merge_min.remote(
                label_parts[q], *[prop_grid[p][q] for p in range(P)]
            )
            new_labels.append(nl)
            changed_refs.append(ch)
            new_frontiers.append(fr)
        label_parts = new_labels
        frontier_parts = new_frontiers
        n_changed = sum(ray.get(changed_refs))
        if round_stats is not None:
            round_stats.append(int(n_changed))
        if n_changed == 0:
            break

    if n_changed > 0:
        msg = (f"connected_components did not converge within max_iters="
               f"{max_iters} ({n_changed} labels still changing): the "
               f"returned cluster ids are PARTIAL. Raise max_iters "
               f"(~graph diameter rounds are needed).")
        if on_nonconverge == "raise":
            raise RuntimeError(msg)
        import warnings

        warnings.warn(msg, RuntimeWarning, stacklevel=2)

    return ray.data.from_arrow_refs(label_parts).map_batches(
        lambda t: pa.table(
            {"doc_id": t.column("doc_id"), "cluster_id": t.column("label")}
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def dedup_clusters(
    docs: ray.data.Dataset, num_parts: int = 32, max_iters: int = 50
) -> ray.data.Dataset:
    """Fuzzy dedup end-to-end: connected components over the MinHash-LSH
    candidate-pair graph → (doc_id, cluster_id), where ``cluster_id`` is
    the minimum doc_id reachable through near-duplicate pairs (singletons
    map to themselves; the canonical survivor of each cluster is the row
    with doc_id == cluster_id).  The propagation core is the public
    ``connected_components`` operator; see its docstring for the
    co-partitioned frontier design."""
    pairs = dedup_minhash_pairs(docs, num_parts=num_parts).materialize()
    return connected_components(pairs, docs, num_parts=num_parts, max_iters=max_iters)
