"""AS-OF join, value band join, per-group top-k, and distributed exact
quantiles: engine results vs in-memory pandas/numpy references on the
sf0.001 driver tables, plus edge-case unit kernels."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

SF = "/root/testdata/sf0.001"


def _read(path, cols):
    sch = pq.read_schema(path).remove_metadata()
    sch = pa.schema([sch.field(c) for c in cols])
    return rd.read_parquet(path, columns=cols, schema=sch)


def _events_df():
    return pq.read_table(f"{SF}/events.parquet").to_pandas()


def test_asof_join_matches_pandas():
    from osm2geojson_ray.stages.events import asof_join

    ev = _read(f"{SF}/events.parquet", ["event_id", "ts", "user_id", "event_type"])
    got = asof_join(ev, num_parts=8).to_pandas().sort_values("event_id").reset_index(drop=True)

    df = _events_df()
    left = df[df.event_type == "purchase"][["event_id", "user_id", "ts"]].sort_values("ts")
    right = (
        df[df.event_type == "view"][["event_id", "user_id", "ts"]]
        .rename(columns={"event_id": "matched_event_id", "ts": "matched_ts"})
        .sort_values("matched_ts")
    )
    ref = pd.merge_asof(
        left, right, left_on="ts", right_on="matched_ts", by="user_id",
        direction="backward",
    ).sort_values("event_id").reset_index(drop=True)
    assert (got.event_id == ref.event_id).all()
    assert got.matched_ts.isna().sum() == ref.matched_ts.isna().sum() > 0
    m = got.matched_event_id.notna()
    assert (got.matched_event_id[m].astype("int64") == ref.matched_event_id[m].astype("int64")).all()


def test_band_join_count_matches_bruteforce():
    from osm2geojson_ray.stages.events import band_join_count

    ev = _read(f"{SF}/events.parquet", ["event_id", "value", "event_type"])
    got = band_join_count(ev, delta=0.5, num_parts=8).to_pandas().sort_values("event_id").reset_index(drop=True)

    df = _events_df()
    lv = df[df.event_type == "purchase"].sort_values("event_id")
    rv = df[df.event_type == "click"]["value"].to_numpy()
    ref_n = (np.abs(lv["value"].to_numpy()[:, None] - rv[None, :]) <= 0.5).sum(axis=1)
    assert (got.event_id.to_numpy() == lv.event_id.to_numpy()).all()
    assert (got.n_close.to_numpy() == ref_n).all()


def test_band_join_boundary_exact():
    """Values exactly delta apart MUST count (the slack+exact-predicate
    two-step can't round them away)."""
    from osm2geojson_ray.stages.events import band_join_count

    t = pa.table(
        {
            "event_id": pa.array([1, 2, 10, 11, 12], pa.int64()),
            "value": pa.array([1.0, 2.5, 0.5, 1.5, 3.1], pa.float64()),
            "event_type": pa.array(["purchase", "purchase", "click", "click", "click"]),
        }
    )
    got = (
        band_join_count(rd.from_arrow(t), delta=0.5, num_parts=4)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    # |1.0-0.5|=0.5 ✓, |1.0-1.5|=0.5 ✓; |2.5-3.1|=0.6 ✗ → counts [2, 0]
    assert got.n_close.tolist() == [2, 0]


def test_top_orders_matches_pandas():
    from osm2geojson_ray.stages.relational import top_orders_per_customer

    orders = _read(f"{SF}/orders.parquet", ["o_custkey", "o_orderkey", "o_totalprice"])
    got = (
        top_orders_per_customer(orders, k=3, num_parts=8)
        .to_pandas().sort_values(["o_custkey", "rnk"]).reset_index(drop=True)
    )

    df = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    df = df.sort_values(
        ["o_custkey", "o_totalprice", "o_orderkey"], ascending=[True, False, True]
    )
    ref = df.groupby("o_custkey", sort=False).head(3).copy()
    ref["rnk"] = ref.groupby("o_custkey", sort=False).cumcount() + 1
    ref = ref[["o_custkey", "o_orderkey", "o_totalprice", "rnk"]].sort_values(
        ["o_custkey", "rnk"]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, ref, check_dtype=False)


def _disc_quantile(v: np.ndarray, q: float) -> float:
    s = np.sort(v)
    return float(s[int(np.ceil(q * len(s))) - 1])


def test_quantiles_gather_and_hist_paths_agree():
    from osm2geojson_ray.stages.quantiles import grouped_quantiles

    ev = _read(f"{SF}/events.parquet", ["event_type", "value"])
    df = _events_df()

    # gather-only path (cap > any group) and forced-histogram path
    for cap in (10**9, 37):
        got = grouped_quantiles(
            ev, "value", "event_type", qs=(0.5, 0.9), gather_cap=cap
        ).to_pandas()
        for _, row in got.iterrows():
            vals = df[df.event_type == row.event_type]["value"].to_numpy()
            assert row["value"] == _disc_quantile(vals, row["q"]), (
                row.event_type, row["q"], cap,
            )


def test_quantiles_duplicate_value_skew():
    """>gather_cap duplicates of one value: the degenerate-interval
    short-circuit must resolve without a giant gather."""
    from osm2geojson_ray.stages.quantiles import grouped_quantiles

    v = np.concatenate([np.full(5000, 7.25), np.linspace(0, 1, 100)])
    rng = np.random.default_rng(7)
    rng.shuffle(v)
    t = pa.table({"g": pa.array(["a"] * len(v)), "value": pa.array(v)})
    got = grouped_quantiles(
        rd.from_arrow(t), "value", "g", qs=(0.5, 0.99), gather_cap=50, bins=16
    ).to_pandas()
    assert got["value"].tolist() == [7.25, 7.25]


def test_hll_registers_and_estimate():
    """Register table = exact max-rho per bucket (vs a direct per-user
    computation); estimate within HLL error bounds of the true count."""
    from osm2geojson_ray.functions.hashing import md5int60
    from osm2geojson_ray.stages.sketch import N_BUCKETS, hll_estimate, hll_registers

    ev = _read(f"{SF}/events.parquet", ["event_type", "user_id"])
    got = hll_registers(ev, "user_id", "event_type").to_pandas()

    df = _events_df()
    for et, grp in df.groupby("event_type"):
        users = grp.user_id.unique()
        regs: dict = {}
        for u in users:
            h = md5int60(str(u))
            b, w = h % N_BUCKETS, h // N_BUCKETS
            rho = 55 if w == 0 else (w & -w).bit_length()
            regs[b] = max(regs.get(b, 0), rho)
        sub = got[got.event_type == et]
        assert dict(zip(sub.bucket, sub.rho_max)) == regs
        est = hll_estimate(dict(zip(sub.bucket, sub.rho_max)))
        # 64 buckets → ~13% relative error; allow 3 sigma
        assert abs(est - len(users)) <= max(3, 0.4 * len(users))


def test_media_resize_and_frame_sample():
    """Resize preserves aspect (longest side → 224, integer floor);
    frame sampling emits min(k, n) uniformly-spaced indices."""
    from osm2geojson_ray.stages.multimodal import resize_plan, sample_frames

    t = pa.table(
        {
            "media_ref": pa.array(["a", "b", "c"]),
            "width": pa.array([1024, 100, 224], pa.int64()),
            "height": pa.array([512, 300, 224], pa.int64()),
            "n_frames": pa.array([10, 2, 4], pa.int64()),
        }
    )
    out = sample_frames(resize_plan(rd.from_arrow(t)), k=4).to_pandas()
    a = out[out.media_ref == "a"]
    assert (a.out_width == 224).all() and (a.out_height == 112).all()
    assert a.frame_idx.tolist() == [0, 2, 5, 7]  # floor(i*10/4)
    b = out[out.media_ref == "b"]
    assert (b.out_width == 74).all() and (b.out_height == 224).all()
    assert b.frame_idx.tolist() == [0, 1]  # clip shorter than k → all frames
    c = out[out.media_ref == "c"]
    assert (c.out_width == 224).all() and (c.out_height == 224).all()
    assert c.frame_idx.tolist() == [0, 1, 2, 3]


def test_asof_salted_parity_and_carry():
    """Time-bucket-salted as-of == unsalted on real data; cross-bucket
    carries resolve a mega-user whose matches live many empty buckets
    back."""
    from osm2geojson_ray.stages.events import asof_join, asof_join_salted

    ev = _read(f"{SF}/events.parquet", ["event_id", "ts", "user_id", "event_type"])
    a = asof_join(ev, num_parts=8).to_pandas().sort_values("event_id").reset_index(drop=True)
    b = (
        asof_join_salted(ev, bucket_hours=6, num_parts=8)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    a["matched_event_id"] = a["matched_event_id"].astype("float64")
    b["matched_event_id"] = b["matched_event_id"].astype("float64")
    pd.testing.assert_frame_equal(a, b)

    ts = pa.array(
        (np.array([1, 2, 50, 100, 170, 171], dtype="int64") * 3_600_000_000)
        .view("datetime64[us]"),
        pa.timestamp("us"),
    )
    t = pa.table(
        {
            "event_id": pa.array([10, 11, 20, 21, 22, 23], pa.int64()),
            "ts": ts,
            "user_id": pa.array([7] * 6, pa.int64()),
            "event_type": pa.array(
                ["view", "view", "purchase", "purchase", "view", "purchase"]
            ),
        }
    )
    got = (
        asof_join_salted(rd.from_arrow(t), bucket_hours=24, num_parts=4)
        .to_pandas().sort_values("event_id")
    )
    # purchases at h50/h100 carry back to the h2 view; h171 sees the h170 view
    assert got.matched_event_id.tolist() == [11, 11, 22]


def test_vocab_topk_matches_pandas():
    from osm2geojson_ray.stages.text import vocab_topk

    docs = _read(f"{SF}/documents.parquet", ["doc_id", "text"])
    got = vocab_topk(docs, k=10, num_parts=8).to_pandas()

    from collections import Counter
    c = Counter()
    for s in pq.read_table(f"{SF}/documents.parquet").to_pandas().text:
        c.update(s.split(" "))
    ref = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(zip(got.token, got.n)) == ref


def test_ivf_index_build_search_parity(tmp_path):
    """Persisted IVF index (build → hive-sharded lists → pruned-read
    search) returns bit-identical results to the direct ann_ivf path."""
    from osm2geojson_ray.stages.similarity import (
        ann_ivf, ivf_index_build, ivf_index_search, select_queries_batch,
    )

    emb = _read(f"{SF}/embeddings.parquet", ["vec_id", "embedding"])
    direct = (
        ann_ivf(emb, query_every=50, k=5, nprobe=2, n_iters=3)
        .to_pandas().sort_values(["query_id", "rnk"]).reset_index(drop=True)
    )
    idx = str(tmp_path / "ivf")
    meta = ivf_index_build(emb, idx, n_iters=3)
    assert meta["n_centroids"] >= 4
    q = emb.map_batches(lambda t: select_queries_batch(t, 50), batch_format="pyarrow")
    served = (
        ivf_index_search(idx, q, k=5, nprobe=2)
        .to_pandas().sort_values(["query_id", "rnk"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(direct, served)


def test_frame_embed_stub_deterministic():
    from osm2geojson_ray.functions.hashing import md5int60
    from osm2geojson_ray.stages.multimodal import EMBED_DIM, FrameEmbedStub

    t = pa.table(
        {
            "doc_id": pa.array(["d1"]),
            "span_idx": pa.array([0], pa.int64()),
            "media_ref": pa.array(["media://x"]),
            "frame_idx": pa.array([2], pa.int64()),
        }
    )
    out = FrameEmbedStub()(t)
    emb = out.column("embedding").combine_chunks().flatten().to_pylist()
    assert len(emb) == EMBED_DIM
    assert emb[3] == (md5int60("media://x:2:3") % 1000) / 1000.0


def test_streaming_window_matches_batch(tmp_path):
    """Micro-batch streaming windowing (raw-actor state) converges to
    the batch operator's windows, exactly once each."""
    import pyarrow.parquet as pq2

    from osm2geojson_ray.stages.events import windowed_agg
    from osm2geojson_ray.stages.streaming import streaming_windowed_agg

    t = pq.read_table(f"{SF}/events.parquet", columns=["user_id", "ts", "value"])
    df = t.to_pandas().sort_values("ts").reset_index(drop=True)
    paths = []
    for i in range(5):
        seg = df.iloc[i * len(df) // 5 : (i + 1) * len(df) // 5]
        p = str(tmp_path / f"seg-{i}.parquet")
        pq2.write_table(pa.Table.from_pandas(seg, preserve_index=False), p)
        paths.append(p)

    got = (
        streaming_windowed_agg(paths, num_buckets=3)
        .to_pandas().sort_values(["user_id", "window_start"]).reset_index(drop=True)
    )
    assert not got.duplicated(["user_id", "window_start"]).any()

    ev = _read(f"{SF}/events.parquet", ["event_id", "ts", "user_id", "value"])
    want = (
        windowed_agg(ev).to_pandas()
        .sort_values(["user_id", "window_start"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got, want[["user_id", "window_start", "n", "min_value", "max_value"]],
        check_dtype=False,
    )


def test_quantiles_adversarial_distributions():
    """Exact quantiles across nasty value distributions: heavy
    duplicates, constant groups, tiny groups, mixed magnitudes,
    negatives — all against the numpy order statistic."""
    from osm2geojson_ray.stages.quantiles import grouped_quantiles

    rng = np.random.default_rng(123)
    cases = {
        "dupes": np.repeat(rng.normal(0, 1, 40), 50),
        "constant": np.full(777, 3.5),
        "tiny": np.array([2.0, -1.0, 7.5]),
        "mixed_mag": np.concatenate([rng.uniform(1e-9, 1e-6, 300), rng.uniform(1e6, 1e9, 300)]),
        "negative": -np.abs(rng.gamma(2, 10, 500)),
    }
    g = np.concatenate([[k] * len(v) for k, v in cases.items()])
    v = np.concatenate(list(cases.values()))
    perm = rng.permutation(len(v))
    t = pa.table({"g": pa.array(g[perm]), "value": pa.array(v[perm])})
    got = grouped_quantiles(
        rd.from_arrow(t), "value", "g", qs=(0.25, 0.5, 0.99), gather_cap=64, bins=32
    ).to_pandas()
    for _, row in got.iterrows():
        assert row["value"] == _disc_quantile(cases[row["g"]], row["q"]), row


def test_asof_salted_random_log():
    """Salted vs unsalted as-of parity on a seeded random event log with
    few users (forces many buckets per user and cross-bucket carries)."""
    from osm2geojson_ray.stages.events import asof_join, asof_join_salted

    rng = np.random.default_rng(9)
    n = 4000
    ts = (np.sort(rng.integers(0, 60 * 24 * 3600, n)) * 1_000_000).astype("int64")
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "ts": pa.array(ts.view("datetime64[us]"), pa.timestamp("us")),
            "user_id": pa.array(rng.integers(0, 5, n), pa.int64()),
            "event_type": pa.array(
                np.array(["purchase", "view", "click"])[rng.integers(0, 3, n)]
            ),
        }
    )
    ds = rd.from_arrow(t)
    a = asof_join(ds, num_parts=8).to_pandas().sort_values("event_id").reset_index(drop=True)
    b = (
        asof_join_salted(ds, bucket_hours=4, num_parts=8)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    a["matched_event_id"] = a["matched_event_id"].astype("float64")
    b["matched_event_id"] = b["matched_event_id"].astype("float64")
    pd.testing.assert_frame_equal(a, b)


def test_pivot_and_lag_match_pandas():
    from osm2geojson_ray.stages.events import pivot_event_counts, value_lag_delta

    df = _events_df()
    ev = _read(f"{SF}/events.parquet", ["user_id", "event_type"])
    got = pivot_event_counts(ev, num_parts=8).to_pandas().sort_values("user_id").reset_index(drop=True)
    ref = df.pivot_table(index="user_id", columns="event_type", values="event_id",
                         aggfunc="count", fill_value=0)
    for et in ["click", "error", "purchase", "signup", "view"]:
        want = ref[et] if et in ref else 0
        assert (got.set_index("user_id")[f"n_{et}"] == want).all(), et

    ev2 = _read(f"{SF}/events.parquet", ["event_id", "ts", "user_id", "value"])
    got2 = value_lag_delta(ev2, num_parts=8).to_pandas().sort_values("event_id").reset_index(drop=True)
    d2 = df.sort_values(["user_id", "ts", "event_id"]).copy()
    d2["value_delta"] = d2["value"] - d2.groupby("user_id")["value"].shift()
    want2 = d2.sort_values("event_id").reset_index(drop=True)
    assert got2.value_delta.isna().sum() == want2.value_delta.isna().sum() > 0
    m = got2.value_delta.notna()
    assert np.array_equal(got2.value_delta[m].to_numpy(), want2.value_delta[m].to_numpy())


def test_band_join_domain_guard():
    """|value| >= 2**52 * delta must raise loudly (float bucket ids lose
    the ±1-replication guarantee there) instead of silently dropping
    matches (ADVICE r3)."""
    import pytest

    from osm2geojson_ray.stages.events import band_join_count

    t = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "value": pa.array([2.0**53, 0.5], pa.float64()),
            "event_type": pa.array(["purchase", "click"]),
        }
    )
    with pytest.raises(Exception) as ei:
        band_join_count(rd.from_arrow(t), delta=0.5, num_parts=2).take_all()
    assert "2**52" in str(ei.value)


def test_asof_join_tie_winner_deterministic():
    """Several right events sharing (user_id, matched_ts): the winner is
    the HIGHEST matched_event_id, on every run/partitioning (ADVICE r3)."""
    from osm2geojson_ray.stages.events import asof_join

    ts = pd.Timestamp("2024-01-01 12:00:00")
    rows = [
        {"event_id": 100, "ts": ts, "user_id": 7, "event_type": "purchase"},
        # three tied views strictly before/at the purchase ts
        {"event_id": 11, "ts": ts, "user_id": 7, "event_type": "view"},
        {"event_id": 13, "ts": ts, "user_id": 7, "event_type": "view"},
        {"event_id": 12, "ts": ts, "user_id": 7, "event_type": "view"},
    ]
    t = pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False)
    for parts in (1, 2, 4):
        got = asof_join(rd.from_arrow(t), num_parts=parts).to_pandas()
        assert list(got.matched_event_id.astype("int64")) == [13]


def test_ivf_index_search_empty_shards_schema(tmp_path):
    """No shard paths → empty dataset with the documented RESULT schema
    (query_id, neighbor_id, rnk), not the internal probe schema (ADVICE r3)."""
    import shutil

    from osm2geojson_ray.stages.similarity import (
        ivf_index_build, ivf_index_search, select_queries_batch,
    )

    emb = _read(f"{SF}/embeddings.parquet", ["vec_id", "embedding"])
    idx = str(tmp_path / "ivf_empty")
    ivf_index_build(emb, idx, n_iters=2)
    shutil.rmtree(f"{idx}/lists")
    q = emb.map_batches(lambda t: select_queries_batch(t, 10), batch_format="pyarrow")
    out = ivf_index_search(idx, q, k=5, nprobe=2)
    # Dataset.schema() is what downstream select_columns consults
    # (Ray's to_pandas() drops column names entirely for 0-row datasets)
    assert out.schema().names == ["query_id", "neighbor_id", "rnk"]
    assert out.count() == 0
    assert len(out.select_columns(["query_id", "rnk"]).take_all()) == 0
