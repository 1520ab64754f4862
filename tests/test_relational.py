"""Relational pipelines (stages/relational.py) and fuzzy-dedup
clustering (stages/dedup.dedup_clusters): engine results vs in-memory
pandas/python references on the sf0.001 driver tables."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data as rd

SF = "/root/testdata/sf0.001"


def _read(path, cols):
    sch = pq.read_schema(path).remove_metadata()
    sch = pa.schema([sch.field(c) for c in cols])
    return rd.read_parquet(path, columns=cols, schema=sch)


def test_order_revenue_matches_pandas():
    from osm2geojson_ray.stages.relational import order_revenue

    li = _read(f"{SF}/lineitem.parquet", ["l_orderkey", "l_extendedprice", "l_discount"])
    got = order_revenue(li, num_parts=8).to_pandas().sort_values("o_orderkey").reset_index(drop=True)

    df = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    cents = np.floor(df.l_extendedprice * 100 + 0.5).astype(np.int64)
    dpct = np.floor(df.l_discount * 100 + 0.5).astype(np.int64)
    df["revenue_c"] = cents * (100 - dpct)
    ref = (
        df.groupby("l_orderkey")["revenue_c"].sum().reset_index()
        .rename(columns={"l_orderkey": "o_orderkey"})
        .sort_values("o_orderkey").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, ref, check_dtype=False)


def test_orders_revenue_topn_matches_pandas():
    from osm2geojson_ray.stages.relational import orders_revenue_topn

    li = _read(f"{SF}/lineitem.parquet", ["l_orderkey", "l_extendedprice", "l_discount"])
    orders = _read(f"{SF}/orders.parquet", ["o_orderkey", "o_custkey", "o_orderdate"])
    cust = _read(f"{SF}/customer.parquet", ["c_custkey", "c_mktsegment"])
    got = orders_revenue_topn(li, orders, cust, top_n=5, num_parts=8).to_pandas()
    got = got.sort_values(["revenue_c", "o_orderkey"], ascending=[False, True]).reset_index(drop=True)

    ldf = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    cents = np.floor(ldf.l_extendedprice * 100 + 0.5).astype(np.int64)
    dpct = np.floor(ldf.l_discount * 100 + 0.5).astype(np.int64)
    ldf["revenue_c"] = cents * (100 - dpct)
    rev = ldf.groupby("l_orderkey")["revenue_c"].sum().reset_index()
    odf = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    odf = odf[odf.o_orderdate < pd.Timestamp("1998-01-01")]
    cdf = pq.read_table(f"{SF}/customer.parquet").to_pandas()
    cdf = cdf[cdf.c_mktsegment == "BUILDING"]
    m = rev.merge(odf, left_on="l_orderkey", right_on="o_orderkey")
    m = m[m.o_custkey.isin(set(cdf.c_custkey))]
    ref = (
        m.sort_values(["revenue_c", "o_orderkey"], ascending=[False, True])
        .head(5)[["o_orderkey", "o_orderdate", "revenue_c"]]
        .reset_index(drop=True)
    )
    assert len(got) == 5
    pd.testing.assert_frame_equal(got, ref, check_dtype=False)


def test_customer_enrich_broadcast():
    from osm2geojson_ray.stages.relational import customer_enrich

    cust = _read(f"{SF}/customer.parquet", ["c_custkey", "c_name", "c_nationkey", "c_mktsegment"])
    nation = pq.read_table(f"{SF}/nation.parquet")
    region = pq.read_table(f"{SF}/region.parquet")
    got = customer_enrich(cust, nation, region).to_pandas().sort_values("c_custkey").reset_index(drop=True)

    cdf = pq.read_table(f"{SF}/customer.parquet").to_pandas()
    ndf = nation.to_pandas()
    rdf = region.to_pandas()
    ref = (
        cdf.merge(ndf, left_on="c_nationkey", right_on="n_nationkey")
        .merge(rdf, left_on="n_regionkey", right_on="r_regionkey")
        [["c_custkey", "c_name", "c_mktsegment", "n_name", "r_name"]]
        .sort_values("c_custkey").reset_index(drop=True)
    )
    assert len(got) == len(cdf)  # every customer has a nation
    pd.testing.assert_frame_equal(got, ref, check_dtype=False)


@pytest.fixture()
def clustered_docs():
    """Docs engineered so MinHash-LSH links (0,1,2) and (10,11) — exact
    duplicate texts share every band — and leaves the rest singletons."""
    dup_a = "the quick brown fox jumps over the lazy dog again and again"
    dup_b = "a completely different duplicated sentence used twice here ok"
    rows = {0: dup_a, 1: dup_a, 2: dup_a, 10: dup_b, 11: dup_b}
    for i in range(20, 30):
        rows[i] = f"unique filler document number {i} with its own words {i * 7} {i * 13}"
    t = pa.table(
        {"doc_id": pa.array(list(rows), pa.int64()),
         "text": pa.array(list(rows.values()), pa.string())}
    )
    return rd.from_arrow(t).repartition(4)


def test_dedup_clusters_components(clustered_docs):
    from osm2geojson_ray.stages.dedup import dedup_clusters

    got = dedup_clusters(clustered_docs, num_parts=4).to_pandas()
    lab = dict(zip(got.doc_id, got.cluster_id))
    assert lab[0] == lab[1] == lab[2] == 0
    assert lab[10] == lab[11] == 10
    for i in range(20, 30):
        assert lab[i] == i  # singletons keep their own id
    assert len(got) == 15


def test_dedup_clusters_chain_converges():
    """A chain a-b, b-c must collapse to one cluster even though a and c
    share no pair — exercises multi-round propagation.  Pairs are forced
    via texts where (a,b) and (b,c) are near-dups through shared bands:
    easiest deterministic construction is exact dup pairs bridged by a
    shared middle doc appearing in both bands groups; use three docs with
    IDENTICAL text (complete graph) plus a disjoint pair, then check the
    engine agrees with a python union-find on the engine's OWN pair set."""
    from osm2geojson_ray.stages.dedup import dedup_clusters, dedup_minhash_pairs

    texts = {
        1: "alpha beta gamma delta epsilon zeta eta theta",
        2: "alpha beta gamma delta epsilon zeta eta theta",
        3: "alpha beta gamma delta epsilon zeta eta theta",
        7: "один два три четыре пять шесть семь восемь",
        8: "один два три четыре пять шесть семь восемь",
        9: "totally unrelated standalone document goes here",
    }
    docs = rd.from_arrow(
        pa.table({"doc_id": pa.array(list(texts), pa.int64()),
                  "text": pa.array(list(texts.values()), pa.string())})
    ).repartition(3)

    pairs = dedup_minhash_pairs(docs, num_parts=4).to_pandas()
    parent = {d: d for d in texts}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs.doc_a, pairs.doc_b):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    ref = {d: find(d) for d in texts}

    got = dedup_clusters(docs, num_parts=4).to_pandas()
    lab = dict(zip(got.doc_id, got.cluster_id))
    assert lab == ref


def test_semi_anti_join_modes():
    from osm2geojson_ray.functions.joins import join_on_unique

    many = rd.from_arrow(
        pa.table({"k": pa.array([1, 2, 3, 4], pa.int64()),
                  "v": pa.array(["a", "b", "c", "d"])})
    )
    uniq = rd.from_arrow(pa.table({"k": pa.array([2, 4, 4], pa.int64())}))
    ms = pa.schema([("k", pa.int64()), ("v", pa.string())])
    us = pa.schema([("k", pa.int64())])
    semi = join_on_unique(many, uniq, "k", ms, us, how="semi",
                          num_parts=4, on_duplicate="first").to_pandas()
    anti = join_on_unique(many, uniq, "k", ms, us, how="anti",
                          num_parts=4, on_duplicate="first").to_pandas()
    assert sorted(semi.k) == [2, 4] and sorted(anti.k) == [1, 3]
    assert list(semi.columns) == ["k", "v"] == list(anti.columns)
    # 'any' (r4): keys-only existence filter, identical results with zero
    # digest work on the duplicated build keys
    semi_a = join_on_unique(many, uniq, "k", ms, us, how="semi",
                            num_parts=4, on_duplicate="any").to_pandas()
    anti_a = join_on_unique(many, uniq, "k", ms, us, how="anti",
                            num_parts=4, on_duplicate="any").to_pandas()
    assert sorted(semi_a.k) == [2, 4] and sorted(anti_a.k) == [1, 3]


def test_orders_without_lineitems():
    from osm2geojson_ray.stages.relational import orders_without_lineitems

    orders = _read(f"{SF}/orders.parquet", ["o_orderkey", "o_orderstatus"])
    li = _read(f"{SF}/lineitem.parquet", ["l_orderkey"])
    got = orders_without_lineitems(orders, li, num_parts=8).to_pandas()

    odf = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    lset = set(pq.read_table(f"{SF}/lineitem.parquet").to_pandas().l_orderkey)
    ref = odf[~odf.o_orderkey.isin(lset)]
    assert sorted(got.o_orderkey) == sorted(ref.o_orderkey)
    assert len(got) > 0


def test_connected_components_long_chain_frontier_decay():
    """The public connected_components operator on an explicit 64-vertex
    chain (diameter 63 — adversarial for label propagation): correct
    min-labels, and the recorded frontier decays monotonically after the
    initial flood (the co-partitioned delta-round contract)."""
    from osm2geojson_ray.stages.dedup import connected_components

    n = 64
    pairs = rd.from_arrow(
        pa.table({"doc_a": pa.array(list(range(n - 1)), pa.int64()),
                  "doc_b": pa.array(list(range(1, n)), pa.int64())})
    ).repartition(4)
    verts = rd.from_arrow(
        pa.table({"doc_id": pa.array(list(range(n)), pa.int64())})
    ).repartition(4)

    stats: list = []
    got = connected_components(
        pairs, verts, num_parts=4, max_iters=200, round_stats=stats
    ).to_pandas()
    lab = dict(zip(got.doc_id, got.cluster_id))
    assert lab == {i: 0 for i in range(n)}
    # min-label on a chain: vertex i settles after i rounds, so the
    # frontier (changed-count) shrinks by ~1 per round and ends at 0
    assert stats[-1] == 0
    assert all(a >= b for a, b in zip(stats, stats[1:]))


def test_connected_components_nonconvergence_contract():
    """max_iters below the chain diameter must not return partial labels
    silently: default raises; on_nonconverge='warn' warns and the
    round_stats tail stays nonzero (the programmatic partial marker)."""
    import warnings

    import pytest

    from osm2geojson_ray.stages.dedup import connected_components

    n = 32  # chain diameter 31 >> max_iters=3
    pairs = rd.from_arrow(
        pa.table({"doc_a": pa.array(list(range(n - 1)), pa.int64()),
                  "doc_b": pa.array(list(range(1, n)), pa.int64())})
    ).repartition(2)
    verts = rd.from_arrow(
        pa.table({"doc_id": pa.array(list(range(n)), pa.int64())})
    ).repartition(2)

    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, verts, num_parts=2, max_iters=3)

    stats: list = []
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        got = connected_components(
            pairs, verts, num_parts=2, max_iters=3,
            round_stats=stats, on_nonconverge="warn",
        ).to_pandas()
    assert any(issubclass(w.category, RuntimeWarning) for w in rec)
    assert stats[-1] > 0  # partial marker
    assert len(got) == n  # partial labels are still returned in warn mode

    with pytest.raises(ValueError):
        connected_components(pairs, verts, num_parts=2, on_nonconverge="explode")


def test_connected_components_forest_and_singletons():
    from osm2geojson_ray.stages.dedup import connected_components

    pairs = rd.from_arrow(
        pa.table({"doc_a": pa.array([5, 6, 20, 21], pa.int64()),
                  "doc_b": pa.array([6, 7, 21, 22], pa.int64())})
    )
    verts = rd.from_arrow(
        pa.table({"doc_id": pa.array([5, 6, 7, 20, 21, 22, 99], pa.int64())})
    )
    got = connected_components(pairs, verts, num_parts=3).to_pandas()
    lab = dict(zip(got.doc_id, got.cluster_id))
    assert lab == {5: 5, 6: 5, 7: 5, 20: 20, 21: 20, 22: 20, 99: 99}


def test_orders_topn_broadcast_exchange_parity():
    """semi_mode='broadcast' (keys ray.put once, fused into exchange 1)
    must be row-identical to semi_mode='exchange' (re-key all-to-all)."""
    import ray

    from osm2geojson_ray.pipelines.training import _read_clean
    from osm2geojson_ray.stages import relational as R

    sf = "/root/testdata/sf0.001"
    li = _read_clean(f"{sf}/lineitem.parquet",
                     columns=["l_orderkey", "l_extendedprice", "l_discount"])
    orders = _read_clean(f"{sf}/orders.parquet",
                         columns=["o_orderkey", "o_custkey", "o_orderdate"])
    cust = _read_clean(f"{sf}/customer.parquet",
                       columns=["c_custkey", "c_mktsegment"])
    b = R.orders_revenue_topn(li, orders, cust, semi_mode="broadcast").to_pandas()
    e = R.orders_revenue_topn(li, orders, cust, semi_mode="exchange").to_pandas()
    assert len(b) == len(e) > 0
    bs = b.sort_values("o_orderkey").reset_index(drop=True)
    es = e.sort_values("o_orderkey").reset_index(drop=True)
    assert bs.equals(es)

    # ADVICE r4: explicit broadcast on an over-gate key set must refuse
    # (bounded driver pull), and auto must route it to the exchange path
    # and still produce the same rows
    with pytest.raises(ValueError, match="broadcast_max"):
        R.orders_revenue_topn(li, orders, cust, semi_mode="broadcast", broadcast_max=3)
    a = R.orders_revenue_topn(li, orders, cust, semi_mode="auto", broadcast_max=3).to_pandas()
    assert a.sort_values("o_orderkey").reset_index(drop=True).equals(es)


def test_empty_map_output_blocks_survive():
    """Regression: a map_batches task whose output has 0 rows emits a
    ZERO-COLUMN empty block (no schema).  Both to_arrow_refs consumers
    that read columns from upstream blocks must tolerate them: the
    orders_topn broadcast key pull (relational.py) and the
    connected_components one-time hash exchange (dedup.py).  Surfaced at
    sf0.001 where a 16-block customer read leaves some blocks with no
    BUILDING rows at all."""
    from osm2geojson_ray.stages import relational as R
    from osm2geojson_ray.stages.dedup import connected_components

    # customer: 3 explicit blocks, the middle one has NO BUILDING rows →
    # its cust_filter output is empty → zero-column block downstream
    cust = rd.from_arrow([
        pa.table({"c_custkey": pa.array([0, 1], pa.int64()),
                  "c_mktsegment": ["BUILDING", "FURNITURE"]}),
        pa.table({"c_custkey": pa.array([2, 3], pa.int64()),
                  "c_mktsegment": ["MACHINERY", "FURNITURE"]}),
        pa.table({"c_custkey": pa.array([4], pa.int64()),
                  "c_mktsegment": ["BUILDING"]}),
    ])
    orders = rd.from_arrow(pa.table({
        "o_orderkey": pa.array([10, 11, 12], pa.int64()),
        "o_custkey": pa.array([0, 2, 4], pa.int64()),
        "o_orderdate": pa.array(
            [np.datetime64("1995-01-01", "us")] * 3, pa.timestamp("us")),
    }))
    li = rd.from_arrow(pa.table({
        "l_orderkey": pa.array([10, 11, 12], pa.int64()),
        "l_extendedprice": pa.array([100.0, 200.0, 300.0]),
        "l_discount": pa.array([0.0, 0.0, 0.10]),
    }))
    got = R.orders_revenue_topn(
        li, orders, cust, semi_mode="broadcast", num_parts=4
    ).to_pandas()
    # customers 0 and 4 are BUILDING → orders 10 and 12 qualify
    assert sorted(got.o_orderkey.tolist()) == [10, 12]

    # connected_components: pairs dataset where one input block filters
    # to zero rows → exchange_once must normalize the schemaless block
    pairs_raw = rd.from_arrow([
        pa.table({"doc_a": pa.array([1, 2], pa.int64()),
                  "doc_b": pa.array([2, 3], pa.int64())}),
        pa.table({"doc_a": pa.array([100], pa.int64()),
                  "doc_b": pa.array([100], pa.int64())}),
    ])
    pairs = pairs_raw.map_batches(
        lambda t: t.filter(pa.compute.less(t.column("doc_a"), 50)),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    verts = rd.from_arrow(pa.table({"doc_id": pa.array([1, 2, 3, 7], pa.int64())}))
    labels = connected_components(pairs, verts, num_parts=4).to_pandas()
    ref = {1: 1, 2: 1, 3: 1, 7: 7}
    assert dict(zip(labels.doc_id, labels.cluster_id)) == ref


def test_connected_components_converges_at_exactly_max_iters():
    # review r5: a graph whose diameter equals max_iters converges in the
    # final allowed round; the extra all-quiet confirmation round must
    # return the (complete) labels instead of raising a false
    # non-convergence error.
    from osm2geojson_ray.stages.dedup import connected_components

    n = 6  # chain 0-1-2-3-4-5, diameter 5
    pairs = rd.from_arrow(pa.table({
        "doc_a": pa.array(list(range(n - 1)), pa.int64()),
        "doc_b": pa.array(list(range(1, n)), pa.int64()),
    }))
    verts = rd.from_arrow(pa.table({"doc_id": pa.array(list(range(n)), pa.int64())}))
    stats: list = []
    labels = connected_components(
        pairs, verts, num_parts=4, max_iters=5, round_stats=stats
    ).to_pandas()
    assert set(labels.cluster_id) == {0}
    assert stats[-1] == 0  # the confirmation round was quiet

    # a genuinely-partial run still raises
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, verts, num_parts=4, max_iters=2)

    # invalid on_nonconverge rejected before any exchange work
    with pytest.raises(ValueError, match="on_nonconverge"):
        connected_components(pairs, verts, num_parts=4, on_nonconverge="explode")
