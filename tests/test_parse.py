"""Parser conformance tests, including the reference's own fixtures
(OsmJoinTest.java:15-32, OsmBlobIterableTest.java:14-21) ported verbatim."""

import pyarrow as pa
import pytest

from osm2geojson_ray.functions.regex import (
    ID_PATTERN,
    LAT_PATTERN,
    LON_PATTERN,
    unescape_xml,
)
from osm2geojson_ray.sources.documents import chunk_span_lines, chunk_span_regex
from osm2geojson_ray.stages import parse


def _els(xmls):
    return pa.table(
        {
            "doc_id": ["d"] * len(xmls),
            "span_idx": pa.array([0] * len(xmls), pa.int32()),
            "elem_idx": pa.array(list(range(len(xmls))), pa.int32()),
            "xml": xmls,
        }
    )


# --- OsmJoinTest.java sampleNodes data provider, ported ---------------------

SAMPLE_NODES = [
    (
        '<node id="25737250" lat="51.5121071" lon="-0.1130375" timestamp="2010-12-10T23:35:50Z" '
        'version="3" changeset="6613493" user="Welshie" uid="508"/>',
        51.5121071,
        -0.1130375,
    ),
    (
        '<node id="25737250" lat="-51.5121071" lon="-0.1130375" timestamp="2010-12-10T23:35:50Z" '
        'version="3" changeset="6613493" user="Welshie" uid="508"/>',
        -51.5121071,
        -0.1130375,
    ),
    (
        '<node id="25737250" lat="51.5121071" lon="0.1130375" timestamp="2010-12-10T23:35:50Z" '
        'version="3" changeset="6613493" user="Welshie" uid="508"/>',
        51.5121071,
        0.1130375,
    ),
]


@pytest.mark.parametrize("xml,lat,lon", SAMPLE_NODES)
def test_latlon_regex_reference_fixture(xml, lat, lon):
    assert float(LAT_PATTERN.search(xml).group(1)) == lat
    assert float(LON_PATTERN.search(xml).group(1)) == lon
    assert int(ID_PATTERN.search(xml).group(1)) == 25737250


def test_parse_node_basic():
    t = parse.parse_nodes_batch(_els([SAMPLE_NODES[0][0]]))
    row = t.to_pylist()[0]
    assert row == {"node_id": 25737250, "lon": -0.1130375, "lat": 51.5121071, "tags": []}


def test_parse_node_tags_unescaped_and_last_wins():
    xml = (
        '<node id="1" lat="52.5" lon="13.4">'
        '<tag k="name" v="A &amp; B"/><tag k="x" v="1"/><tag k="name" v="C &lt;3"/></node>'
    )
    row = parse.parse_nodes_batch(_els([xml])).to_pylist()[0]
    # first-occurrence order, last value wins, XML-unescaped (OsmJoin.java:167-171)
    assert row["tags"] == [{"key": "name", "value": "C <3"}, {"key": "x", "value": "1"}]


def test_parse_node_without_coords_rejected():
    xml = '<node id="5" timestamp="t"/>'
    assert parse.parse_nodes_batch(_els([xml])).num_rows == 0
    rej = parse.rejects_batch(_els([xml])).to_pylist()
    assert rej[0]["reason"] == "no-coordinates" and rej[0]["kind"] == "node"


def test_way_tags_not_unescaped():
    # the :198 quirk — way tag values keep raw entities
    xml = '<way id="9"><nd ref="1"/><tag k="name" v="A &amp; B"/></way>'
    row = parse.parse_ways_batch(_els([xml])).to_pylist()[0]
    assert row["tags"] == [{"key": "name", "value": "A &amp; B"}]
    assert row["ns"] == [1]


def test_relation_member_filtering():
    xml = (
        '<relation id="7">'
        '<member type="way" ref="10" role="outer"/>'
        '<member type="NODE" ref="11" role=""/>'
        '<member type="relation" ref="12" role="x"/>'
        '<member type="bogus" ref="13" role="y"/>'
        '<tag k="type" v="multipolygon"/></relation>'
    )
    row = parse.parse_relations_batch(_els([xml])).to_pylist()[0]
    assert [m["id"] for m in row["members"]] == [10, 11]
    assert row["members"][1]["type"] == "NODE"  # type kept verbatim


def test_uid_trap_first_match_wins():
    # id= matches uid= too; Java find() takes the first occurrence
    xml = '<node uid="99" id="7" lat="1.5" lon="2.5"/>'
    row = parse.parse_nodes_batch(_els([xml])).to_pylist()[0]
    assert row["node_id"] == 99  # faithful: uid comes first → uid wins


def test_way_edges_pos():
    xml = '<way id="4"><nd ref="8"/><nd ref="9"/><nd ref="8"/></way>'
    ways = parse.parse_ways_batch(_els([xml]))
    edges = parse.way_edges_batch(ways).to_pylist()
    assert edges == [
        {"node_id": 8, "way_id": 4, "pos": 0},
        {"node_id": 9, "way_id": 4, "pos": 1},
        {"node_id": 8, "way_id": 4, "pos": 2},
    ]


# --- chunker (OsmBlobIterableTest.java:14-21 style) -------------------------

CHUNK_INPUT = """junk line
<node id="1" lat="1" lon="2"/>
more junk
<way id="2">
  <nd ref="1"/>
</way>
<relation id="3">
  <member type="node" ref="1" role=""/>
</relation>
trailing junk"""


def test_chunkers_agree_and_skip_junk():
    a = chunk_span_lines(CHUNK_INPUT)
    b = chunk_span_regex(CHUNK_INPUT)
    assert a == b
    assert len(a) == 3
    assert a[0].startswith("<node") and a[1].startswith("<way") and a[2].startswith("<relation")
    # continuation lines concatenated without newlines (reference appends raw lines)
    assert "\n" not in a[1]


def test_chunkers_agree_on_corpus(small_world):
    for spans in small_world["documents"].column("spans").to_pylist():
        for s in spans:
            if s["kind"] == "osm_xml":
                assert chunk_span_lines(s["text"]) == chunk_span_regex(s["text"])


def test_unescape_xml():
    assert unescape_xml("A &amp; B &lt;&gt; &quot;q&quot; &apos;a&apos; &#233; &#x41;") == (
        "A & B <> \"q\" 'a' é A"
    )
    assert unescape_xml("plain") == "plain"


def test_corpus_parse_counts(small_world):
    w = small_world
    n_nodes = w["nodes"].num_rows
    n_rej = w["rejects"].num_rows
    s = __import__("osm2geojson_ray.synth", fromlist=["world_sizes"]).world_sizes(120)
    # every id%97==0 node is a coordinate-less reject
    expected_rejects = s["n_nodes"] // 97
    assert n_rej == expected_rejects
    assert n_nodes == s["n_nodes"] - expected_rejects + 9 * s["n_mp"]
    assert w["ways"].num_rows == s["n_ways"] + 3 * s["n_mp"]
    assert w["relations"].num_rows == s["n_rels"]


def test_chunkers_agree_on_blank_line_inside_element():
    # ADVICE r1: a blank line inside an element must not leave a residual
    # newline in the regex chunker's blob
    text = '<node id="1" lat="1" lon="2">\n\n  <tag k="a" v="b"/>\n</node>'
    a = chunk_span_lines(text)
    b = chunk_span_regex(text)
    assert a == b
    assert "\n" not in b[0]
    # whitespace-only line variant
    text2 = '<way id="2">\n  \n  <nd ref="1"/>\n</way>'
    assert chunk_span_lines(text2) == chunk_span_regex(text2)


def test_kv_match_cannot_straddle_rows():
    # ADVICE r1: a malformed k= with no following v= must not pick up a
    # v= from the NEXT row in the batch (sentinel-crossing match)
    broken = '<node id="1" lat="1" lon="2"><tag k="broken"/></node>'
    victim = '<node id="2" lat="1" lon="2"><tag k="x" v="evil"/></node>'
    t = parse.parse_nodes_batch(_els([broken, victim]))
    rows = {r["node_id"]: r["tags"] for r in t.to_pylist()}
    assert rows[1] == []  # no garbage tag assembled across rows
    assert rows[2] == [{"key": "x", "value": "evil"}]


def test_poison_blob_rejected_not_fatal():
    # an id overflowing int64 makes the Arrow cast throw; the robust
    # wrapper must drop ONLY that row and rejects must report it
    poison = f'<node id="{10**25}" lat="1" lon="2"/>'
    good = '<node id="42" lat="1" lon="2"/>'
    batch = _els([good, poison, good])
    out = parse.robust(parse.parse_nodes_batch)(batch)
    assert out.column("node_id").to_pylist() == [42, 42]
    rej = parse.rejects_batch(batch).to_pylist()
    assert len(rej) == 1 and rej[0]["reason"] == "parse-exception"
    assert rej[0]["kind"] == "node"


def test_rejects_unchanged_without_poison(small_world):
    # exception probing must not alter rejects on a clean corpus
    rej = parse.rejects_batch(small_world["elements"]).to_pylist()
    assert all(r["reason"] in ("no-id", "no-coordinates", "unexpected-blob-type") for r in rej)
