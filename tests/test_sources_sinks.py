"""Raw OSM XML file source (S1) and GeoJSON-lines sink (K2)."""

import bz2
import gzip
import json
import os

import ray.data as rd

from osm2geojson_ray.sources.osm_xml import read_osm_xml
from osm2geojson_ray.sources.sinks import feature_to_geojson, write_geojson

XML = """<?xml version="1.0"?>
<osm version="0.6">
  <node id="1" lat="52.5" lon="13.4">
    <tag k="name" v="A"/>
    <tag k="amenity" v="pub"/>
  </node>
  <way id="2">
    <nd ref="1"/>
    <nd ref="3"/>
  </way>
</osm>
"""


def test_read_osm_xml_plain_gz_bz2(tmp_path):
    p1 = tmp_path / "a.osm"
    p1.write_text(XML)
    p2 = tmp_path / "b.osm.gz"
    p2.write_bytes(gzip.compress(XML.encode()))
    p3 = tmp_path / "c.osm.bz2"
    p3.write_bytes(bz2.compress(XML.encode()))
    ds = read_osm_xml([str(p1), str(p2), str(p3)])
    rows = ds.take_all()
    assert len(rows) == 6  # 2 elements × 3 files
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["xml"])
    assert set(by_doc) == {"a.osm", "b.osm.gz", "c.osm.bz2"}
    for blobs in by_doc.values():
        assert blobs[0].startswith("<node") and blobs[1].startswith("<way")


def _feat(fid, osm_type, gtype, xs, ys, ro=(0,), po=(0,), **kw):
    return {
        "feature_id": fid, "osm_type": osm_type, "osm_id": 1, "title": "T",
        "geom_type": gtype, "xs": list(xs), "ys": list(ys),
        "ring_offsets": list(ro), "poly_offsets": list(po),
        "categories": kw.get("categories", ["building"]),
        "address": kw.get("address", []),
        "names": kw.get("names", []),
        "links": kw.get("links", []),
    }


def test_feature_to_geojson_shapes():
    pt = feature_to_geojson(_feat("osmnode/1", "poi", "Point", [13.4], [52.5]))
    assert pt["geometry"] == {"type": "Point", "coordinates": [13.4, 52.5]}
    assert pt["categories"] == {"osm": ["building"]}

    ls = feature_to_geojson(_feat("osmway/2", "way", "LineString", [0, 1], [0, 1]))
    assert ls["geometry"]["coordinates"] == [[0, 0], [1, 1]]

    poly = feature_to_geojson(
        _feat("osmway/3", "way", "Polygon", [0, 1, 1, 0, 0, 0.2, 0.8, 0.5, 0.2],
              [0, 0, 1, 1, 0, 0.2, 0.2, 0.8, 0.2], ro=(0, 5), po=(0,))
    )
    coords = poly["geometry"]["coordinates"]
    assert len(coords) == 2 and coords[0][0] == [0, 0] and len(coords[1]) == 4

    mp = feature_to_geojson(
        _feat("osmrelation/4", "relation", "MultiPolygon",
              [0, 1, 0, 0, 5, 6, 5, 5], [0, 0, 1, 0, 5, 5, 6, 5], ro=(0, 4), po=(0, 1))
    )
    assert len(mp["geometry"]["coordinates"]) == 2

    withextras = feature_to_geojson(
        _feat("osmnode/5", "poi", "Point", [1], [2],
              address=[{"key": "street", "value": "Main"}],
              names=[{"lang": "de", "values": ["Eins"]}],
              links=["http://x"])
    )
    assert withextras["address"] == {"street": "Main"}
    assert withextras["name"] == {"de": ["Eins"]}
    assert withextras["links"] == [{"href": "http://x"}]


def test_write_geojson_split(tmp_path):
    import pyarrow as pa

    from osm2geojson_ray.schema import FEATURES

    feats = rd.from_arrow(
        pa.Table.from_pylist(
            [
                _feat("osmnode/1", "poi", "Point", [1.0], [2.0]),
                _feat("osmway/2", "way", "LineString", [0.0, 1.0], [0.0, 1.0]),
            ],
            schema=FEATURES,
        )
    )
    paths = write_geojson(feats, str(tmp_path / "out"))
    poi_files = os.listdir(paths["osm-pois"])
    assert poi_files
    lines = []
    for f in poi_files:
        with open(os.path.join(paths["osm-pois"], f)) as fh:
            lines.extend(l for l in fh if l.strip())
    objs = [json.loads(l) for l in lines]
    assert [o["id"] for o in objs] == ["osmnode/1"]
    assert objs[0]["geometry"]["type"] == "Point"


def test_read_osm_xml_ranged_exactly_once(tmp_path):
    """Byte-range reader: every element parsed exactly once regardless of
    chunk boundaries (elements straddle ranges at 4 KiB chunks)."""
    from osm2geojson_ray import synth
    from osm2geojson_ray.sources.documents import chunk_span_regex

    lines: list[str] = []
    for block in synth.iter_element_blocks(60):
        lines.extend(block)
    text = "junk header\n" + "\n".join(lines) + "\ntrailing junk\n"
    expected = chunk_span_regex(text)
    p = tmp_path / "big.osm"
    p.write_text(text)
    ds = read_osm_xml(str(p), chunk_bytes=4096, overlap=1 << 16)
    rows = ds.take_all()
    got = sorted(r["xml"] for r in rows)
    assert got == sorted(expected)
    # parallel read really happened: multiple span_idx chunks
    assert len({r["span_idx"] for r in rows}) > 2


def test_read_osm_xml_streaming_bounded(tmp_path):
    """bz2/gz streaming reader yields the same element set with a small
    stream chunk (forces tail handling across decompressed chunks)."""
    from osm2geojson_ray import synth
    from osm2geojson_ray.sources.documents import chunk_span_regex

    lines: list[str] = []
    for block in synth.iter_element_blocks(40):
        lines.extend(block)
    text = "\n".join(lines)
    expected = sorted(chunk_span_regex(text))
    pb = tmp_path / "s.osm.bz2"
    pb.write_bytes(bz2.compress(text.encode()))
    pg = tmp_path / "s.osm.gz"
    pg.write_bytes(gzip.compress(text.encode()))
    for p in (pb, pg):
        rows = read_osm_xml(str(p), stream_chunk=2048).take_all()
        assert sorted(r["xml"] for r in rows) == expected
        assert len({r["span_idx"] for r in rows}) > 1  # streamed in blocks


def test_range_read_warns_on_oversized_element(tmp_path, caplog):
    """An element larger than the overlap window cannot be carved by any
    task; the reader must COUNT the drop loudly (ADVICE r2), not lose it
    silently."""
    import logging

    from osm2geojson_ray.sources.osm_xml import _range_read

    big = '<node id="1" lat="0" lon="0">' + "<tag/>" * 200 + "</node>"
    small = '<node id="2" lat="1" lon="1"/>'
    text = big + "\n" + small + "\n"
    p = tmp_path / "trunc.osm"
    p.write_text(text)
    # range covers the big element's start but overlap is too small for
    # its body to complete inside the task buffer
    with caplog.at_level(logging.WARNING, logger="osm2geojson_ray.sources.osm_xml"):
        (tbl,) = list(_range_read(str(p), 0, 40, 32, 0))
    assert tbl.num_rows == 0
    assert any("truncated element" in r.message for r in caplog.records)
    # a sufficient overlap carves it and stays quiet
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="osm2geojson_ray.sources.osm_xml"):
        (tbl2,) = list(_range_read(str(p), 0, 40, 1 << 16, 0))
    assert tbl2.num_rows == 1
    assert not caplog.records
