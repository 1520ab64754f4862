"""Deterministic synthetic interleaved-document corpus (FIXTURES.md F1/F2/F5).

Generates the engine's primary input — a table
``documents(doc_id: string, spans: list<struct<kind, text, media_ref, offset>>)``
per BASELINE.json ``input_hint`` — whose ``kind='osm_xml'`` spans embed OSM
XML fragments in the exact formats the reference parsers tolerate
(OsmJoin.java:63-68,155-256; OsmBlobIterable.java:44-114): self-closing
one-line nodes, multi-line tagged elements, junk lines between elements,
XML entities in node tag values, attribute-order variety, coordinate-less
reject nodes, ways with missing node refs, closed ways, multipolygon
relations with stitchable outer ways and inner holes, node-only /
way-only relations (the J4/J6 inner-join drop cases), and member types
``relation`` (ignored per OsmJoin.java:245-246) and unknown (warn+skip).

Everything is a pure function of integer ids — no RNG, no external data —
so any scale regenerates bit-identically and the DuckDB oracle can parse
the same parquet bytes.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from .schema import DOCUMENTS

# NB: must not be named like the package — a /tmp/osm2geojson_ray/ dir
# would shadow the real package as a namespace package for scripts run
# from /tmp.
SYNTH_ROOT = "/tmp/osmray_synth/v2"  # bump on any generator change: the
# cache key is only (version, n_docs)

WAY_ID_BASE = 1_000_000
# ring ids live far above every regular id range so the id spaces can
# never collide at any corpus size reachable in this sandbox (v1 placed
# ring ways at 1.5M — regular way ids overlapped them past 500k docs,
# i.e. duplicate way_ids in the corpus, caught by the join uniqueness
# guard at the 600k-doc scaling corpus)
RING_WAY_ID_BASE = 1_000_000_000
REL_ID_BASE = 2_000_000
RING_NODE_ID_BASE = 2_000_000_000

_JUNK = [
    '<?xml version="1.0" encoding="UTF-8"?>',
    '<osm version="0.6" generator="synth">',
    '  <bounds minlat="-85" minlon="-180" maxlat="85" maxlon="180"/>',
    "</osm>",
]

_WORDS = (
    "the quick brown fox jumps over a lazy dog near the old market square "
    "while rain falls on cobbled streets and trams pass by the station"
).split()


def micro_to_str(v: int) -> str:
    """Exact decimal string for a micro-degree int (no float round-trip)."""
    sign = "-" if v < 0 else ""
    a = abs(v)
    return f"{sign}{a // 1_000_000}.{a % 1_000_000:06d}"


def node_lon_micro(node_id: int) -> int:
    return (node_id * 2654435761) % 360_000_000 - 180_000_000


def node_lat_micro(node_id: int) -> int:
    return (node_id * 40503 + 7_654_321) % 170_000_000 - 85_000_000


def _tag(k: str, v: str, indent: str = "    ") -> str:
    return f'{indent}<tag k="{k}" v="{v}"/>'


def render_node(node_id: int) -> list[str]:
    """One node element as XML lines.  id%97==0 → coordinate-less reject."""
    if node_id % 97 == 0:
        # reject: no lat/lon (OsmJoin.java:176-179)
        return [f'  <node id="{node_id}" timestamp="2012-01-01T00:00:00Z" version="1" uid="77"/>']
    lon = micro_to_str(node_lon_micro(node_id))
    lat = micro_to_str(node_lat_micro(node_id))
    m = node_id % 10
    # attribute-order variety: lat-first vs lon-first, trailing attrs
    if node_id % 3 == 0:
        attrs = f'id="{node_id}" lat="{lat}" lon="{lon}" version="2" changeset="123" user="synth" uid="508"'
    elif node_id % 3 == 1:
        attrs = f'id="{node_id}" lon="{lon}" lat="{lat}" timestamp="2010-12-10T23:35:50Z"'
    else:
        attrs = f'id="{node_id}" lat="{lat}" lon="{lon}"'
    if m < 7:
        return [f"  <node {attrs}/>"]
    lines = [f"  <node {attrs}>"]
    if m == 7:
        lines.append(_tag("name", f"Caf&#233; Seven &amp; Co {node_id}"))
        lines.append(_tag("amenity", "restaurant"))
        lines.append(_tag("cuisine", "italian"))
    elif m == 8:
        lines.append(_tag("name", f"Station {node_id}"))
        lines.append(_tag("railway", "station"))
        lines.append(_tag("addr:street", "Main St"))
        lines.append(_tag("addr:city", "Springfield"))
        lines.append(_tag("name:de", f"Bahnhof {node_id}"))
    else:
        lines.append(_tag("name", f"Stop &lt;{node_id}&gt;"))
        lines.append(_tag("public_transport", "stop_position"))
        lines.append(_tag("bus", "yes"))
        lines.append(_tag("website", f"http://example.com/{node_id}"))
    lines.append("  </node>")
    return lines


def way_node_refs(w: int, n_nodes: int) -> list[int]:
    length = 3 + (w % 5)
    start = (w * 13) % n_nodes
    ns = [((start + i) % n_nodes) + 1 for i in range(length)]
    if w % 11 == 3:
        ns[1] = n_nodes + 1000 + w  # missing ref (→ missingNodeRefs)
    if w % 5 == 0:
        ns.append(ns[0])  # closed ring → Polygon (OsmPostProcessor.java:200-205)
    return ns


def render_way(way_id: int, ns: list[int], tags: list[tuple[str, str]]) -> list[str]:
    lines = [f'  <way id="{way_id}" version="3" changeset="99" uid="508">']
    for n in ns:
        lines.append(f'    <nd ref="{n}"/>')
    for k, v in tags:
        lines.append(_tag(k, v))
    lines.append("  </way>")
    return lines


def way_tags(w: int, way_id: int) -> list[tuple[str, str]]:
    m = w % 4
    if m == 0:
        return [("name", f"Street {way_id}"), ("highway", "residential")]
    if m == 1:
        return [("name", f"Building {way_id}"), ("building", "yes")]
    if m == 2:
        return [("highway", "service")]  # unnamed → dropped by feature filter
    return [("name", f"Park {way_id}"), ("leisure", "park"), ("website", f"http://osm.example/{way_id}")]


# --- multipolygon worlds -----------------------------------------------------
# mp index k gets 9 dedicated ring nodes (8 corners + 1 label node) and
# 3 dedicated ways (2 stitchable outer halves + 1 closed inner ring).


def mp_ring_node_ids(k: int) -> list[int]:
    base = RING_NODE_ID_BASE + 16 * k
    return [base + i for i in range(9)]


def mp_center_micro(k: int) -> tuple[int, int]:
    cx = (-170 + (k * 7) % 340) * 1_000_000
    cy = (-80 + (k * 11) % 160) * 1_000_000
    return cx, cy


def mp_node_coords_micro(k: int) -> list[tuple[int, int]]:
    cx, cy = mp_center_micro(k)
    o = 10_000  # outer half-size: 0.01 deg
    i = 4_000   # inner half-size
    return [
        (cx - o, cy - o), (cx + o, cy - o), (cx + o, cy + o), (cx - o, cy + o),  # outer corners
        (cx - i, cy - i), (cx + i, cy - i), (cx + i, cy + i), (cx - i, cy + i),  # inner corners
        (cx, cy),  # label node
    ]


def render_ring_node(node_id: int, lon_micro: int, lat_micro: int) -> list[str]:
    return [
        f'  <node id="{node_id}" lat="{micro_to_str(lat_micro)}" lon="{micro_to_str(lon_micro)}"/>'
    ]


def mp_way_ids(k: int) -> list[int]:
    base = RING_WAY_ID_BASE + 4 * k
    return [base, base + 1, base + 2]


def mp_way_refs(k: int) -> list[list[int]]:
    rn = mp_ring_node_ids(k)
    a = [rn[0], rn[1], rn[2]]                 # outer half A
    b = [rn[2], rn[3], rn[0]]                 # outer half B (stitches to A)
    if k % 2 == 1:
        b = list(reversed(b))                 # reversed direction variant
    c = [rn[4], rn[5], rn[6], rn[7], rn[4]]   # inner ring, closed
    return [a, b, c]


def render_relation(rel_id: int, members: list[tuple[str, int, str]], tags: list[tuple[str, str]]) -> list[str]:
    lines = [f'  <relation id="{rel_id}" version="1" uid="508">']
    for mtype, ref, role in members:
        lines.append(f'    <member type="{mtype}" ref="{ref}" role="{role}"/>')
    for k, v in tags:
        lines.append(_tag(k, v))
    lines.append("  </relation>")
    return lines


def relation_spec(r: int, rel_id: int, n_nodes: int, n_ways: int, n_mp: int):
    """Members + tags for relation index r (pattern r%5, FIXTURES.md F2)."""
    m = r % 5
    nid = lambda i: (i % n_nodes) + 1  # noqa: E731
    wid = lambda i: WAY_ID_BASE + (i % n_ways)  # noqa: E731
    if m == 0:
        k = (r // 5) % max(n_mp, 1)
        wa, wb, wc = mp_way_ids(k)
        rn = mp_ring_node_ids(k)
        members = [
            ("way", wa, "outer"),
            ("way", wb, "outer"),
            ("way", wc, "inner"),
            ("node", rn[8], "label"),
            ("relation", REL_ID_BASE, ""),        # ignored (OsmJoin.java:245-246)
            ("bogus", 42, "mystery"),             # unknown type: warn + skip (:247-249)
        ]
        tags = [("type", "multipolygon"), ("name", f"Area {rel_id}"), ("natural", "water")]
    elif m == 1:
        members = [
            ("way", wid(r), ""),
            ("way", wid(r + 1), ""),
            ("node", nid(r * 3), "stop"),
            ("node", nid(r * 3 + 5), "stop"),
        ]
        tags = [("type", "route"), ("route", "bus"), ("name", f"Route {rel_id}")]
    elif m == 2:
        # node-only → dropped by J6 (no way members; OsmJoin.java:396-421)
        members = [("node", nid(r * 7 + i), "") for i in range(3)]
        tags = [("type", "site"), ("name", f"Site {rel_id}")]
    elif m == 3:
        # way-only → dropped by J4 (no node members; OsmJoin.java:347-372)
        members = [("way", wid(r), ""), ("way", wid(r + 2), "")]
        tags = [("type", "street"), ("name", f"Street rel {rel_id}")]
    else:
        members = [
            ("way", wid(r), ""),
            ("way", WAY_ID_BASE + n_ways + 999_999, ""),  # nonexistent way member
            ("node", nid(r * 5), ""),
        ]
        tags = [("type", "collection"), ("name", f"Mixed {rel_id}")]
    return members, tags


# ---------------------------------------------------------------------------
# corpus assembly
# ---------------------------------------------------------------------------


def world_sizes(n_docs: int) -> dict[str, int]:
    n_nodes = 8 * n_docs
    n_ways = n_docs
    n_rels = max(5, n_docs // 10)
    n_mp = max(1, (n_rels + 4) // 5)
    return {"n_nodes": n_nodes, "n_ways": n_ways, "n_rels": n_rels, "n_mp": n_mp}


def iter_element_blocks(n_docs: int):
    """Yield every element of the world as a list of XML lines, in a
    deterministic order (nodes, ring nodes, ways, ring ways, relations)."""
    s = world_sizes(n_docs)
    for node_id in range(1, s["n_nodes"] + 1):
        yield render_node(node_id)
    for k in range(s["n_mp"]):
        ids = mp_ring_node_ids(k)
        coords = mp_node_coords_micro(k)
        for node_id, (lonu, latu) in zip(ids, coords):
            yield render_ring_node(node_id, lonu, latu)
    for w in range(s["n_ways"]):
        way_id = WAY_ID_BASE + w
        yield render_way(way_id, way_node_refs(w, s["n_nodes"]), way_tags(w, way_id))
    for k in range(s["n_mp"]):
        for way_id, refs in zip(mp_way_ids(k), mp_way_refs(k)):
            yield render_way(way_id, refs, [])
    for r in range(s["n_rels"]):
        rel_id = REL_ID_BASE + r
        members, tags = relation_spec(r, rel_id, s["n_nodes"], s["n_ways"], s["n_mp"])
        yield render_relation(rel_id, members, tags)


def _text_span(seed: int) -> str:
    n = 6 + seed % 10
    return " ".join(_WORDS[(seed * 7 + i * 3) % len(_WORDS)] for i in range(n))


def build_documents(n_docs: int) -> pa.Table:
    """Assemble the interleaved documents table.

    Elements are dealt round-robin to documents; each document interleaves
    text / media / osm_xml spans with monotonically increasing offsets.
    osm_xml spans chunk the document's elements into groups of ≤3 and
    prepend junk lines (chunker-skip fixture, OsmBlobIterableTest.java:16-20).
    """
    per_doc: list[list[list[str]]] = [[] for _ in range(n_docs)]
    for i, block in enumerate(iter_element_blocks(n_docs)):
        per_doc[i % n_docs].append(block)

    doc_ids = []
    all_spans = []
    for d in range(n_docs):
        spans: list[dict] = []

        def add(kind: str, text: str, media_ref: str) -> None:
            spans.append(
                {"kind": kind, "text": text, "media_ref": media_ref, "offset": len(spans)}
            )

        add("text", _text_span(d), "")
        blocks = per_doc[d]
        chunk: list[str] = []
        n_in_chunk = 0
        for bi, block in enumerate(blocks):
            if n_in_chunk == 0 and (d + bi) % 4 == 0:
                chunk.append(_JUNK[(d + bi) % len(_JUNK)])
            chunk.extend(block)
            n_in_chunk += 1
            if n_in_chunk == 3:
                add("osm_xml", "\n".join(chunk), "")
                chunk, n_in_chunk = [], 0
                if len(spans) % 3 == 0:
                    add("media", "", f"media://img/{d:06d}-{len(spans)}.png")
        if chunk:
            add("osm_xml", "\n".join(chunk), "")
        if d % 2 == 0:
            add("media", "", f"media://img/{d:06d}-tail.png")
        add("text", _text_span(d + 1_000_003), "")
        doc_ids.append(f"doc-{d:06d}")
        all_spans.append(spans)

    return pa.Table.from_pydict({"doc_id": doc_ids, "spans": all_spans}, schema=DOCUMENTS)


def sf_to_n_docs(sf_dir: str) -> int:
    """Map a driver sf dir (".../sf0.01") to a corpus size.

    Correctness scales (sf ≤ 0.01) stay small so oracle runs are quick;
    bench scales (sf ≥ 0.05) are sized so parallel compute dominates the
    per-exchange barrier overhead (≈9.34 elements/doc)."""
    name = os.path.basename(os.path.normpath(sf_dir))
    try:
        sf = float(name.replace("sf", ""))
    except ValueError:
        sf = 0.001
    factor = 3_000_000 if sf >= 0.05 else 200_000
    return max(50, int(factor * sf))


def ensure_corpus(n_docs: int, docs_per_file: int = 2000) -> str:
    """Generate (once) and return the path of the corpus parquet directory.

    Concurrency-safe: generation happens in a pid-suffixed temp dir that
    is atomically renamed into place; racing processes either win the
    rename or find the winner's _SUCCESS."""
    out_dir = os.path.join(SYNTH_ROOT, f"docs_{n_docs}")
    done = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(done):
        return out_dir
    tmp_dir = f"{out_dir}.tmp.{os.getpid()}"
    os.makedirs(tmp_dir, exist_ok=True)
    table = build_documents(n_docs)
    n_files = max(1, (n_docs + docs_per_file - 1) // docs_per_file)
    rows_per = (table.num_rows + n_files - 1) // n_files
    for i in range(n_files):
        chunk = table.slice(i * rows_per, rows_per)
        if chunk.num_rows:
            pq.write_table(chunk, os.path.join(tmp_dir, f"part-{i:05d}.parquet"))
    with open(os.path.join(tmp_dir, "_SUCCESS"), "w") as f:
        f.write(str(n_docs))
    try:
        os.rename(tmp_dir, out_dir)
    except OSError:
        # another process won the race; use its output
        import shutil

        shutil.rmtree(tmp_dir, ignore_errors=True)
        if not os.path.exists(done):
            raise
    return out_dir


def ensure_corpus_for_sf(sf_dir: str) -> str:
    return ensure_corpus(sf_to_n_docs(sf_dir))


def build_mega_relation_doc(n_docs: int, mega_members: int) -> pa.Table:
    """One extra document holding a single MEGA relation: ``mega_members``
    node members cycling the world's node ids, plus two way members and a
    name tag — so it survives the J4/J6 inner-join drops and its node
    list stresses the rel_id co-group (SURVEY §7.4 mega-relation skew;
    the reference's 10k-bucket workaround at OsmJoin.java:397-398)."""
    s = world_sizes(n_docs)
    rel_id = REL_ID_BASE + s["n_rels"] + 1000
    members = [("node", 1 + (i % s["n_nodes"]), "") for i in range(mega_members)]
    members += [("way", WAY_ID_BASE, ""), ("way", WAY_ID_BASE + 1, "")]
    tags = [("type", "collection"), ("name", f"Mega {rel_id}")]
    xml = "\n".join(render_relation(rel_id, members, tags))
    spans = [{"kind": "osm_xml", "text": xml, "media_ref": "", "offset": 0}]
    return pa.Table.from_pydict(
        {"doc_id": ["doc-mega-000000"], "spans": [spans]}, schema=DOCUMENTS
    )


def ensure_corpus_mega(n_docs: int, mega_members: int = 500_000) -> str:
    """Regular corpus + the mega-relation document, cached like
    ensure_corpus (bump SYNTH_ROOT version on ANY generator change)."""
    out_dir = os.path.join(SYNTH_ROOT, f"docs_{n_docs}_mega{mega_members}")
    done = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(done):
        return out_dir
    base = ensure_corpus(n_docs)
    tmp_dir = f"{out_dir}.tmp.{os.getpid()}"
    os.makedirs(tmp_dir, exist_ok=True)
    import shutil

    for f in os.listdir(base):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(base, f), os.path.join(tmp_dir, f))
    pq.write_table(
        build_mega_relation_doc(n_docs, mega_members),
        os.path.join(tmp_dir, "part-mega.parquet"),
    )
    with open(os.path.join(tmp_dir, "_SUCCESS"), "w") as f:
        f.write(f"{n_docs}+mega{mega_members}")
    try:
        os.rename(tmp_dir, out_dir)
    except OSError:
        shutil.rmtree(tmp_dir, ignore_errors=True)
        if not os.path.exists(done):
            raise
    return out_dir
