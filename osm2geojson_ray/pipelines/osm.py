"""Flagship pipeline: interleaved documents → parsed entities → join DAG →
features → tiles (the reference's OsmJoin.processAll + OsmPostProcessor.main
end-to-end, SURVEY.md §3, plus the [EXT] tiling layer)."""

from __future__ import annotations

from dataclasses import dataclass

import ray.data

from ..sources.documents import extract_elements, read_documents
from ..stages import join as J
from ..stages import parse as P
from ..stages.features_vec import poi_features, way_features
from ..stages.rings import relation_features, ring_rejects
from ..stages.tiling import (
    assign_points_to_polygons,
    knn_distributed,
    vertex_cells,
)


@dataclass
class OsmPipelineConfig:
    # hash-shuffle partition count.  "auto" (default): sized from the
    # materialized elements table's bytes via
    # functions.grouping.auto_num_parts — ceil(bytes/64MB) with a
    # max(8, cluster-CPUs) floor.  A fixed count is wrong at both ends
    # of the scale axis: 64 parts over a 500 MB corpus makes ~10 ms
    # reduce tasks whose dispatch+barrier latency dominates (measured
    # 3.6× slower at 8 CPUs), while any fixed count under-splits 100 TB.
    # Explicit ints are honored unchanged (tests, resume-stable
    # checkpoint grains).  With materialize_shared=False the input size
    # isn't knowable without an extra pass, so "auto" falls back to 64.
    num_parts: int | str = "auto"
    # salt: >1 = salted mega-key collect; "auto" = enable only when the
    # corpus actually contains a mega-key (default — free on clean data,
    # bounded task memory when a planet-scale mega-relation appears)
    salt: int | str | None = "auto"
    salt_trigger: int = 100_000  # max group fan-in before salting kicks in
    tile_res: int = 15           # cell grid resolution
    knn_k: int = 2
    # materialize shared intermediates once instead of re-executing the
    # upstream subgraph per consumer branch (Ray datasets don't dedupe
    # common subexpressions across branches) — the engine's analog of the
    # reference's per-stage files, and the checkpointable boundary
    materialize_shared: bool = True
    # overlap INDEPENDENT stage materializations (parse_nodes ∥ parse_ways
    # ∥ parse_relations; J1J2 ∥ J3J4 — the true dependency DAG of SURVEY
    # §3.4, which the reference needlessly serializes).  Each materialize
    # is a driver-blocking call whose tail leaves scheduler slots idle
    # (r4 CPU-metering: the nominal-8-CPU leg delivered only ~3.9
    # effective cores, idling at stage tails); running the independent
    # branches from concurrent driver threads fills those gaps while
    # keeping the per-stage boundaries (checkpoint grain) intact.
    # "auto" (default): overlap iff the cluster has >= 4 CPUs — measured
    # on the 300k-doc bench corpus: -24% wall at 8 CPUs (99.4→75.4 s) and
    # -38% at 32 (65.1→40.4 s), but +15% at 2 CPUs (176→202 s: with no
    # idle slots to backfill, two concurrent exchanges just contend for
    # the object store).  Any real cluster is in the >= 4 regime.
    overlap_stages: bool | str = "auto"
    # fold the three feature-projection materializations into the join
    # fanouts instead of leaving them for a serial post-build stage:
    # poi_features(nodes) runs beside J1J2∥J3J4, way_features beside
    # J5J6, so their plan dispatch backfills join-stage idle (the r4
    # CPU-metering showed the 8-CPU leg at ~49% utilization through the
    # joins).  Scheduling-only: every build() caller consumes features,
    # and the returned 'features' is then a union of pinned tables.
    # Only active with materialize_shared (same gate as overlapping).
    overlap_features: bool = True


def _max_list_len(ds: ray.data.Dataset, col: str) -> int:
    """Max list length of ``col`` — per-batch maxima (scalars) reduced on
    the driver; one cheap pass over an already-materialized table."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def m(t: pa.Table) -> pa.Table:
        v = pc.max(pc.list_value_length(t.column(col).combine_chunks())).as_py()
        return pa.table({"m": pa.array([int(v or 0)], pa.int64())})

    return max((r["m"] for r in ds.map_batches(m, batch_format="pyarrow").take_all()), default=0)


def _max_member_fanins(relations: ray.data.Dataset) -> tuple[int, int]:
    """(max node-member count, max way-member count) per relation — one
    vectorized pass (flatten member structs, reduceat per row)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    def m(t: pa.Table) -> pa.Table:
        col = t.column("members").combine_chunks()
        lens = np.asarray(col.value_lengths().fill_null(0), dtype=np.int64)
        if len(lens) == 0 or lens.sum() == 0:
            return pa.table({"mn": pa.array([0], pa.int64()),
                             "mw": pa.array([0], pa.int64())})
        flat = col.flatten()
        typ = flat.field("type")
        starts = np.cumsum(lens) - lens
        ends = starts + lens
        out = []
        for want in ("node", "way"):
            is_t = np.asarray(pc.equal(typ, want).fill_null(False)).astype(np.int64)
            # prefix-sum segment sums, NOT reduceat: a zero-length row's
            # clamped reduceat start would split the previous row's
            # segment and steal its last member (undercounting the very
            # fan-in the salt gate exists to catch)
            csum = np.concatenate([[0], np.cumsum(is_t)])
            cnt = csum[ends] - csum[starts]
            out.append(int(cnt.max()))
        return pa.table({"mn": pa.array([out[0]], pa.int64()),
                         "mw": pa.array([out[1]], pa.int64())})

    rows = relations.map_batches(m, batch_format="pyarrow").take_all()
    return (max((r["mn"] for r in rows), default=0),
            max((r["mw"] for r in rows), default=0))


def resolve_salts(
    ways: ray.data.Dataset,
    relations: ray.data.Dataset,
    cfg: "OsmPipelineConfig",
) -> dict[str, int | None]:
    """Per-STAGE salt decision (r4): ``salt='auto'`` inspects the fan-in
    of each collect key separately — J2 salts on max len(ns), J4 on the
    max node-member count, J6 on the max way-member count — because a
    mega-RELATION must not tax the way-collect with the salted two-phase
    path (2 exchanges + partial-list concat over the fat complete-way
    payloads; measured 3× J2 cost when salted needlessly).  Fan-in is
    knowable BEFORE any join (the skew the reference works around with
    its 10k bucket size, OsmJoin.java:397-398); salting engages only
    above ``salt_trigger``, sized so each salted sub-group stays near
    the trigger."""
    if cfg.salt != "auto":
        return {"j2": cfg.salt, "j4": cfg.salt, "j6": cfg.salt}
    pick = _salt_picker(cfg)
    mn, mw = _max_member_fanins(relations)
    return {"j2": pick(_max_list_len(ways, "ns")), "j4": pick(mn), "j6": pick(mw)}


def _salt_picker(cfg: "OsmPipelineConfig"):
    def pick(biggest: int) -> int | None:
        if biggest <= cfg.salt_trigger:
            return None
        return int(min(256, -(-biggest // cfg.salt_trigger) * 2))

    return pick


def resolve_salt(
    ways: ray.data.Dataset,
    relations: ray.data.Dataset,
    cfg: "OsmPipelineConfig",
) -> int | None:
    """Corpus-wide summary of resolve_salts (max over stages) — kept for
    reporting and the explicit-salt passthrough contract."""
    salts = [s for s in resolve_salts(ways, relations, cfg).values() if s]
    return max(salts) if salts else None


def build(
    documents: ray.data.Dataset,
    cfg: OsmPipelineConfig = OsmPipelineConfig(),
    stage_timings: dict | None = None,
):
    """Dataset graph for every stage output.  With materialize_shared,
    multi-consumer intermediates (elements, parsed tables, complete ways
    and relations) are pinned once; everything downstream still streams.

    ``stage_timings``: pass a dict to record the wall time of each
    materialization boundary (bench.py per-stage reporting, VERDICT r2
    #3); a no-op when materialize_shared is off."""
    import time as _time

    from ..functions.grouping import auto_num_parts

    if not (isinstance(cfg.num_parts, int) or cfg.num_parts == "auto"):
        raise ValueError(f"num_parts must be an int or 'auto', got {cfg.num_parts!r}")
    blocks = max(8, min(cfg.num_parts, 32)) if isinstance(cfg.num_parts, int) else 32

    def _timed(name: str, thunk):
        if stage_timings is None:
            return thunk()
        t0 = _time.perf_counter()
        out = thunk()
        stage_timings[name] = round(_time.perf_counter() - t0, 3)
        return out

    if cfg.materialize_shared:
        # parse tables inherit the read's block count — coalesce them;
        # exchange outputs are already coalesced to num_parts blocks.
        mat_src = lambda name, ds: _timed(  # noqa: E731
            name, lambda: ds.repartition(blocks).materialize()
        )
        mat = lambda name, ds: _timed(name, lambda: ds.materialize())  # noqa: E731
    else:
        mat_src = mat = lambda name, ds: ds  # noqa: E731
    if cfg.overlap_stages == "auto":
        overlap = None  # decided lazily at the first fan-out (see below)
    else:
        overlap = cfg.materialize_shared and bool(cfg.overlap_stages)

    def _decide_overlap() -> bool:
        # 'auto' is resolved LAZILY, at the first _fanout call — by then
        # the 'elements' materialize has executed, so Ray is guaranteed
        # initialized and cluster_resources() reflects the REAL cluster.
        # (ADVICE r4: an os.cpu_count() fallback on a many-core host
        # could enable overlap on a later-attached <4-CPU cluster —
        # exactly the regime measured +15% slower from object-store
        # contention.)
        nonlocal overlap
        if overlap is None:
            import os

            import ray

            cpus = (
                ray.cluster_resources().get("CPU", 0)
                if ray.is_initialized()
                else (os.cpu_count() or 1)  # unreachable in-pipeline; kept as a safe default
            )
            overlap = cfg.materialize_shared and cpus >= 4
        return overlap

    def _fanout(jobs: list[tuple]):
        """Run independent (name, fn, ds) materializations concurrently.
        Thread-per-branch: each Dataset executes in its own streaming
        executor; concurrent drivers interleave their tasks so one
        branch's stage tail backfills with the other's work."""
        if not _decide_overlap() or len(jobs) == 1:
            return [fn(name, ds) for name, fn, ds in jobs]
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(len(jobs)) as ex:
            futs = [ex.submit(fn, name, ds) for name, fn, ds in jobs]
            return [f.result() for f in futs]

    elements = mat_src("elements", extract_elements(documents))
    if cfg.num_parts == "auto":
        # size_bytes() is free metadata on the materialized table; the
        # lazy (materialize_shared=False) path would have to execute the
        # whole extract to know it, so it keeps the legacy fixed count
        np_resolved = (
            auto_num_parts(elements.size_bytes()) if cfg.materialize_shared else 64
        )
    else:
        np_resolved = cfg.num_parts
    if stage_timings is not None:
        stage_timings["_num_parts"] = np_resolved
    # salt='auto' fan-in probes ride in the parse fanout threads: each
    # probe is a small plan over a table its own thread just pinned, so
    # the two probe dispatches overlap each other (and the remaining
    # parse branches) instead of running as two serial plans between the
    # parse and join stages.
    salt_probe: dict[str, int] = {}
    auto_salt = cfg.salt == "auto"

    def mat_ways(name, ds):
        w = mat_src(name, ds)
        if auto_salt:
            salt_probe["ns"] = _max_list_len(w, "ns")
        return w

    def mat_rels(name, ds):
        r = mat_src(name, ds)
        if auto_salt:
            salt_probe["mn"], salt_probe["mw"] = _max_member_fanins(r)
        return r

    nodes, ways, relations = _fanout([
        ("parse_nodes", mat_src, P.parse_nodes(elements)),
        ("parse_ways", mat_ways, P.parse_ways(elements)),
        ("parse_relations", mat_rels, P.parse_relations(elements)),
    ])
    rejects = P.parse_rejects(elements)
    # staged execution: a materialization boundary every 1-2 exchanges.
    # One giant lazy DAG is measurably slower on Ray's streaming executor
    # (too many concurrent operator stages contend); this mirrors the
    # reference's per-stage files and doubles as the checkpoint grain.
    # Independent BRANCHES of the DAG (J1J2 vs J3J4) still overlap.
    np_ = np_resolved
    if auto_salt:
        pick = _salt_picker(cfg)
        salts = {
            "j2": pick(salt_probe["ns"]),
            "j4": pick(salt_probe["mn"]),
            "j6": pick(salt_probe["mw"]),
        }
    else:
        salts = {"j2": cfg.salt, "j4": cfg.salt, "j6": cfg.salt}
    wn = J.j1_way_nodes(nodes, P.way_edges(ways), np_)
    rn = J.j3_rel_nodes(nodes, P.node_rel_edges(relations), np_)
    # staged boundaries measured FASTER than a fully lazy DAG at the
    # 600k-doc corpus in both rounds (single-consumer J4 left lazy was
    # ~1.6x slower at 8 CPUs: concurrent operator stages contend)
    do_feat = cfg.overlap_features and cfg.materialize_shared
    jobs = [
        ("j1_j2_complete_ways", mat, J.j2_complete_ways(ways, wn, np_, salts["j2"])),
        ("j3_j4_rel_with_nodes", mat, J.j4_rel_with_nodes(relations, rn, np_, salts["j4"])),
    ]
    if do_feat:
        jobs.append(("features_points", mat, poi_features(nodes)))
    res = _fanout(jobs)
    complete_ways, rwn = res[0], res[1]
    pois_m = res[2] if do_feat else None
    rw = J.j5_rel_ways(complete_ways, P.way_rel_edges(relations), np_)
    jobs = [("j5_j6_complete_relations", mat,
             J.j6_complete_relations(rwn, rw, np_, salts["j6"]))]
    if do_feat:
        jobs.append(("features_ways", mat, way_features(complete_ways)))
    res = _fanout(jobs)
    complete_rels = res[0]
    wfeat_m = res[1] if do_feat else None
    dag = {
        "way_nodes": wn,
        "complete_ways": complete_ways,
        "rel_nodes": rn,
        "rel_with_nodes": rwn,
        "rel_ways": rw,
        "complete_relations": complete_rels,
    }
    pois = pois_m if pois_m is not None else poi_features(nodes)
    wfeat = wfeat_m if wfeat_m is not None else way_features(dag["complete_ways"])
    rfeat = relation_features(dag["complete_relations"])
    if do_feat:
        rfeat = mat("features_rels", rfeat)
    features = pois.union(wfeat).union(rfeat)
    return {
        "elements": elements,
        "nodes": nodes,
        "ways": ways,
        "relations": relations,
        "rejects": rejects,
        **dag,
        "poi_features": pois,
        "way_features": wfeat,
        "relation_features": rfeat,
        "ring_rejects": ring_rejects(dag["complete_relations"]),
        "features": features,
    }


def run_flagship(
    documents_path: str,
    cfg: OsmPipelineConfig = OsmPipelineConfig(),
    with_tiles: bool = True,
):
    """Materialize the feature table (and tiles) from a documents corpus.

    Returns dict of materialized datasets — features, tiles, pip pairs,
    knn pairs."""
    docs = read_documents(documents_path)
    g = build(docs, cfg)
    features = g["features"].materialize()
    out = {"features": features, "rejects": g["rejects"], "ring_rejects": g["ring_rejects"]}
    if with_tiles:
        out["tiles"] = vertex_cells(features, cfg.tile_res)
        import pyarrow as pa
        import pyarrow.compute as pc

        polys = features.map_batches(
            lambda t: t.filter(
                pc.is_in(t["geom_type"], value_set=pa.array(["Polygon", "MultiPolygon"]))
            ),
            batch_format="pyarrow",
        )
        points = features.map_batches(
            lambda t: t.filter(pc.equal(t["geom_type"], "Point")),
            batch_format="pyarrow",
        )
        # scale-path defaults: shuffle PIP + distributed kNN (nothing
        # gathered to the driver, no per-actor global index)
        out["pip"] = assign_points_to_polygons(points, polys, cfg.tile_res)
        out["knn"] = knn_distributed(points, polys, k=cfg.knn_k)
    return out
