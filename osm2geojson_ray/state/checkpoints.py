"""Checkpointed, resumable pipeline execution with lineage metrics
(SURVEY.md §4: the reference's de-facto per-stage sorted gzip files made
reruns cheap but had no orchestration; here every stage writes partitioned
Parquet + a manifest, and a resumed run skips completed stages).

Layout under ``workdir``:

    <stage>/part-*.parquet     stage output (one file per block)
    <stage>/_MANIFEST.json     {"rows": N, "seconds": s, "completed_at": ts}
    metrics.jsonl              one lineage record per stage execution

Resume grain is the stage (the reference's grain, SURVEY.md §3.1); the
per-stage directories are partitioned by block so a future refinement can
skip finished partitions within a stage.
"""

from __future__ import annotations

import json
import os
import time

import ray.data


def _parquet_rows(dirpath: str) -> int:
    """Total row count of a parquet directory from file footers only."""
    import pyarrow.parquet as pq

    total = 0
    for root, _dirs, files in os.walk(dirpath):
        for f in files:
            if f.endswith(".parquet"):
                total += pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
    return total


class CheckpointedPipeline:
    def __init__(self, workdir: str) -> None:
        self.workdir = workdir
        os.makedirs(workdir, exist_ok=True)
        self.metrics_path = os.path.join(workdir, "metrics.jsonl")
        self.executed: list[str] = []   # stages actually run this session
        self.skipped: list[str] = []    # stages resumed from checkpoint

    def _stage_dir(self, name: str) -> str:
        return os.path.join(self.workdir, name)

    def _manifest(self, name: str) -> str:
        return os.path.join(self._stage_dir(name), "_MANIFEST.json")

    def is_complete(self, name: str) -> bool:
        return os.path.exists(self._manifest(name))

    def _record(self, name: str, rows: int, seconds: float, resumed: bool) -> None:
        rec = {
            "stage": name,
            "rows": rows,
            "seconds": round(seconds, 3),
            "resumed": resumed,
            "ts": time.time(),
        }
        with open(self.metrics_path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    def stage(self, name: str, builder) -> ray.data.Dataset:
        """Return the stage output, resuming from the checkpoint if its
        manifest exists; otherwise run ``builder()``, persist, manifest."""
        sdir = self._stage_dir(name)
        if self.is_complete(name):
            self.skipped.append(name)
            ds = ray.data.read_parquet(sdir)
            self._record(name, -1, 0.0, resumed=True)
            return ds
        t0 = time.perf_counter()
        ds = builder()
        # wipe any partial output of a previously failed attempt
        if os.path.exists(sdir):
            import shutil

            shutil.rmtree(sdir)
        ds.write_parquet(sdir)
        out = ray.data.read_parquet(sdir)
        # row count from the parquet footers (metadata-only) — not a
        # second full pass over the stage output
        rows = _parquet_rows(sdir)
        seconds = time.perf_counter() - t0
        with open(self._manifest(name), "w") as f:
            json.dump({"rows": rows, "seconds": round(seconds, 3),
                       "completed_at": time.time()}, f)
        self._record(name, rows, seconds, resumed=False)
        self.executed.append(name)
        return out

    def lineage(self) -> list[dict]:
        if not os.path.exists(self.metrics_path):
            return []
        with open(self.metrics_path) as f:
            return [json.loads(l) for l in f if l.strip()]


def run_checkpointed_flagship(
    documents_path: str,
    workdir: str,
    num_parts: int = 32,
    salt: int | str | None = "auto",
) -> dict:
    """The flagship DAG with a checkpoint at every stage boundary
    (OsmJoin.processAll stage structure, SURVEY.md §3.1).  Re-running
    after a crash skips completed stages."""
    from ..sources.documents import extract_elements, read_documents
    from ..stages import join as J
    from ..stages import parse as P
    from ..stages.features_vec import poi_features, way_features
    from ..stages.rings import relation_features

    cp = CheckpointedPipeline(workdir)
    docs = read_documents(documents_path)
    elements = cp.stage("elements", lambda: extract_elements(docs))
    nodes = cp.stage("nodes", lambda: P.parse_nodes(elements))
    ways = cp.stage("ways", lambda: P.parse_ways(elements))
    relations = cp.stage("relations", lambda: P.parse_relations(elements))
    cp.stage("rejects", lambda: P.parse_rejects(elements))
    if salt == "auto":
        from ..pipelines.osm import OsmPipelineConfig, resolve_salts

        salts = resolve_salts(ways, relations, OsmPipelineConfig())
    else:
        salts = {"j2": salt, "j4": salt, "j6": salt}
    complete_ways = cp.stage(
        "complete_ways",
        lambda: J.j2_complete_ways(ways, J.j1_way_nodes(nodes, P.way_edges(ways), num_parts), num_parts, salts["j2"]),
    )
    rel_with_nodes = cp.stage(
        "rel_with_nodes",
        lambda: J.j4_rel_with_nodes(relations, J.j3_rel_nodes(nodes, P.node_rel_edges(relations), num_parts), num_parts, salts["j4"]),
    )
    complete_relations = cp.stage(
        "complete_relations",
        lambda: J.j6_complete_relations(
            rel_with_nodes, J.j5_rel_ways(complete_ways, P.way_rel_edges(relations), num_parts), num_parts, salts["j6"]
        ),
    )
    features = cp.stage(
        "features",
        lambda: poi_features(nodes)
        .union(way_features(complete_ways))
        .union(relation_features(complete_relations)),
    )
    return {
        "pipeline": cp,
        "features": features,
        "complete_ways": complete_ways,
        "complete_relations": complete_relations,
    }
