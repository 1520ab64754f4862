"""GeoJSON-lines sink (reference K2: OsmPostProcessor.JsonWriter,
OsmPostProcessor.java:60-113 — one JSON object per line, one file set per
OsmType: osm-pois / osm-ways / osm-relations).

The engine's FEATURES rows are reconstructed into the reference's
GeoJSON-ish shape:

    {"id": "osmnode/<id>", "title": ..., "geometry": {"type", "coordinates"},
     "categories": {"osm": [...]}, "address"?: {...}, "name"?: {lang: [...]},
     "links"?: [{"href": ...}]}

(field inventory per OsmPostProcessor.java:128-133,169-173,332-344).
Written with ``Dataset.write_json`` — one JSON object per line, a
directory of part files per type (resumable output, never one giant
file).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data


def _coords(xs, ys, ring_offsets, poly_offsets, geom_type):
    pts = [[x, y] for x, y in zip(xs, ys)]
    if geom_type == "Point":
        return pts[0]
    if geom_type == "LineString":
        return pts
    ring_bounds = list(ring_offsets) + [len(pts)]
    rings = [pts[ring_bounds[i] : ring_bounds[i + 1]] for i in range(len(ring_offsets))]
    if geom_type == "Polygon":
        return rings
    poly_bounds = list(poly_offsets) + [len(rings)]
    return [rings[poly_bounds[i] : poly_bounds[i + 1]] for i in range(len(poly_offsets))]


def feature_to_geojson(row: dict) -> dict:
    out = {
        "id": row["feature_id"],
        "title": row["title"],
        "geometry": {
            "type": row["geom_type"],
            "coordinates": _coords(
                row["xs"], row["ys"], row["ring_offsets"], row["poly_offsets"], row["geom_type"]
            ),
        },
        "categories": {"osm": list(row["categories"])},
    }
    if row["address"]:
        out["address"] = {a["key"]: a["value"] for a in row["address"]}
    if row["names"]:
        out["name"] = {n["lang"]: list(n["values"]) for n in row["names"]}
    if row["links"]:
        out["links"] = [{"href": href} for href in row["links"]]
    return out


def geojson_rows_batch(batch: pa.Table) -> list[dict]:
    return [feature_to_geojson(r) for r in batch.to_pylist()]


class GeoJSONLinesSink(ray.data.Datasink):
    """Batch-wise JSON-lines GeoJSON sink: each write task serializes its
    Arrow blocks directly (no per-row flat_map stage, absent optional
    fields genuinely omitted from the JSON), one part file per task —
    resumable partitioned output, never one giant file."""

    def __init__(self, path: str) -> None:
        self.path = path

    def on_write_start(self) -> None:
        import os
        import shutil

        # a re-run must replace, not append to, a previous (possibly
        # partial) output — mirrors CheckpointedPipeline.stage's wipe
        if os.path.exists(self.path):
            shutil.rmtree(self.path)
        os.makedirs(self.path, exist_ok=True)

    def write(self, blocks, ctx) -> int:
        import json
        import os

        n = 0
        out = os.path.join(self.path, f"part-{ctx.task_idx:06d}.jsonl")
        tmp = out + ".tmp"
        with open(tmp, "w") as f:
            for block in blocks:
                for obj in geojson_rows_batch(block):
                    f.write(json.dumps(obj) + "\n")
                    n += 1
        if n:
            os.rename(tmp, out)
        else:
            os.remove(tmp)  # don't litter the output with empty parts
        return n

    def get_name(self) -> str:
        return "GeoJSONLines"


def write_geojson(
    features: ray.data.Dataset, out_dir: str, split_by_type: bool = True, sort: bool = False
) -> dict[str, str]:
    """Write features as JSON-lines GeoJSON.  ``split_by_type`` mirrors
    the reference's three outputs (poi/way/relation); ``sort`` makes the
    global file order deterministic (the reference's order is a
    consequence of its single-node sort — SURVEY.md §4 'Determinism')."""
    import pyarrow.compute as pc

    paths: dict[str, str] = {}
    groups = (
        {"poi": "osm-pois", "way": "osm-ways", "relation": "osm-relations"}
        if split_by_type
        else {None: "features"}
    )
    for osm_type, name in groups.items():
        ds = features
        if osm_type is not None:
            ds = ds.map_batches(
                lambda t, ot=osm_type: t.filter(pc.equal(t["osm_type"], ot)),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        if sort:
            ds = ds.sort("feature_id")
        path = f"{out_dir}/{name}"
        ds.write_datasink(GeoJSONLinesSink(path))
        paths[name] = path
    return paths
