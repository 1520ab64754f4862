#!/usr/bin/env python
"""Job entry point — the script you'd hand to ``ray job submit``:

    ray job submit --working-dir . -- \
        python tools/run_pipeline.py --input /data/documents --workdir /data/ckpt \
        --out /data/geojson --tile-res 15 --num-parts 256 --salt 16

Runs the checkpointed flagship (resumable: re-submit after a failure and
completed stages are skipped), writes GeoJSON-lines outputs + tiles, and
prints a lineage summary.  In this sandbox it runs on a local Ray; on a
cluster the same script runs unchanged (partitioning is data-sized, not
node-sized).
"""

from __future__ import annotations

import argparse
import json
import sys


def parse_salt(v: str):
    """'auto' | 'none' | non-negative int — anything else is an error
    (a typo like '16x' or a negative salt must not silently become 'auto')."""
    s = v.lower()
    if s == "auto":
        return "auto"
    if s == "none":
        return None
    try:
        n = int(s)
    except ValueError:
        raise argparse.ArgumentTypeError(f"--salt must be 'auto', 'none' or a non-negative int, got {v!r}")
    if n < 0:
        raise argparse.ArgumentTypeError(f"--salt must be non-negative, got {v!r}")
    return n


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents table (parquet/lance dir)")
    ap.add_argument("--workdir", required=True, help="checkpoint directory")
    ap.add_argument("--out", default=None, help="GeoJSON output directory")
    ap.add_argument("--num-parts", type=int, default=64)
    ap.add_argument(
        "--salt", type=parse_salt, default="auto",
        help="mega-key salt: non-negative int, 'auto' (corpus-triggered, default), or 'none'",
    )
    ap.add_argument("--tile-res", type=int, default=15)
    ap.add_argument("--sort-output", action="store_true")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, ".")
    from osm2geojson_ray.sources.sinks import write_geojson
    from osm2geojson_ray.stages.tiling import vertex_cells
    from osm2geojson_ray.state.checkpoints import run_checkpointed_flagship

    out = run_checkpointed_flagship(
        args.input, args.workdir, num_parts=args.num_parts, salt=args.salt
    )
    cp = out["pipeline"]
    features = out["features"]
    tiles = vertex_cells(features, args.tile_res, num_parts=args.num_parts)
    # post-checkpoint outputs must be replaced, not appended (Ray's
    # write_parquet defaults to append): wipe any copy a crashed or
    # previous run left behind before writing
    tiles_dir = f"{args.workdir}/tiles"
    import shutil

    shutil.rmtree(tiles_dir, ignore_errors=True)
    tiles.write_parquet(tiles_dir)
    if args.out:
        # write_geojson's sink wipes its own output dirs before writing
        write_geojson(features, args.out, sort=args.sort_output)
    summary = {
        "executed": cp.executed,
        "resumed": cp.skipped,
        "stages": {r["stage"]: r["rows"] for r in cp.lineage() if not r["resumed"]},
    }
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
