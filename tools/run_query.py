#!/usr/bin/env python
"""Run any registry query as a job and write partitioned Parquet.

The per-operator counterpart of ``run_pipeline.py`` (the flagship job
surface): ``ray job submit -- python tools/run_query.py --query
minhash_pairs --out /data/minhash`` runs one SURVEY §2 / training
operator over an sf dir and lands the result as a partitioned Parquet
directory (one file per block — resumable downstream consumption, never
one giant file).  Small in-memory results (Arrow tables from bounded
operators like ``event_quantiles``) are written as a single file, which
is fine because they are bounded by construction.

Exit code 0 iff the query ran and wrote ≥ ``--min-rows`` rows.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--query", required=True, help="name from __ray_entry__.queries()")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", required=True, help="output Parquet directory")
    ap.add_argument("--min-rows", type=int, default=1)
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument(
        "--resume", action="store_true",
        help="skip (exit 0) if the output manifest says this query already "
        "completed — the per-operator analogue of run_pipeline.py's "
        "checkpoint skip",
    )
    args = ap.parse_args()

    manifest = os.path.join(args.out, "_MANIFEST.json")
    if args.resume and os.path.exists(manifest):
        with open(manifest) as f:
            prev = json.load(f)
        if prev.get("query") == args.query and prev.get("rows", 0) >= args.min_rows:
            print(json.dumps({**prev, "resumed": True}))
            return 0

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    try:
        import pyarrow as pa
        import pyarrow.parquet as pq

        import __ray_entry__ as e

        reg = e.queries(full=True)
        if args.query not in reg:
            print(
                f"unknown query {args.query!r}; available: {sorted(reg)}",
                file=sys.stderr,
            )
            return 2
        t0 = time.perf_counter()
        res = reg[args.query](args.sf_dir)
        if isinstance(res, pa.Table):
            os.makedirs(args.out, exist_ok=True)
            pq.write_table(res, f"{args.out}/part-0.parquet")
            n = res.num_rows
        elif hasattr(res, "write_parquet"):  # ray.data.Dataset
            res.write_parquet(args.out)
            n = ray.data.read_parquet(args.out).count()
        else:  # pandas
            os.makedirs(args.out, exist_ok=True)
            pq.write_table(pa.Table.from_pandas(res, preserve_index=False),
                           f"{args.out}/part-0.parquet")
            n = len(res)
        wall = round(time.perf_counter() - t0, 3)
        summary = {"query": args.query, "rows": n, "sec": wall, "out": args.out}
        if n >= args.min_rows:
            with open(manifest, "w") as f:
                json.dump(summary, f)
        print(json.dumps(summary))
        return 0 if n >= args.min_rows else 1
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
