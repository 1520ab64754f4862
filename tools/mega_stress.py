"""Mega-relation skew stress (VERDICT r3 #5 / SURVEY §7.4).

Runs the flagship join DAG over a corpus containing one relation with
``--mega-members`` node members (default 500k — planet-scale mega-key
territory), verifies salting engaged (``resolve_salt`` > 1), samples the
peak resident memory across all Ray worker processes while the DAG runs,
and prints ONE JSON line.  Run it twice (fresh processes) at two CPU
counts for the N→4N efficiency figure:

    python tools/mega_stress.py --num-cpus 2
    python tools/mega_stress.py --num-cpus 8
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time


def _worker_rss_mb() -> float:
    """Total RSS (MB) of this process tree's python/ray processes —
    /proc scan, no psutil dependency."""
    total = 0
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read().decode(errors="replace")
            if "ray::" not in cmd and "raylet" not in cmd and pid != str(os.getpid()):
                continue
            with open(f"/proc/{pid}/status") as f:
                for line in f:
                    if line.startswith("VmRSS:"):
                        total += int(line.split()[1])
                        break
        except OSError:
            continue
    return total / 1024.0


class PeakSampler(threading.Thread):
    def __init__(self, interval: float = 0.5):
        super().__init__(daemon=True)
        self.peak = 0.0
        self.interval = interval
        self._halt = threading.Event()  # NB: Thread reserves _stop

    def run(self):
        while not self._halt.is_set():
            self.peak = max(self.peak, _worker_rss_mb())
            self._halt.wait(self.interval)

    def stop(self):
        self._halt.set()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-cpus", type=int, default=8)
    ap.add_argument("--n-docs", type=int, default=60_000)
    ap.add_argument("--mega-members", type=int, default=500_000)
    ap.add_argument("--num-parts", type=int, default=64)
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from osm2geojson_ray import synth

    corpus = synth.ensure_corpus_mega(args.n_docs, args.mega_members)

    import ray

    ray.init(address="local", num_cpus=args.num_cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from osm2geojson_ray.pipelines.osm import (
        OsmPipelineConfig, resolve_salt, run_flagship,
    )
    from osm2geojson_ray.sources.documents import read_documents
    from osm2geojson_ray.stages import parse as P
    from osm2geojson_ray.sources.documents import extract_elements

    cfg = OsmPipelineConfig(num_parts=args.num_parts)

    # report the salt the auto-inspection picks (same call build() makes)
    docs = read_documents(corpus)
    elements = extract_elements(docs)
    salt = resolve_salt(
        P.parse_ways(elements), P.parse_relations(elements), cfg
    )

    sampler = PeakSampler()
    sampler.start()
    t0 = time.perf_counter()
    out = run_flagship(corpus, cfg, with_tiles=False)
    n_features = out["features"].count()
    wall = time.perf_counter() - t0
    sampler.stop()
    sampler.join(timeout=2)

    n_elements = args.n_docs * 9.34 + args.mega_members  # approx, for rate
    print(json.dumps({
        "metric": "mega_relation_stress",
        "n_docs": args.n_docs,
        "mega_members": args.mega_members,
        "num_cpus": args.num_cpus,
        "num_parts": args.num_parts,
        "salt": salt,
        "salting_engaged": bool(salt and salt > 1),
        "wall_sec": round(wall, 1),
        "elements_per_sec": round(n_elements / wall),
        "n_features": n_features,
        "peak_worker_rss_mb": round(sampler.peak),
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
