#!/usr/bin/env python
"""CPU-metered scaling leg: run one flagship bench leg at a nominal CPU
count while sampling the whole process tree's cumulative CPU time, and
report wall seconds, total CPU seconds, and EFFECTIVE cores delivered.

This is the permanent home of the r4 adjudication harness (BASELINE.md
"Scaling adjudication: effective cores"): a nominal 2→8 ratio on a noisy
shared VM conflates the engine's scaling with the box's willingness to
deliver 4× resources.  Metering each leg separates them:

  effective_cores      = cpu_sec / wall_sec        (what the box delivered)
  per_effective_core   = throughput / effective_cores

If total CPU seconds are conserved across levels and throughput per
effective core is ≥1.0 going N→4N, the engine loses nothing to
coordination — any nominal ratio shortfall is undelivered resources,
which a real 4N-node cluster (4× memory bandwidth, dedicated cores)
does deliver.

Usage:
  python tools/leg_cpumeter.py --cpus 2 --scale-docs 600000
  python tools/leg_cpumeter.py --pair 2,8 --scale-docs 600000   # both legs + ratio

Ray in local mode parents every raylet/worker under the driver process,
so sampling the subtree rooted at the bench subprocess captures all
engine CPU.  Per-pid cumulative counters are tracked as a max (a pid
that exits keeps its last observed total), sampled every 0.25 s.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import threading
import time

CLK_TCK = os.sysconf("SC_CLK_TCK")


def _proc_snapshot() -> dict[int, tuple[int, float]]:
    """pid -> (ppid, cumulative utime+stime seconds) for all live pids."""
    out: dict[int, tuple[int, float]] = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat", "rb") as f:
                raw = f.read().decode("ascii", "replace")
        except OSError:
            continue
        # comm may contain spaces/parens: fields resume after the last ')'
        rest = raw[raw.rfind(")") + 2 :].split()
        ppid = int(rest[1])
        cpu = (int(rest[11]) + int(rest[12])) / CLK_TCK  # utime + stime
        out[int(d)] = (ppid, cpu)
    return out


def _subtree(snapshot: dict[int, tuple[int, float]], root: int) -> set[int]:
    kids: dict[int, list[int]] = {}
    for pid, (ppid, _) in snapshot.items():
        kids.setdefault(ppid, []).append(pid)
    seen: set[int] = set()
    stack = [root]
    while stack:
        p = stack.pop()
        if p in seen:
            continue
        seen.add(p)
        stack.extend(kids.get(p, []))
    return seen


class TreeCpuMeter:
    """Samples the process subtree under ``root_pid``; per-pid cumulative
    CPU is kept as a running max so pids that exit between samples retain
    their last observed total (undercounts only the final <0.25 s slice)."""

    def __init__(self, root_pid: int, interval: float = 0.25):
        self.root = root_pid
        self.interval = interval
        self.per_pid: dict[int, float] = {}
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    def _sample(self):
        snap = _proc_snapshot()
        for pid in _subtree(snap, self.root):
            if pid in snap:
                cpu = snap[pid][1]
                if cpu > self.per_pid.get(pid, 0.0):
                    self.per_pid[pid] = cpu

    def _run(self):
        while not self._stop.is_set():
            self._sample()
            self._stop.wait(self.interval)
        self._sample()  # final read

    def __enter__(self):
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._thread.join(timeout=5)

    @property
    def cpu_sec(self) -> float:
        return sum(self.per_pid.values())


def run_leg(cpus: int, scale_docs: int, sf_dir: str, cpuset: bool = False) -> dict:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, RAY_GRAFT_CPUS=str(cpus), GRAFT_SF_DIR=sf_dir,
               GRAFT_PINNED_CONTROL="0")
    argv = [sys.executable, os.path.join(repo, "bench.py"), "--flagship-only",
            "--scale-docs", str(scale_docs)]
    if cpuset:  # pin the whole tree to exactly the nominal core count
        argv = ["taskset", "-c", f"0-{cpus - 1}"] + argv
    t0 = time.perf_counter()
    p = subprocess.Popen(
        argv, env=env, cwd=repo, stdout=subprocess.PIPE, text=True,
    )
    with TreeCpuMeter(p.pid) as meter:
        stdout, _ = p.communicate(timeout=3600)
    wall = time.perf_counter() - t0
    line = [l for l in stdout.strip().splitlines() if l.startswith("{")][-1]
    bench = json.loads(line)
    flagship = float(bench["flagship_sec"])
    cpu = meter.cpu_sec
    return {
        "nominal_cpus": cpus,
        "leg_wall_sec": round(wall, 1),
        "flagship_sec": flagship,
        "tree_cpu_sec": round(cpu, 1),
        "effective_cores": round(cpu / wall, 2),
        "docs_per_sec": round(bench["docs_per_sec"], 1),
        "n_docs": bench["n_docs"],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--pair", type=str, default=None, help="e.g. 2,8")
    ap.add_argument("--scale-docs", type=int,
                    default=int(os.environ.get("GRAFT_SCALE_DOCS", "600000")))
    ap.add_argument("--sf-dir", type=str,
                    default=os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpuset", action="store_true",
                    help="taskset-pin each leg to its nominal core count")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from osm2geojson_ray import synth

    synth.ensure_corpus(args.scale_docs)  # generate outside any timing

    if args.pair:
        lo, hi = (int(x) for x in args.pair.split(","))
        a = run_leg(lo, args.scale_docs, args.sf_dir, cpuset=args.cpuset)
        time.sleep(5)
        b = run_leg(hi, args.scale_docs, args.sf_dir, cpuset=args.cpuset)
        nominal = (b["docs_per_sec"] / a["docs_per_sec"]) / (hi / lo)
        per_eff = (b["docs_per_sec"] / a["docs_per_sec"]) / (
            b["effective_cores"] / a["effective_cores"]
        )
        print(json.dumps({
            "cpuset_pinned": args.cpuset,
            "legs": [a, b],
            "nominal_ratio": round(nominal, 3),
            "delivered_core_ratio": round(b["effective_cores"] / a["effective_cores"], 2),
            "throughput_per_effective_core_ratio": round(per_eff, 3),
            "cpu_sec_conserved": round(b["tree_cpu_sec"] / a["tree_cpu_sec"], 2),
        }))
    else:
        print(json.dumps(run_leg(args.cpus or 2, args.scale_docs, args.sf_dir,
                                 cpuset=args.cpuset)))


if __name__ == "__main__":
    main()
