#!/usr/bin/env python
"""Benchmark harness.

Default: runs the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) under ray.init(num_cpus=$RAY_GRAFT_CPUS, default
32) and prints ONE JSON line:
  {"metric": ..., "value": <flagship sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, ...}

--scaling: runs the flagship twice in FRESH processes at num_cpus=8 and
num_cpus=32 on the same input and reports both throughputs plus the
N→4N scaling efficiency (the sandbox proxy for the two-cluster-size
criterion in BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# --scaling uses a larger fixed corpus so the parallel-compute fraction
# dominates the per-exchange barrier overhead (same input at both levels)
SCALE_DOCS = int(os.environ.get("GRAFT_SCALE_DOCS", "600000"))
# N and 4N parallelism levels for the two-cluster-size proxy.  Default
# 2→8: a plain-multiprocessing control experiment (BASELINE.md) shows
# this VM's memory bandwidth stops scaling string workloads past ~8
# cores (8→32 processes is NEGATIVE scaling with no Ray involved), so
# 8→32 measures the box, not the engine.  Override: GRAFT_SCALE_CPUS="8,32".
SCALE_CPUS = tuple(
    int(x) for x in os.environ.get("GRAFT_SCALE_CPUS", "2,8").split(",")
)
# flagship trials per bench run (VERDICT r2 #3: best-of-N, N>=3, so a
# real regression is distinguishable from this VM's +-60% noise)
BENCH_TRIALS = int(os.environ.get("GRAFT_BENCH_TRIALS", "4"))
# Pinned control constant: wall seconds of control_workload() measured on
# this box in a quiet window (r4 2026-08-18, BASELINE.md scaling table:
# the identical 100k-doc/64-task/8-proc workload measured 4.0 s).
# box_load_factor = control_sec / CONTROL_REF_SEC; *_normalized =
# raw / box_load_factor.  The control is Ray-FREE (multiprocessing over
# fixed bytes), so it measures the box, not the engine.
#
# r4 control upgrade: the previous control (20k docs, 16 tasks, ref
# 1.35 s) was too SHORT to expose sustained memory-bandwidth contention
# from co-tenant VMs — measured side-by-side on a degraded afternoon
# (2026-08-18): 20k control 1.45 s (factor 1.08) while the 100k control
# read 11.9 s vs its 4.0 s quiet-window pin (factor 2.98) and every Ray
# pipeline ran ~2-3x its quiet-window wall.  The longer control tracks
# the degradation the pipelines actually see.
# r5 (ADVICE r4): env override renamed GRAFT_CONTROL_REF_SEC →
# GRAFT_CONTROL100K_REF_SEC when the control workload changed from the
# 20k/16-task job (ref 1.35 s) to the 100k/64-task job (ref 4.0 s) — an
# environment still pinning the old name would silently compute ~3×-wrong
# box_load_factor, so the old name is now ignored with a loud warning.
if "GRAFT_CONTROL_REF_SEC" in os.environ:
    print(
        "WARNING: GRAFT_CONTROL_REF_SEC is IGNORED — the control workload "
        "changed in r4 (100k docs/64 tasks, quiet-window ref 4.0 s); set "
        "GRAFT_CONTROL100K_REF_SEC to override the new pin.",
        file=sys.stderr,
    )
CONTROL_REF_SEC = float(os.environ.get("GRAFT_CONTROL100K_REF_SEC", "4.0"))

# Code-pinned control (VERDICT r4 #4): one flagship trial of a FROZEN
# commit per bench session, run from a detached git worktree in a fresh
# process after the live trials.  The 100k mp control under-tracks
# pipeline-visible contention (r4: control factor 1.30 during a measured
# ~2.3-2.6× pipeline degradation); a frozen-code flagship trial measures
# exactly what the pipelines see.  pinned_load_factor =
# pinned_code_sec / PINNED_REF_SEC (quiet-window wall of the SAME commit,
# recorded in BASELINE.md).  Disable with GRAFT_PINNED_CONTROL=0.
PINNED_COMMIT = os.environ.get("GRAFT_PINNED_COMMIT", "f4881fe")
# quiet-window wall of PINNED_COMMIT's flagship, keyed by SF (the pin is
# only meaningful for the SF it was measured at; BENCH_r03 recorded
# 26.5 s at sf0.1).  At an unpinned SF pinned_code_sec is still reported
# but no load factor is derived from it.
_PINNED_REF_BY_SF = {"0.1": 26.5}
_pin_env = os.environ.get("GRAFT_PINNED_REF_SEC")
PINNED_REF_SEC = (
    float(_pin_env)
    if _pin_env
    else _PINNED_REF_BY_SF.get(
        os.path.basename(os.path.normpath(SF_DIR)).replace("sf", "")
    )
)


def pinned_code_control() -> float | None:
    """Run one flagship trial of PINNED_COMMIT (same SF_DIR / CPU count,
    GRAFT_BENCH_TRIALS=1) in a fresh process from a cached /tmp worktree;
    returns its flagship wall seconds, or None if disabled/unavailable."""
    if os.environ.get("GRAFT_PINNED_CONTROL", "1") != "1":
        return None
    repo = os.path.dirname(os.path.abspath(__file__))
    wt = f"/tmp/osmray_pinned_{PINNED_COMMIT}"
    try:
        if not os.path.exists(os.path.join(wt, "bench.py")):
            subprocess.run(
                ["git", "worktree", "add", "--detach", "--force", wt, PINNED_COMMIT],
                cwd=repo, check=True, capture_output=True, timeout=120,
            )
        env = dict(
            os.environ,
            GRAFT_BENCH_TRIALS="1",
            GRAFT_PINNED_CONTROL="0",  # recursion guard if the pin advances
            GRAFT_SF_DIR=SF_DIR,
            RAY_GRAFT_CPUS=str(NUM_CPUS),
        )
        p = subprocess.run(
            [sys.executable, os.path.join(wt, "bench.py"), "--flagship-only"],
            cwd=wt, env=env, capture_output=True, text=True, timeout=1800,
        )
        line = [l for l in p.stdout.strip().splitlines() if l.startswith("{")][-1]
        return float(json.loads(line)["flagship_sec"])
    except Exception as e:  # noqa: BLE001 — a control must never fail the bench
        print(f"WARNING: pinned-code control skipped: {e!r}", file=sys.stderr)
        return None


def control_workload(procs: int = 8, trials: int = 2) -> float:
    """Fixed Ray-free control: parse a pinned 100k-doc corpus with a
    multiprocessing pool — the exact `tools/mp_scaling_control.py`
    workload whose quiet-window wall (4.0 s @ 8 procs) is recorded in
    BASELINE.md.  Run in the SAME session as the flagship trials to
    normalize out box load; returns best-of-``trials`` wall seconds."""
    import multiprocessing as mp

    from osm2geojson_ray import synth
    from tools.mp_scaling_control import work

    path = synth.ensure_corpus(100000)
    n, tasks = 100000, 64
    chunks = [(path, i * n // tasks, (i + 1) * n // tasks) for i in range(tasks)]
    best = None
    for _ in range(trials):
        t0 = time.perf_counter()
        with mp.get_context("fork").Pool(procs) as p:
            p.map(work, chunks)
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    return best


def _init_ray(num_cpus: int):
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False


def corpus_stats(corpus: str) -> dict:
    import pyarrow.dataset as pads
    import pyarrow.compute as pc

    t = pads.dataset(corpus, format="parquet").to_table(columns=["doc_id", "spans"])
    n_spans = int(pc.sum(pc.list_value_length(t.column("spans"))).as_py())
    return {"n_docs": t.num_rows, "n_spans": n_spans}


def run_flagship(num_parts: int | str, n_docs: int | None = None) -> dict:
    """documents → parse → join DAG → features → vertex tiles, end-to-end."""
    import ray.data as rd

    from osm2geojson_ray import synth
    from osm2geojson_ray.pipelines.osm import OsmPipelineConfig, build
    from osm2geojson_ray.sources.documents import read_documents
    from osm2geojson_ray.stages.tiling import vertex_cells

    corpus = (
        synth.ensure_corpus(n_docs) if n_docs else synth.ensure_corpus_for_sf(SF_DIR)
    )
    stats = corpus_stats(corpus)

    # warm the worker pool so process spawn isn't attributed to the pipeline
    rd.range(NUM_CPUS * 2).map_batches(lambda b: b).materialize()

    # Read-task sizing.  The synth corpus is many 2000-doc files; Ray's
    # default read makes ~1.7 MB blocks whose per-task dispatch dominates
    # at low CPU counts (interleaved A/B at 8 CPUs: elements stage
    # 10.7-15.5 s default vs 4.7-6.2 s at 32 read blocks, flagship faster
    # in every round).  Default: max(32, 4×CPUs, bytes/64MB) — byte term
    # keeps blocks bounded on a huge corpus, CPU term keeps every core
    # fed, 32 floor keeps read→extract pipelining fine-grained enough.
    # GRAFT_READ_BLOCKS overrides.
    corpus_bytes = sum(
        e.stat().st_size for e in os.scandir(corpus) if e.name.endswith(".parquet")
    )
    read_blocks = int(
        os.environ.get("GRAFT_READ_BLOCKS", 0)
    ) or min(
        max(32, 4 * NUM_CPUS, corpus_bytes // (64 * 1024 * 1024)),
        # don't over-split a tiny corpus below ~1 MB per read block
        max(8, corpus_bytes // (1024 * 1024)),
    )
    read_kw = {"override_num_blocks": read_blocks}

    trials: list[float] = []
    best_stages: dict = {}
    out: dict = {}
    for _trial in range(max(1, BENCH_TRIALS if n_docs is None else 1)):
        stages: dict = {}
        t0 = time.perf_counter()
        g = build(
            read_documents(corpus, **read_kw),
            OsmPipelineConfig(num_parts=num_parts),
            stage_timings=stages,
        )
        t1 = time.perf_counter()
        features = g["features"].materialize()
        stages["features"] = round(time.perf_counter() - t1, 3)
        n_elements = g["elements"].count()
        t2 = time.perf_counter()
        tiles = vertex_cells(
            features, 15, num_parts=stages.get("_num_parts", 32)
        ).materialize()
        stages["tiles"] = round(time.perf_counter() - t2, 3)
        wall = round(time.perf_counter() - t0, 3)
        trials.append(wall)
        if wall == min(trials):
            best_stages = stages
            out = {
                "n_elements": n_elements,
                "n_features": features.count(),
                "n_tiles": tiles.count(),
            }
    wall = min(trials)
    return {
        "flagship_sec": wall,
        "flagship_trials": trials,
        "stage_sec": best_stages,
        "n_docs": stats["n_docs"],
        "n_spans": stats["n_spans"],
        **out,
        "docs_per_sec": stats["n_docs"] / wall,
        "elements_per_sec": out["n_elements"] / wall,
    }


def run_queries() -> dict:
    """Representative per-operator timings at the bench SF."""
    import ray.data as rd

    from osm2geojson_ray.pipelines.training import _read_clean
    from osm2geojson_ray.stages import dedup as D
    from osm2geojson_ray.stages import events as EV
    from osm2geojson_ray.stages import similarity as S
    from osm2geojson_ray.stages import text as T

    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        ds = fn()
        n = ds.count()
        timings[name] = round(time.perf_counter() - t0, 4)
        return n

    docs = lambda cols: _read_clean(f"{SF_DIR}/documents.parquet", columns=cols)  # noqa: E731
    timed("token_stats", lambda: T.token_stats(docs(["doc_id", "text"])))
    timed("text_quality", lambda: T.quality(docs(["doc_id", "text"])))
    timed("dedup_exact", lambda: D.dedup_exact(docs(["doc_id", "text"])))
    timed("minhash_pairs", lambda: D.dedup_minhash_pairs(docs(["doc_id", "text"])))
    timed("dedup_clusters", lambda: D.dedup_clusters(docs(["doc_id", "text"])))
    timed(
        "jaccard_pairs",
        lambda: D.ngram_jaccard_pairs(docs(["doc_id", "text", "source"])),
    )
    timed(
        "ann_bruteforce",
        lambda: S.ann_bruteforce(
            _read_clean(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
        ),
    )
    timed(
        "events_window",
        lambda: EV.windowed_agg(
            _read_clean(f"{SF_DIR}/events.parquet", columns=["event_id", "ts", "user_id", "value"])
        ),
    )
    timed(
        "sessionize",
        lambda: EV.sessionize(
            _read_clean(f"{SF_DIR}/events.parquet", columns=["event_id", "ts", "user_id"])
        ),
    )
    timed(
        "lineitem_agg",
        lambda: EV.lineitem_pricing_summary(
            _read_clean(
                f"{SF_DIR}/lineitem.parquet",
                columns=["l_returnflag", "l_linestatus", "l_quantity"],
            )
        ),
    )
    timed(
        "asof_join",
        lambda: EV.asof_join(
            _read_clean(
                f"{SF_DIR}/events.parquet",
                columns=["event_id", "ts", "user_id", "event_type"],
            )
        ),
    )
    timed(
        "band_join",
        lambda: EV.band_join_count(
            _read_clean(
                f"{SF_DIR}/events.parquet",
                columns=["event_id", "value", "event_type"],
            )
        ),
    )

    from osm2geojson_ray.stages.quantiles import grouped_quantiles
    from osm2geojson_ray.stages.relational import order_revenue
    from osm2geojson_ray.stages.sketch import hll_registers

    t0 = time.perf_counter()
    qt = grouped_quantiles(
        _read_clean(f"{SF_DIR}/events.parquet", columns=["event_type", "value"]),
        "value", "event_type", gather_cap=256,
    )
    assert qt.num_rows > 0
    timings["event_quantiles"] = round(time.perf_counter() - t0, 4)
    timed(
        "order_revenue",
        lambda: order_revenue(
            _read_clean(
                f"{SF_DIR}/lineitem.parquet",
                columns=["l_orderkey", "l_extendedprice", "l_discount"],
            )
        ),
    )
    timed(
        "hll_users",
        lambda: hll_registers(
            _read_clean(f"{SF_DIR}/events.parquet", columns=["event_type", "user_id"]),
            "user_id", "event_type",
        ),
    )
    from osm2geojson_ray.stages.relational import orders_revenue_topn

    timed(
        "orders_topn",
        lambda: orders_revenue_topn(
            _read_clean(
                f"{SF_DIR}/lineitem.parquet",
                columns=["l_orderkey", "l_extendedprice", "l_discount"],
            ),
            _read_clean(
                f"{SF_DIR}/orders.parquet",
                columns=["o_orderkey", "o_custkey", "o_orderdate"],
            ),
            _read_clean(
                f"{SF_DIR}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
            ),
        ),
    )
    return timings


def main_bench(flagship_only: bool = False, n_docs: int | None = None) -> dict:
    # control BEFORE ray.init: a Ray-free box-load probe in the same session
    control_sec = control_workload()
    _init_ray(NUM_CPUS)
    # partition count is sized to the DATA (ceil(bytes/64MB), r5 auto rule
    # in functions.grouping.auto_num_parts).  At the scaling corpus both
    # the N and 4N legs resolve to the SAME count (the byte term dominates
    # the parallelism floor), so the job stays identical across the pair.
    flag = run_flagship("auto", n_docs=n_docs)
    queries = {} if flagship_only else run_queries()
    import ray

    ray.shutdown()
    sf = os.path.basename(os.path.normpath(SF_DIR)).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = None
    box = control_sec / CONTROL_REF_SEC
    out = {
        "metric": "osm_docs_end_to_end",
        "value": round(flag["flagship_sec"], 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf_val,
        "num_cpus": NUM_CPUS,
        # box-load normalization (VERDICT r2 #3): control_sec is the
        # pinned Ray-free workload measured in THIS session;
        # value_normalized = value / (control_sec / CONTROL_REF_SEC).
        # Compare value_normalized across rounds to detect regressions.
        "control_sec": round(control_sec, 3),
        "control_ref_sec": CONTROL_REF_SEC,
        "box_load_factor": round(box, 3),
        "value_normalized": round(flag["flagship_sec"] / box, 3),
        **{k: (round(v, 2) if isinstance(v, float) else v) for k, v in flag.items()},
    }
    # code-pinned control AFTER shutdown (no resource overlap with the
    # live session) and only for top-level bench runs, not scaling legs
    if n_docs is None:
        pinned = pinned_code_control()
        if pinned is not None:
            out["pinned_code_sec"] = round(pinned, 3)
            if PINNED_REF_SEC:  # ref pin known for this SF
                out["pinned_ref_sec"] = PINNED_REF_SEC
                out["pinned_load_factor"] = round(pinned / PINNED_REF_SEC, 3)
                out["value_pinned_normalized"] = round(
                    flag["flagship_sec"] / (pinned / PINNED_REF_SEC), 3
                )
    return out


def main_scaling(cpuset: bool = False) -> dict:
    """Fresh-process runs at N and 4N CPUs on the same fixed corpus
    (GRAFT_SCALE_DOCS docs), best of two trials per level, a settle pause
    between legs (ray shutdown reaps asynchronously).

    --cpuset (or GRAFT_SCALE_CPUSET=1) pins each leg's whole process tree
    to exactly its nominal core count via taskset: the r4 CPU-metered
    adjudication (BASELINE.md) showed UNPINNED low-CPU legs leak
    parallelism — the driver + object-store IO threads run on cores the
    nominal count doesn't own (a 1-CPU leg finished in fewer total CPU·s
    than an 8-CPU leg while drawing >1 core), overstating the small-leg
    denominator in every nominal ratio.  A pinned leg is the faithful
    two-cluster-size proxy: an N-core cluster node has no spare cores to
    leak onto."""
    from osm2geojson_ray import synth

    synth.ensure_corpus(SCALE_DOCS)  # generate once, outside any timing
    n, n4 = SCALE_CPUS
    results: dict[int, dict] = {}
    for cpus in (n, n4):
        best = None
        for _trial in range(2):
            env = dict(os.environ, RAY_GRAFT_CPUS=str(cpus), GRAFT_SF_DIR=SF_DIR)
            argv = [sys.executable, os.path.abspath(__file__), "--flagship-only",
                    "--scale-docs", str(SCALE_DOCS)]
            if cpuset:
                argv = ["taskset", "-c", f"0-{cpus - 1}"] + argv
            p = subprocess.run(
                argv, env=env, capture_output=True, text=True, timeout=3600,
            )
            line = [l for l in p.stdout.strip().splitlines() if l.startswith("{")][-1]
            r = json.loads(line)
            if best is None or r["value"] < best["value"]:
                best = r
            time.sleep(10)
        results[cpus] = best
    thr_n = results[n]["docs_per_sec"]
    thr_4n = results[n4]["docs_per_sec"]
    eff = (thr_4n / thr_n) / (n4 / n)
    return {
        "metric": f"scaling_efficiency_{n}_to_{n4}"
        + ("_cpuset" if cpuset else ""),
        "cpuset_pinned": cpuset,
        "value": round(eff, 4),
        "unit": "ratio",
        "throughput_docs_per_sec": {str(n): round(thr_n, 2), str(n4): round(thr_4n, 2)},
        "flagship_sec": {str(n): results[n]["value"], str(n4): results[n4]["value"]},
        "scale_docs": SCALE_DOCS,
        "n_elements": results[n4].get("n_elements"),
        "sf": results[n4]["sf"],
        "num_cpus": n4,
        "queries": {},
    }


def _parse_scale_docs() -> int | None:
    if "--scale-docs" in sys.argv:
        return int(sys.argv[sys.argv.index("--scale-docs") + 1])
    return None


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        pin = ("--cpuset" in sys.argv
               or os.environ.get("GRAFT_SCALE_CPUSET", "0") == "1")
        print(json.dumps(main_scaling(cpuset=pin)))
    else:
        print(json.dumps(main_bench("--flagship-only" in sys.argv, _parse_scale_docs())))
