"""Self-check harness replicating the driver's correctness gate:
runs every queries() entry and its oracle_sql() side-by-side on a sf dir
and compares row count, schema, and order-insensitive values.

Usage: python tools/selfcheck.py [sf_dir] [query ...]

NOTE: oracle_sql() is pinned to the driver's gate scale (sf0.01): the
OSM/document oracles read the sf0.01-derived corpus by absolute path and
ann_lsh embeds sf0.01-shaped LSH planes. Running this tool against any
other sf dir makes those queries mismatch BY DESIGN (Ray side at sf_dir
vs oracle at sf0.01) — only the driver-table queries (text/dedup/events)
are meaningful off-sf0.01.
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> list[str]:
    problems = []
    if len(ray_df) != len(sql_df):
        problems.append(f"row count {len(ray_df)} vs {len(sql_df)}")
    rc = set(ray_df.columns)
    sc = set(sql_df.columns)
    if rc != sc:
        problems.append(f"columns {sorted(rc)} vs {sorted(sc)}")
        return problems
    a, b = canon(ray_df), canon(sql_df)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c], b[c]
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                import numpy as np

                av = av.astype(float)
                bv = bv.astype(float)
                both_nan = av.isna() & bv.isna()
                if not ((av == bv) | both_nan).all():
                    bad = (~((av == bv) | both_nan)).idxmax()
                    problems.append(f"col {c} differs, e.g. row {bad}: {av[bad]!r} vs {bv[bad]!r}")
            else:
                if not (av.astype(str) == bv.astype(str)).all():
                    bad = (av.astype(str) != bv.astype(str)).idxmax()
                    problems.append(f"col {c} differs, e.g. row {bad}: {av[bad]!r} vs {bv[bad]!r}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    if "sf0.01" not in sf_dir:
        print(f"WARNING: oracles are pinned to sf0.01; corpus-derived queries "
              f"will mismatch by design at {sf_dir} (see module docstring)")

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, ".")
    import __ray_entry__ as E

    # the local check is cheap for all 55 — always use the FULL registry
    # (the driver-view filter exists for driver wall-time, not here), so
    # a full run still oracle-checks the 5 consolidated queries
    queries = E.queries(full=True)
    oracles = E.oracle_sql()
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        except Exception:
            pass

    import time

    n_fail = 0
    t_total0 = time.perf_counter()
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            res = fn(sf_dir)
            if hasattr(res, "to_pandas"):
                ray_df = res.to_pandas()
            else:
                ray_df = pd.DataFrame(res)
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL] {name}: ray side raised: {e!r}", flush=True)
            n_fail += 1
            continue
        t_ray = time.perf_counter() - t0
        if name not in oracles:
            print(f"[rows-only] {name}: {len(ray_df)} rows (ray {t_ray:.1f}s)",
                  flush=True)
            continue
        t0 = time.perf_counter()
        try:
            sql_df = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL] {name}: oracle raised: {e!r}", flush=True)
            n_fail += 1
            continue
        t_sql = time.perf_counter() - t0
        problems = compare(name, ray_df, sql_df)
        timing = f"(ray {t_ray:.1f}s, sql {t_sql:.1f}s)"
        if problems:
            print(f"[FAIL] {name}: " + "; ".join(problems) + f" {timing}", flush=True)
            n_fail += 1
        else:
            print(f"[ok] {name}: {len(ray_df)} rows {timing}", flush=True)
    print(f"TOTAL {time.perf_counter() - t_total0:.1f}s", flush=True)
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
