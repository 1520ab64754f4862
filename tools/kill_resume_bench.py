"""Bench-scale kill-and-resume evidence (VERDICT r3 #6).

Three timed phases over the sf0.1-sized corpus (300k docs):

  full    — checkpointed flagship, clean workdir, run to completion
  killed  — clean workdir again; SIGKILL the job the moment the
            ``complete_ways`` stage manifest lands (mid-DAG crash)
  resumed — re-submit the identical command; completed stages are
            skipped, only the remainder executes

Prints ONE JSON line; the resume claim holds when ``resumed_sec`` ≈ the
remaining-stages share of ``full_sec`` (and far under a rerun).

    python tools/kill_resume_bench.py [--n-docs 300000] [--num-parts 64]
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cmd(corpus: str, workdir: str, num_parts: int) -> list[str]:
    return [
        sys.executable, "-u", os.path.join(REPO, "tools", "run_pipeline.py"),
        "--input", corpus, "--workdir", workdir, "--num-parts", str(num_parts),
    ]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=300_000)
    ap.add_argument("--num-parts", type=int, default=64)
    ap.add_argument("--kill-after-stage", default="complete_ways")
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    from osm2geojson_ray import synth

    corpus = synth.ensure_corpus(args.n_docs)
    workdir = f"/tmp/osmray_killresume/{args.n_docs}"
    import shutil

    env = dict(os.environ)

    # phase 1: clean full run
    shutil.rmtree(workdir, ignore_errors=True)
    t0 = time.perf_counter()
    subprocess.run(_cmd(corpus, workdir, args.num_parts), check=True, env=env,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL, cwd=REPO)
    full_sec = time.perf_counter() - t0

    # phase 2: clean run, SIGKILL as soon as the target stage checkpoints
    shutil.rmtree(workdir, ignore_errors=True)
    marker = os.path.join(workdir, args.kill_after_stage, "_MANIFEST.json")
    t0 = time.perf_counter()
    proc = subprocess.Popen(_cmd(corpus, workdir, args.num_parts), env=env,
                            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                            cwd=REPO, start_new_session=True)
    killed_after = None
    while proc.poll() is None:
        if os.path.exists(marker):
            killed_after = time.perf_counter() - t0
            os.killpg(proc.pid, signal.SIGKILL)
            break
        time.sleep(0.25)
    proc.wait()
    if killed_after is None:
        print(json.dumps({"error": f"stage {args.kill_after_stage} never checkpointed"}))
        return 1
    # give raylet children a moment to die before restarting Ray
    time.sleep(5)

    completed_at_kill = sorted(
        d for d in os.listdir(workdir)
        if os.path.exists(os.path.join(workdir, d, "_MANIFEST.json"))
    )

    # phase 3: resume
    t0 = time.perf_counter()
    out = subprocess.run(_cmd(corpus, workdir, args.num_parts), check=True, env=env,
                         capture_output=True, text=True, cwd=REPO)
    resumed_sec = time.perf_counter() - t0
    last = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    summary = json.loads(last)

    print(json.dumps({
        "metric": "kill_and_resume",
        "n_docs": args.n_docs,
        "num_parts": args.num_parts,
        "full_sec": round(full_sec, 1),
        "killed_after_sec": round(killed_after, 1),
        "stages_complete_at_kill": completed_at_kill,
        "resumed_sec": round(resumed_sec, 1),
        "resumed_stages": summary["resumed"],
        "executed_after_resume": summary["executed"],
        "saving_vs_full": round(1.0 - resumed_sec / full_sec, 3),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
