#!/bin/sh
# Full local verification: unit/fixture tests, oracle self-check, bench smoke.
set -e
cd "$(dirname "$0")/.."
echo "== pytest =="
python -m pytest tests/ -x -q
echo "== oracle self-check (sf0.01) =="
python tools/selfcheck.py /root/testdata/sf0.01
echo "== bench (flagship only) =="
python bench.py --flagship-only
echo "ALL OK"
