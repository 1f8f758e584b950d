#!/bin/bash
# The bench commit routine: run a clean graft.Bench at sf0.1, then gate the
# per-query numbers against the committed baseline (bench_baseline.json).
# Run this ALONE — any concurrent Spark JVM inflates timings 20-50%.
# On an accepted run: cp bench_out.json bench_baseline.json && git add both.
set -e
cd "$(dirname "$0")/.."
if pgrep -f "org.apache.spark\|graft.Bench\|graft.Verify" >/dev/null 2>&1; then
  echo "WARNING: another Spark JVM is running — numbers will be polluted" >&2
fi
SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" \
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
  tools/run.sh graft.Bench "$@"
if [ -f bench_baseline.json ]; then
  python3 tools/bench_delta.py bench_baseline.json bench_out.json \
    || { echo "bench_delta: REGRESSIONS — investigate before committing" >&2; exit 1; }
fi
