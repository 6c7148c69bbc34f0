#!/usr/bin/env bash
# One-command durable round record (dev tool): full correctness dump +
# local DuckDB compare -> CORRECTNESS_LOCAL_r{N}.json, then the official
# bench line. Usage: tools/round_record.sh <roundN> [sfDir] [benchSfDir]
# The dump writes oracle_sql.json FIRST and streams per-query results
# (progress.jsonl), so a timeout truncates rather than zeroes the record.
set -euo pipefail
cd "$(dirname "$0")/.."
N="${1:?usage: round_record.sh <roundN> [sfDir] [benchSfDir]}"
SF="${2:-/root/testdata/sf0.01}"
BSF="${3:-/root/testdata/sf0.1}"
OUT="/tmp/verify_record_r$N"
rm -rf "$OUT"
sbt -batch "runMain graft.Verify $SF $OUT"
python3 tools/check.py "$SF" "$OUT" --json "CORRECTNESS_LOCAL_r$N.json" \
  | tail -1
SPARK_GRAFT_SF_DIR="$BSF" sbt -batch "runMain graft.Bench" 2>/dev/null \
  | grep '"metric"' | sed 's/^\[info\] //' > "BENCH_LOCAL_r$N.json" || true
echo "record: CORRECTNESS_LOCAL_r$N.json + BENCH_LOCAL_r$N.json + CORRECTNESS_SELF.json (commit them)"
