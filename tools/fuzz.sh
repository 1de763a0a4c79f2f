#!/bin/bash
# Differential SQL fuzzing: generate seeded queries, run on Spark, compare
# against DuckDB via the standard oracle harness.
# Usage: tools/fuzz.sh [sfDir] [seed] [count]
set -e
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.01}"
SEED="${2:-42}"
COUNT="${3:-150}"
OUT="/tmp/graft_fuzz_${SEED}"
rm -rf "$OUT"
tools/run.sh graft.tools.Fuzz "$SF" "$OUT" "$SEED" "$COUNT" 2>/dev/null
python3 tools/check.py "$OUT" "$SF"
