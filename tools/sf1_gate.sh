#!/bin/sh
# Full-gate reproduction at sf1 (SCALE.md "Measured at sf1").
# Builds the 10x corpus, dumps every graded query with Spark, compares
# all of them against the DuckDB oracle, and runs the plan-shape specs.
set -e
SF1=${1:-/tmp/graft_sf1}
OUT=${2:-/tmp/graft_sf1_out}
python3 tools/gen_sf1.py /root/testdata/sf0.1 "$SF1"
rm -rf "$OUT"
sbt -batch "runMain graft.Verify $SF1 $OUT"
# isolate each oracle replay in its own process: the sf1-scale CDC and
# closure oracles have peaked past what one long-lived DuckDB process
# can absorb back-to-back (see tools/check.py run_oracle)
GRAFT_CHECK_ISOLATE=1 python3 tools/check.py "$SF1" "$OUT"
SPARK_GRAFT_SF1_DIR="$SF1" sbt -batch "testOnly graft.ScaleSpec"
