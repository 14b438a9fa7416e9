#!/usr/bin/env bash
# Round-close discipline (round-10 verdict items 1/2/5): nothing gets
# stamped unaudited or unverified, and the bench artifact carries its
# own guard arbitration. Run from the repo root on a QUIET machine —
# background sbt/Spark JVMs both contend the sweep and append polluted
# baselines to BENCH_HISTORY.jsonl (kill forked `java @/tmp/sbt-args*`
# children, not just the sbt wrapper).
set -euo pipefail

SF01=${SF01:-/root/testdata/sf0.01}
SF1=${SF1:-/root/testdata/sf0.1}

echo "== 1/5 plan audit (gates on unexplained cartesian/BNLJ) =="
sbt -batch "runMain graft.PlanAudit"

echo "== 2/5 correctness at $SF01 =="
sbt -batch "runMain graft.Verify $SF01 /tmp/vout_close"
python3 tools/verify_local.py "$SF01" /tmp/vout_close

echo "== 3/5 full test suite =="
sbt -batch test

echo "== 4/5 bench at $SF1 (appends BENCH_HISTORY, self-arbitrates) =="
SPARK_GRAFT_SF_DIR="$SF1" sbt -batch "runMain graft.Bench"

echo "== 5/5 DuckDB denominator (median-of-3, ratio_ex_q74) =="
python3 tools/bench_duckdb.py "$SF1" /tmp/vout_close/oracle_sql.json \
  target/bench.json BENCH_DUCKDB_latest.json

echo "round close complete: planaudit.txt, bench.json, BENCH_DUCKDB_latest.json"
