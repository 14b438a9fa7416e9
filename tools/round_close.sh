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

echo "== 1/6 plan audit (gates on unexplained cartesian/BNLJ) =="
sbt -batch "runMain graft.PlanAudit"

echo "== 2/6 correctness at $SF01 =="
sbt -batch "runMain graft.Verify $SF01 /tmp/vout_close"
python3 tools/verify_local.py "$SF01" /tmp/vout_close

echo "== 3/6 full test suite =="
sbt -batch test

echo "== 4/6 bench at $SF1 (appends BENCH_HISTORY, self-arbitrates) =="
SPARK_GRAFT_SF_DIR="$SF1" sbt -batch "runMain graft.Bench"
# Stable copy of THE GATE'S bench result: the driver's own post-gate
# sweep overwrites target/bench.json and appends to BENCH_HISTORY.jsonl,
# which is what left two of round 11's four manifest hashes stale
# (round-11 verdict item 3). The gate's numbers live under a name
# nothing else writes.
cp target/bench.json BENCH_GATE_latest.json

echo "== 5/6 DuckDB denominator (median-of-3, ratio_ex_q74) =="
python3 tools/bench_duckdb.py "$SF1" /tmp/vout_close/oracle_sql.json \
  BENCH_GATE_latest.json BENCH_DUCKDB_latest.json

# refresh the user-facing operator index against the newest stamped
# correctness artifact (no-op when nothing changed)
python3 tools/gen_operator_index.py

echo "== 6/6 manifest (round-10 verdict item 7: prove the stamped =="
echo "==       artifacts came from THIS gate run on THIS tree)    =="
python3 - <<'EOF'
import hashlib, json, subprocess, datetime, os, glob

def sha256(p):
    h = hashlib.sha256()
    with open(p, 'rb') as f:
        for chunk in iter(lambda: f.read(1 << 20), b''):
            h.update(chunk)
    return h.hexdigest()

# every hashed artifact is either gate-written-once (stable names) or a
# driver-stamped file that predates the gate; none is rewritten by the
# driver's post-gate sweep, so the manifest hashes stay true against
# the committed tree (round-11 verdict item 3)
arts = ["BENCH_GATE_latest.json", "target/bench.json",
        "target/planaudit.txt", "target/verify_local.json",
        "BENCH_DUCKDB_latest.json"]
# newest driver-stamped correctness + duckdb artifacts present at gate
# time (the round's own CORRECTNESS_r{N}.json is written by the driver
# AFTER this gate; target/verify_local.json above is this gate's own
# correctness evidence for the same tree)
for pat in ("CORRECTNESS_r*.json", "BENCH_DUCKDB_r*.json"):
    stamped = sorted(glob.glob(pat))
    if stamped:
        arts.append(stamped[-1])
hist = open("BENCH_HISTORY.jsonl").read().splitlines() \
    if os.path.exists("BENCH_HISTORY.jsonl") else []
manifest = {
    "generated_by": "tools/round_close.sh",
    "utc": datetime.datetime.now(datetime.timezone.utc)
        .isoformat(timespec="seconds"),
    "git_sha": subprocess.check_output(
        ["git", "rev-parse", "HEAD"]).decode().strip(),
    "git_dirty": bool(subprocess.check_output(
        ["git", "status", "--porcelain"]).decode().strip()),
    "artifacts": {p: sha256(p) for p in arts if os.path.exists(p)},
    # the history is append-only and the driver appends after the gate:
    # anchor the gate's own line (count + its sha) instead of hashing a
    # file that is EXPECTED to grow
    "bench_history": {
        "lines_at_gate": len(hist),
        "gate_line_sha256":
            hashlib.sha256(hist[-1].encode()).hexdigest() if hist else None,
    },
    # the test run the gate just executed, so "558/558 green" is
    # checkable against the same manifest
    "test_reports": sorted(
        os.listdir("target/test-reports"))[:3] + ["..."]
        if os.path.isdir("target/test-reports") else [],
}
with open("ROUND_MANIFEST.json", "w") as f:
    json.dump(manifest, f, indent=1)
print("wrote ROUND_MANIFEST.json:",
      json.dumps(manifest, indent=1)[:400])
EOF

echo "round close complete: planaudit.txt, bench.json," \
  "BENCH_DUCKDB_latest.json, ROUND_MANIFEST.json (commit it" \
  "alongside the stamped artifacts)"
