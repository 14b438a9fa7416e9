#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run after
`sbt "runMain graft.Verify <sfDir> <outDir>"`, compares each Spark parquet
result against its DuckDB oracle (columns sorted by name, rows sorted,
exact value compare). Usage: verify_local.py <sfDir> <outDir>
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_fail = 0
    status = {}  # per-query verdict for the machine-readable artifact
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            status[name] = "fail:no_output"; n_fail += 1; continue
        try:
            got = canon(con.sql(f"SELECT * FROM '{files[0]}'").df())
            exp = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            status[name] = "fail:exec"; n_fail += 1; continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: cols {list(got.columns)} vs {list(exp.columns)}")
            status[name] = "fail:cols"; n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            status[name] = "fail:rows"; n_fail += 1; continue
        bad = None
        for c in got.columns:
            g, e = got[c], exp[c]
            for i in range(len(g)):
                gv, ev = g.iloc[i], e.iloc[i]
                if gv is None and ev is None:
                    continue
                try:
                    if isinstance(gv, float) or isinstance(ev, float):
                        if (isinstance(gv, float) and math.isnan(gv)) and \
                           (isinstance(ev, float) and math.isnan(ev)):
                            continue
                        if gv != ev:
                            bad = (c, i, gv, ev, abs(gv - ev)); break
                    elif str(gv) != str(ev):
                        bad = (c, i, gv, ev, None); break
                except Exception as ex:
                    bad = (c, i, gv, ev, f"cmperr {ex}"); break
            if bad: break
        if bad:
            c, i, gv, ev, diff = bad
            print(f"FAIL {name}: col={c} row={i} spark={gv!r} duck={ev!r} diff={diff}")
            status[name] = "fail:value"; n_fail += 1
        else:
            # dtype mismatch is a FAIL: the driver hashes canonicalized output,
            # so e.g. DuckDB HUGEINT->float64 vs Spark int64 breaks hash_match
            # even when every value compares equal (round-1 q15/q29/q39).
            dt = [(c, str(got[c].dtype), str(exp[c].dtype))
                  for c in got.columns if str(got[c].dtype) != str(exp[c].dtype)]
            if dt:
                print(f"FAIL {name}: dtype mismatch {dt}")
                status[name] = "fail:dtype"; n_fail += 1
            else:
                print(f"OK   {name} ({len(got)} rows)")
                status[name] = "ok"; n_ok += 1
    print(f"== {n_ok} ok, {n_fail} fail ==")
    # machine-readable summary so the round manifest can hash THIS
    # gate's correctness result (round-11 verdict item 3: the manifest
    # previously had no correctness artifact of its own — the driver's
    # CORRECTNESS_r*.json postdates the gate)
    import os
    os.makedirs("target", exist_ok=True)
    with open("target/verify_local.json", "w") as f:
        json.dump({"sf_dir": sfdir, "out_dir": outdir,
                   "n_ok": n_ok, "n_fail": n_fail,
                   "n_oracle": len(oracle), "status": status}, f, indent=1)
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
