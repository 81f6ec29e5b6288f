#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: reads Verify output
(parquet per query + oracle_sql.json), runs each oracle in DuckDB over the
same testdata tables, and diffs. Usage:
    python3 tools/check.py /tmp/verify_out [/root/testdata/sf0.01]
"""
import json, math, sys, glob, os
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return round(v, 6)
    return v

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        spark_glob = f"{out_dir}/{name}/*.parquet"
        if not glob.glob(spark_glob):
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            sdf = con.sql(f"SELECT * FROM '{spark_glob}'").fetchdf()
            rel = con.sql(oracle[name])
            # HUGEINT/UHUGEINT oracle output columns hash differently in the
            # driver than BIGINT even when values are identical (round-3
            # postmortem): sum()/"//" promote silently — force a CAST.
            wide = [f"{c}:{t}" for c, t in zip(rel.columns, map(str, rel.types))
                    if "HUGEINT" in str(t).upper()]
            if wide:
                print(f"FAIL {name}: HUGEINT oracle columns (CAST to BIGINT): {wide}")
                n_fail += 1; continue
            ddf = rel.fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {str(e)[:300]}"); n_fail += 1; continue
        scols, dcols = sorted(sdf.columns), sorted(ddf.columns)
        if scols != dcols:
            print(f"FAIL {name}: columns spark={scols} duck={dcols}"); n_fail += 1; continue
        sdf, ddf = sdf[scols], ddf[dcols]
        if len(sdf) != len(ddf):
            print(f"FAIL {name}: rows spark={len(sdf)} duck={len(ddf)}"); n_fail += 1; continue
        srows = sorted([tuple(norm(v) for v in r) for r in sdf.itertuples(index=False)], key=repr)
        drows = sorted([tuple(norm(v) for v in r) for r in ddf.itertuples(index=False)], key=repr)
        bad = [(a, b) for a, b in zip(srows, drows) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(srows)} rows differ; first: spark={bad[0][0]} duck={bad[0][1]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    sys.exit(main(out, sf))
