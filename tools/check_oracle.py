#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables, load the Spark parquet output from
Verify, sort columns by name + rows by all columns, and compare values.

Usage: check_oracle.py <sfDir> <verifyOutDir>
(Dev-tool only — the shipped library is pure Scala/Spark.)
"""
import json, sys, math
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df):
    # pandas DataFrame -> sorted-by-name columns, rows sorted by stringified tuple
    df = df.reindex(sorted(df.columns), axis=1)
    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "NULL"
        if isinstance(v, float):
            return f"{v!r}"
        return str(v)
    rows = sorted(tuple(cell(v) for v in row) for row in df.itertuples(index=False, name=None))
    return list(df.columns), rows

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            odf = con.sql(sql).df()
            sdf = con.sql(f"FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: load/exec error: {e}")
            n_fail += 1
            continue
        ocols, orows = canon(odf)
        scols, srows = canon(sdf)
        if ocols != scols:
            print(f"FAIL {name}: columns differ spark={scols} oracle={ocols}")
            n_fail += 1
        elif len(orows) != len(srows):
            print(f"FAIL {name}: rowcount spark={len(srows)} oracle={len(orows)}")
            n_fail += 1
        elif orows != srows:
            diff = next(i for i, (a, b) in enumerate(zip(orows, srows)) if a != b)
            print(f"FAIL {name}: values differ at sorted row {diff}:\n  oracle={orows[diff]}\n  spark ={srows[diff]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
