#!/usr/bin/env python3
"""Local simulation of the driver's DuckDB-oracle compare (t2).

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json, runs the SQL in DuckDB
with each testdata parquet registered as a view, loads the Spark result
parquet, sorts columns by name and rows by all columns, and compares
values (floats to 9 significant digits).  Dev-only tool — NOT part of the
Scala engine.
"""
import json, sys, math
import duckdb
import pyarrow.parquet as pq
import pyarrow.dataset as ds

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return repr(v)

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = 0
    for name, sql in sorted(oracle.items()):
        try:
            res = con.execute(sql)
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        try:
            tbl = ds.dataset(f"{out_dir}/{name}").to_table()
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {e}")
            continue
        scols = tbl.column_names
        srows = [tuple(tbl.column(c)[i].as_py() for c in scols)
                 for i in range(tbl.num_rows)]
        dc, dr = canon(dcols, drows)
        sc, sr = canon(scols, srows)
        if dc != sc:
            print(f"FAIL {name}: columns differ spark={sc} duckdb={dc}")
        elif dr != sr:
            diffs = [(a, b) for a, b in zip(sr, dr) if a != b]
            print(f"FAIL {name}: rows differ (spark {len(sr)} vs duckdb {len(dr)}); "
                  f"first diffs: {diffs[:3]}"
                  + (f" spark-only: {sr[:2]} duck-only: {dr[:2]}" if len(sr) != len(dr) else ""))
        else:
            n_ok += 1
            print(f"OK   {name} ({len(sr)} rows)")
    print(f"{n_ok}/{len(oracle)} oracles match")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
