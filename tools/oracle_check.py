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
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.dataset as ds

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def type_lint(schema, side):
    """Driver-hash type stability: every surfaced column must be an
    engine-portable type.  DECIMAL (round 1) and HUGEINT→decimal128
    (round 4) both hash-mismatch against Spark's int64 while VALUES are
    identical — ban the whole class so an uncast SUM can never ship.
    Floats are banned too (integer minor units only, see MEMORY)."""
    def leaves(t):
        """All leaf types reachable through list/struct/map nesting —
        a DECIMAL hiding inside a struct field is just as banned as a
        top-level one."""
        if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
            return leaves(t.value_type)
        if pa.types.is_struct(t):
            return [lt for i in range(t.num_fields) for lt in leaves(t.field(i).type)]
        if pa.types.is_map(t):
            return leaves(t.key_type) + leaves(t.item_type)
        return [t]
    bad = []
    for f in schema:
        for inner in leaves(f.type):
            if (pa.types.is_decimal(inner) or pa.types.is_floating(inner)
                    or pa.types.is_float16(inner)):
                bad.append(f"{side}.{f.name}:{f.type}")
                break
    return bad

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
    n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            atbl = con.execute(sql).fetch_arrow_table()
            dcols = atbl.column_names
            drows = [tuple(atbl.column(c)[i].as_py() for c in dcols)
                     for i in range(atbl.num_rows)]
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        try:
            tbl = ds.dataset(f"{out_dir}/{name}").to_table()
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {e}")
            n_fail += 1
            continue
        scols = tbl.column_names
        srows = [tuple(tbl.column(c)[i].as_py() for c in scols)
                 for i in range(tbl.num_rows)]
        # type-stability lint: banned arrow types on either side, then
        # per-column arrow-type drift between the two sides (the driver
        # hashes typed values, so int64-vs-hugeint fails even when every
        # value is equal).
        bad = type_lint(atbl.schema, "duckdb") + type_lint(tbl.schema, "spark")
        stypes = {f.name: f.type for f in tbl.schema}
        for f in atbl.schema:
            st = stypes.get(f.name)
            if st is not None and not type_compatible(st, f.type):
                bad.append(f"drift.{f.name}: spark={st} duckdb={f.type}")
        if bad:
            print(f"FAIL {name}: type lint: {bad}")
            n_fail += 1
            continue
        dc, dr = canon(dcols, drows)
        sc, sr = canon(scols, srows)
        if dc != sc:
            print(f"FAIL {name}: columns differ spark={sc} duckdb={dc}")
            n_fail += 1
        elif dr != sr:
            diffs = [(a, b) for a, b in zip(sr, dr) if a != b]
            print(f"FAIL {name}: rows differ (spark {len(sr)} vs duckdb {len(dr)}); "
                  f"first diffs: {diffs[:3]}"
                  + (f" spark-only: {sr[:2]} duck-only: {dr[:2]}" if len(sr) != len(dr) else ""))
            n_fail += 1
        else:
            n_ok += 1
            print(f"OK   {name} ({len(sr)} rows)")
    print(f"{n_ok}/{len(oracle)} oracles match")
    sys.exit(1 if n_fail else 0)


def type_compatible(spark_t, duck_t):
    """Equal types, or both integer (DuckDB literals/CASTs may surface
    int32 where Spark writes int64 — the driver's hash normalizes
    plain-int widths via as_py, unlike decimal/hugeint)."""
    if spark_t.equals(duck_t):
        return True
    if pa.types.is_integer(spark_t) and pa.types.is_integer(duck_t):
        return True
    # string vs large_string are hash-identical after as_py
    if ((pa.types.is_string(spark_t) or pa.types.is_large_string(spark_t))
            and (pa.types.is_string(duck_t) or pa.types.is_large_string(duck_t))):
        return True
    return False

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
