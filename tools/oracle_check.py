#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf dir and compare to the Spark result parquet
(column-name-sorted, row-sorted, value-normalized). Dev tool only — the
engine itself is pure Scala/Spark."""
import json, sys, math
import duckdb
import pyarrow.parquet as pq
import pyarrow.dataset as ds

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft-verify-out"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

oracle = json.load(open(f"{out}/oracle_sql.json"))

def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)

def table_rows(tbl):
    cols = sorted(tbl.column_names)
    data = [tbl.column(c).to_pylist() for c in cols]
    rows = ["\x01".join(norm(col[i]) for col in data) for i in range(tbl.num_rows)]
    return cols, sorted(rows)

fails = 0
for name, sql in sorted(oracle.items()):
    try:
        spark_tbl = ds.dataset(f"{out}/{name}", format="parquet").to_table()
        duck_tbl = con.execute(sql).fetch_arrow_table()
        sc, sr = table_rows(spark_tbl)
        dc, dr = table_rows(duck_tbl)
        if sc != dc:
            print(f"FAIL {name}: columns spark={sc} duck={dc}")
            fails += 1
        elif sr != dr:
            n = sum(1 for a, b in zip(sr, dr) if a != b) + abs(len(sr) - len(dr))
            print(f"FAIL {name}: rows spark={len(sr)} duck={len(dr)}, {n} differing")
            for a, b in list(zip(sr, dr))[:200]:
                if a != b:
                    print(f"   spark: {a[:160]}")
                    print(f"   duck : {b[:160]}")
                    break
            fails += 1
        else:
            print(f"OK   {name}: {len(sr)} rows")
    except Exception as e:
        print(f"ERROR {name}: {type(e).__name__}: {str(e)[:300]}")
        fails += 1

# rows-only queries
import os
for name in sorted(os.listdir(out)):
    p = os.path.join(out, name)
    if os.path.isdir(p) and name not in oracle:
        try:
            n = ds.dataset(p, format="parquet").to_table().num_rows
            print(f"{'OK  ' if n > 0 else 'WARN'} {name}: rows-only, {n} rows")
            if n == 0:
                fails += 1
        except Exception as e:
            print(f"ERROR {name}: {e}")
            fails += 1

print(f"\n{'ALL OK' if fails == 0 else f'{fails} FAILURES'}")
sys.exit(1 if fails else 0)
