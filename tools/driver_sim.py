"""Simulates the driver: builds its OWN plain SparkSession (none of our
configs), imports __spark_entry__ by path, smoke-checks entry(), then runs
every queries() entry at sf0.01 against oracle_sql() via duckdb with an
order-insensitive value-hash."""
import hashlib, importlib.util, sys
import duckdb
from pyspark.sql import SparkSession

spec = importlib.util.spec_from_file_location("spark_entry", "/root/repo/__spark_entry__.py")
m = importlib.util.module_from_spec(spec); spec.loader.exec_module(m)

spark = SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()  # plain session: no UTC, no nanos flag

df = m.entry(spark)
rows = df.collect()
print("SMOKE entry rows:", len(rows), "cols:", df.columns)
assert len(rows) > 0

import os
SF = os.environ.get("DRIVER_SIM_SF_DIR", "/root/testdata/sf0.01")
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def h(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted("|".join(repr(r[i]) for i in order) for r in rows)
    return hashlib.md5("\n".join(canon).encode()).hexdigest()

qs, os_ = m.queries(), m.oracle_sql()
bad = 0
for name, fn in sorted(qs.items()):
    sdf = fn(spark, SF)
    s_rows = [tuple(r) for r in sdf.collect()]
    s_cols = sdf.columns
    if name not in os_:
        print(f"{name}: rows-only, {len(s_rows)} rows"); continue
    cur = con.execute(os_[name])
    o_cols = [d[0] for d in cur.description]
    o_rows = cur.fetchall()
    status = []
    if len(s_rows) != len(o_rows): status.append(f"ROWS {len(s_rows)}!={len(o_rows)}")
    if sorted(s_cols) != sorted(o_cols): status.append(f"COLS {sorted(s_cols)}!={sorted(o_cols)}")
    if not status and h(s_rows, s_cols) != h(o_rows, o_cols): status.append("HASH MISMATCH")
    if status:
        bad += 1; print(f"{name}: FAIL {status}")
    else:
        print(f"{name}: MATCH ({len(s_rows)} rows)")
print("FAILURES:", bad)
sys.exit(1 if bad else 0)
