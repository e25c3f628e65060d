"""Simulates the driver: builds its OWN plain SparkSession (none of our
configs), imports __spark_entry__ by path, smoke-checks entry(), then runs
every queries() entry at sf0.01 against oracle_sql() via duckdb.

Two independent checks per query (round-2 lesson — the real driver
canonicalizes through pandas, which the old repr-hash could not see):

1. value parity — strict repr-hash over native collect()/fetchall() rows,
   order-insensitive, column-name-sorted (same as round 1).
2. pandas canonicalization — replicate the driver's observed behavior:
   Spark side via ``toPandas()``, oracle side via duckdb ``.df()``, then
   ``sort_values`` over all columns (this is where the driver crashed on
   unhashable list cells in r1) and a cell-type audit: no Decimal /
   list / ndarray / dict may appear on either side, because the driver's
   hash treats them as opaque objects (Spark object-Decimal vs DuckDB
   float64 hash-mismatched a10 in r1 despite equal values).
3. dtype-kind parity (round-4 lesson — three value-correct queries went
   red because DuckDB sum(BIGINT)/count_if returns HUGEINT, which pandas
   renders float64 while Spark renders int64; ``repr(11.0) != repr(11)``):
   each shared column's pandas dtype *kind* (int/float/bool/object/
   datetime) must match between the Spark ``toPandas()`` frame and the
   DuckDB ``.df()`` frame. Fix mismatches by CASTing the oracle SQL.

Additionally every Spark result schema is audited: ArrayType / MapType /
StructType / DecimalType output columns are banned outright.
"""
import hashlib, importlib.util, sys
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import types as T

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

FORBIDDEN_SPARK = (T.ArrayType, T.MapType, T.StructType, T.DecimalType)
FORBIDDEN_CELL = (Decimal, list, tuple, set, dict, np.ndarray)


def h(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted("|".join(repr(r[i]) for i in order) for r in rows)
    return hashlib.md5("\n".join(canon).encode()).hexdigest()


def pandas_audit(pdf: pd.DataFrame, side: str) -> list[str]:
    """Replicate the driver's pandas canonicalization; return problems."""
    problems = []
    pdf = pdf[sorted(pdf.columns)]
    try:
        pdf.sort_values(by=list(pdf.columns))
    except Exception as e:  # the r1 driver crash: TypeError unhashable list
        problems.append(f"{side} pandas sort_values crash: {type(e).__name__}: {e}")
        return problems
    for c in pdf.columns:
        s = pdf[c]
        if s.dtype.kind == "O":
            nn = s.dropna()
            bad = {type(v).__name__ for v in nn if isinstance(v, FORBIDDEN_CELL)}
            if bad:
                problems.append(f"{side} col {c!r} has opaque cell types {sorted(bad)}")
    return problems


def dtype_audit(spdf: pd.DataFrame, opdf: pd.DataFrame) -> list[str]:
    """Flag columns whose pandas dtype *kind* differs between sides —
    the driver's repr-based hash diverges on int-vs-float alone even
    when every value is equal (r4's HUGEINT reds)."""
    problems = []
    import datetime
    for c in sorted(set(spdf.columns) & set(opdf.columns)):
        sk = "i" if spdf[c].dtype.kind == "u" else spdf[c].dtype.kind
        ok = "i" if opdf[c].dtype.kind == "u" else opdf[c].dtype.kind
        if sk == "O" and ok == "M":
            # Spark DATE -> pandas object(datetime.date) vs DuckDB DATE ->
            # datetime64: proven tolerated by the real driver (a10/a29/b26
            # all have green rows). Only this pairing is exempt.
            nn = spdf[c].dropna()
            if all(type(v) is datetime.date for v in nn):
                continue
        if sk != ok:
            problems.append(
                f"col {c!r} dtype-kind spark={spdf[c].dtype}({sk}) "
                f"vs oracle={opdf[c].dtype}({ok}) — CAST the oracle"
            )
    return problems


qs, os_ = m.queries(), m.oracle_sql()
_all_registered = set(qs)
# DRIVER_SIM_ONLY="window" → just the 50-name graded prefix;
# DRIVER_SIM_ONLY="a,b,c" → the named queries. Default: full sweep.
_only = os.environ.get("DRIVER_SIM_ONLY", "")
if _only == "window":
    _keep = set(list(qs)[:50])
    qs = {k: v for k, v in qs.items() if k in _keep}
elif _only:
    _keep = set(_only.split(","))
    qs = {k: v for k, v in qs.items() if k in _keep}
bad = 0
for name, fn in sorted(qs.items()):
    sdf = fn(spark, SF)
    bad_cols = [f.name for f in sdf.schema.fields if isinstance(f.dataType, FORBIDDEN_SPARK)]
    if bad_cols:
        bad += 1
        print(f"{name}: FAIL forbidden output types {bad_cols} "
              f"({[str(f.dataType) for f in sdf.schema.fields if f.name in bad_cols]})")
        continue
    s_rows = [tuple(r) for r in sdf.collect()]
    s_cols = sdf.columns
    spdf = sdf.toPandas()
    problems = pandas_audit(spdf, "spark")
    if name not in os_:
        if problems:
            bad += 1; print(f"{name}: FAIL {problems}")
        else:
            print(f"{name}: rows-only, {len(s_rows)} rows")
        continue
    cur = con.execute(os_[name])
    o_cols = [d[0] for d in cur.description]
    o_rows = cur.fetchall()
    opdf = con.execute(os_[name]).df()
    problems += pandas_audit(opdf, "oracle")
    problems += dtype_audit(spdf, opdf)
    status = list(problems)
    if len(s_rows) != len(o_rows): status.append(f"ROWS {len(s_rows)}!={len(o_rows)}")
    if sorted(s_cols) != sorted(o_cols): status.append(f"COLS {sorted(s_cols)}!={sorted(o_cols)}")
    if not status and h(s_rows, s_cols) != h(o_rows, o_cols): status.append("HASH MISMATCH")
    if status:
        bad += 1; print(f"{name}: FAIL {status}")
    else:
        print(f"{name}: MATCH ({len(s_rows)} rows)")
# Env-gated registration audit (judge r11 task #6): a window name whose
# @query registration is environment-gated (e.g. c6e needs the vendored
# protobuf) silently DROPS from the window when the dependency is absent
# — load_all() tolerates it so the driver still works, but a sweep on a
# host where the dependency IS present must show the query actually ran,
# or environment rot goes unnoticed while the row quietly vanishes.
from dcosb_cassandra_spark.registry import _ENV_GATED  # noqa: E402
for _gated in sorted(_ENV_GATED):
    if _gated in qs:
        state = "RAN"
    elif _gated in _all_registered:
        state = "REGISTERED (filtered out by DRIVER_SIM_ONLY)"
    else:
        state = "DROPPED (dependency absent on this host)"
    print(f"ENV-GATED {_gated}: {state}")
print("FAILURES:", bad)
sys.exit(1 if bad else 0)
