"""Self-verification harness: run a registered query on Spark AND its DuckDB
oracle twin, and compare row-count + schema-shape + values — the same shape
of check the driver applies (order-insensitive, column-name-sorted), so
nothing is declared in ``queries()`` unverified (SURVEY.md §5.2 rule 3).
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal
from typing import Any

import duckdb
import numpy as np
from pyspark.sql import SparkSession

from .catalog import TABLES
from .registry import REGISTRY, load_all


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_cell(v: Any) -> Any:
    """Normalize a cell to an engine-independent comparable value."""
    if v is None:
        return None
    if isinstance(v, (np.bool_, bool)):
        return bool(v)
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, (np.floating, float)):
        f = float(v)
        return None if math.isnan(f) else f
    if isinstance(v, (np.integer, int)):
        return int(v)
    if isinstance(v, datetime):
        if v.tzinfo is not None:
            v = v.astimezone(tz=None).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_canon_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon_cell(x)) for k, x in v.items()))
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    return v


def _sort_token(x: Any) -> tuple:
    """Row-sort key for one cell. Floats are quantized to 6 decimals so two
    values that differ only within the comparison tolerance (1e-9) can't
    sort to different positions on the two engines and misalign the
    pairwise zip-compare (a flip would need both values to sit within
    1e-9 of the same 6th-decimal rounding boundary)."""
    if x is None:
        return (True, "")
    if isinstance(x, float):
        return (False, f"f{x:.6e}")
    return (False, str(x))


def canon_rows(raw_rows: list, n_cols: int, cols: list[str]) -> list[tuple]:
    """Canonicalize rows (native Python values from collect()/fetchall()),
    reorder cells into sorted-column order, sort rows order-insensitively."""
    order = sorted(range(n_cols), key=lambda i: cols[i])
    rows = [tuple(_canon_cell(r[i]) for i in order) for r in raw_rows]
    rows.sort(key=lambda r: tuple(_sort_token(x) for x in r))
    return rows


def _cells_match(a: Any, b: Any, rel: float = 1e-9, absolute: float = 1e-9) -> bool:
    if isinstance(a, float) and isinstance(b, (float, int)):
        return math.isclose(a, float(b), rel_tol=rel, abs_tol=absolute)
    if isinstance(b, float) and isinstance(a, int):
        return math.isclose(float(a), b, rel_tol=rel, abs_tol=absolute)
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_cells_match(x, y, rel, absolute) for x, y in zip(a, b))
    return a == b


def compare_query(spark: SparkSession, name: str, sf_dir: str, sdf=None) -> dict:
    """Run REGISTRY[name] on Spark and on DuckDB; return a result dict with
    ``ok`` plus diagnostics. Queries without an oracle get rows-only.

    ``sdf`` optionally supplies the already-built Spark frame for the same
    (name, sf_dir) — the test suite's session-scoped frame memo passes it
    so a replay query's streaming machinery runs once per suite instead of
    once per consuming test (r15 suite-wall work); semantics are unchanged
    because fn() is deterministic per (session, sf_dir)."""
    load_all()
    spec = REGISTRY[name]
    if sdf is None:
        sdf = spec.fn(spark, sf_dir)
    spark_raw = sdf.collect()
    if spec.oracle is None:
        # Oracle-less queries still assert shape: non-empty result with at
        # least one column, and no all-null row (a degenerate projection
        # would otherwise self-verify trivially — ADVICE r1).
        ok = (
            len(spark_raw) > 0
            and len(sdf.columns) > 0
            and any(v is not None for v in spark_raw[0])
        )
        return {"name": name, "ok": ok, "mode": "rows-only",
                "spark_rows": len(spark_raw)}

    con = duckdb_connect(sf_dir)
    try:
        cur = con.execute(spec.oracle)
        oracle_cols = [d[0] for d in cur.description]
        oracle_raw = cur.fetchall()
    finally:
        con.close()

    s_cols, o_cols = sorted(sdf.columns), sorted(oracle_cols)
    s_rows = canon_rows([tuple(r) for r in spark_raw], len(sdf.columns), list(sdf.columns))
    o_rows = canon_rows(oracle_raw, len(oracle_cols), oracle_cols)
    out = {"name": name, "mode": "oracle", "spark_rows": len(s_rows),
           "oracle_rows": len(o_rows), "spark_cols": s_cols, "oracle_cols": o_cols}
    if s_cols != o_cols:
        out.update(ok=False, why=f"column mismatch: {s_cols} vs {o_cols}")
        return out
    if len(s_rows) != len(o_rows):
        out.update(ok=False, why="row count mismatch")
        return out
    exact = s_rows == o_rows
    close = exact or all(_cells_match(a, b) for a, b in zip(s_rows, o_rows))
    out.update(ok=close, exact=exact)
    if not close:
        for i, (a, b) in enumerate(zip(s_rows, o_rows)):
            if not _cells_match(a, b):
                out["why"] = f"first diff at sorted row {i}: spark={a!r} oracle={b!r}"
                break
    elif not exact:
        out["why"] = "float-tolerance match only (not bit-exact) — consider rounding in projection"
    return out
