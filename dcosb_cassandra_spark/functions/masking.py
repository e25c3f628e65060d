"""Dynamic data-masking functions [PK Cassandra 5.0 CQL `mask_*` family,
docs "Dynamic Data Masking"]. Pure string/hash built-ins — JVM-side,
whole-stage-codegen friendly, and every one has an exact DuckDB twin
(substr/repeat/sha256), so masked projections stay oracle-checkable.

Semantics follow the CQL definitions:
- ``mask_null(v)``           → NULL
- ``mask_default(v)``        → '****' (the text default)
- ``mask_replace(v, r)``     → r
- ``mask_inner(v, b, e)``    → first b + last e chars visible, middle '*'
- ``mask_outer(v, b, e)``    → middle visible, first b + last e chars '*'
- ``mask_hash(v)``           → sha-256 hex digest (lowercase both engines)

Edge rule (matches Cassandra's SubstringMasker): when the value is shorter
than begin+end the visible windows may overlap — nothing is padded, the
mask segment clamps to zero length.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def mask_null(c: Column) -> Column:
    return F.lit(None).cast("string")


def mask_default(c: Column) -> Column:
    return F.lit("****")


def mask_replace(c: Column, replacement: str) -> Column:
    return F.lit(replacement)


def _pad(ch: str, n: Column) -> Column:
    return F.repeat(F.lit(ch), F.greatest(n, F.lit(0)).cast("int"))


def mask_inner(c: Column, begin: int, end: int, ch: str = "*") -> Column:
    ln = F.length(c)
    head = F.substring(c, 1, begin)
    tail = F.when(F.lit(end) > 0, c.substr(F.greatest(ln - end + 1, F.lit(begin + 1)), F.lit(end))).otherwise(F.lit(""))
    return F.concat(head, _pad(ch, ln - begin - end), tail)


def mask_outer(c: Column, begin: int, end: int, ch: str = "*") -> Column:
    ln = F.length(c)
    mid = c.substr(F.lit(begin + 1), F.greatest(ln - begin - end, F.lit(0)))
    return F.concat(_pad(ch, F.least(ln, F.lit(begin))), mid, _pad(ch, F.least(ln - begin, F.lit(end))))


def mask_hash(c: Column) -> Column:
    return F.sha2(c.cast("string"), 256)
