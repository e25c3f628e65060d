"""Z-order (Morton) key expressions — shared by the layout evaluation
query (b32) and the physical rewrite job (sources.maintenance.zorder_rewrite).
Pure codegen'd bit arithmetic: 4×bits operations per row, no join."""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F


def morton_interleave(a: Column, b: Column, bits: int = 16) -> Column:
    """Bit-interleave the low ``bits`` bits of two non-negative BIGINT
    columns: a₀b₀a₁b₁… with ``a`` on even positions. Locality property:
    rows close in BOTH dimensions are close in the key, which is what
    lets min/max file statistics prune on either predicate column."""
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return reduce(lambda x, y: x.bitwiseOR(y), terms)
