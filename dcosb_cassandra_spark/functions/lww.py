"""Last-write-wins compaction — the core Cassandra storage semantic
(SURVEY.md §2 A18/A19, §3.2), re-expressed relationally.

Cassandra's LSM merge applies, per (partition key, clustering key), the cell
with the highest writetime, with tombstones shadowing older cells [PK
`db/rows/Row.java` merge, `db/compaction/`, `db/DeletionInfo.java`]. On a
mutation-log DataFrame (keys..., payload..., writetime, tombstone) the same
semantics are exactly one ranked window:

    row_number() OVER (PARTITION BY keys ORDER BY writetime DESC, tiebreak DESC) = 1
    then drop rows whose winning cell is a tombstone.

Scale: one shuffle on the partition keys — identical data routing to
Cassandra's token ring — then a per-key streaming rank; AQE skew-join
splitting handles hot keys. Idempotent and commutative over mutation
batches (union more batches, recompact — property-tested in tests/).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: Cassandra breaks exact writetime ties by greater cell value; callers pass
#: an explicit tiebreak column for determinism (we use the mutation id).


def lww_compact(
    log: DataFrame,
    keys: Sequence[str],
    writetime_col: str = "writetime",
    tombstone_col: str | None = "tombstone",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Compact a mutation log to live rows: latest write per key wins;
    a winning tombstone deletes the key (newer upserts resurrect it)."""
    order: list[Column] = [F.desc(writetime_col)]
    if tiebreak_col:
        order.append(F.desc(tiebreak_col))
    w = Window.partitionBy(*keys).orderBy(*order)
    compacted = log.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    if tombstone_col is not None and tombstone_col in log.columns:
        compacted = compacted.filter(~F.col(tombstone_col)).drop(tombstone_col)
    return compacted
