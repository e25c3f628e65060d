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


def compact_with_grace(
    log: DataFrame,
    keys: Sequence[str],
    gc_grace_writetime: int,
    writetime_col: str = "writetime",
    tombstone_col: str = "tombstone",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Compaction with tombstone GC [PK `db/compaction/`, gc_grace_seconds]:
    winning tombstones NEWER than ``gc_grace_writetime`` are retained in the
    output (still flagged) so later merges keep shadowing stragglers;
    winning tombstones at-or-older than the grace bound are purged outright.

    This reproduces Cassandra's deliberate trade-off — and its hazard: a
    write older than a PURGED tombstone that arrives after the purge will
    resurrect the row (the 'zombie' problem; Cassandra requires repair
    within gc_grace for exactly this reason). The property test pins both
    sides of that behavior."""
    order: list[Column] = [F.desc(writetime_col)]
    if tiebreak_col:
        order.append(F.desc(tiebreak_col))
    w = Window.partitionBy(*keys).orderBy(*order)
    winners = log.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    return winners.filter(
        (~F.col(tombstone_col)) | (F.col(writetime_col) > F.lit(gc_grace_writetime))
    )
