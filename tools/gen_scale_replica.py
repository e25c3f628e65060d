#!/usr/bin/env python3
"""Deterministic N× replica of a testdata SF dir for scale probes
(SCALE.md "Measured scaling"): each scaling table is unioned N times with
every key column shifted per copy (so join fan-outs and group
cardinalities scale realistically — a naive row copy would multiply
duplicate keys instead). Fixed dims (nation/region) are spec-constant at
every SF and copy through unchanged.

Usage: python tools/gen_scale_replica.py [SRC_SF_DIR] [DST_DIR] [N]
Defaults: /root/testdata/sf0.1 .tmp/sf1 10
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dcosb_cassandra_spark.catalog import TABLES, table
from dcosb_cassandra_spark.session import get_spark

#: key columns shifted per copy (column → shift stride source column)
KEYED = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_suppkey", "l_partkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else ".tmp/sf1"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark("scale-replica")
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        df = table(spark, src, t)
        keys = KEYED.get(t)
        if keys:
            strides = {
                k: int(df.agg(F.max(k)).first()[0] or 0) + 1 for k in keys
            }
            copies = []
            for i in range(n):
                c = df
                for k, stride in strides.items():
                    c = c.withColumn(
                        k, (F.col(k) + F.lit(i * stride)).cast(dict(df.dtypes)[k])
                    )
                copies.append(c)
            out = copies[0]
            for c in copies[1:]:
                out = out.unionAll(c)
        else:  # fixed dims: spec-constant at every SF
            out = df
        out.coalesce(max(1, n // 2)).write.mode("overwrite").parquet(
            os.path.join(dst, f"{t}.parquet")
        )
        print(t, "done")
    spark.stop()


if __name__ == "__main__":
    main()
