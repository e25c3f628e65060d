"""Run registered queries on a REAL multi-JVM deployment — Spark's
``local-cluster[workers,cores,mem]`` master — and print their canonical
digests, one JSON line.

Why this exists (SURVEY.md "100 TB design rules"): ``local[32]`` runs
driver and executors in ONE JVM, which silently forgives the failure
modes that only appear once tasks cross a process boundary — closure
serialization, broadcast-variable transport, Arrow batch transfer to
Python workers spawned by an executor (not the driver), and accumulator
/ shuffle-file exchange between JVMs. local-cluster spawns real worker
JVMs with real RPC, so a pass here is evidence the same plans run on a
genuine multi-executor cluster unchanged.

Usage: python tools/lc_runner.py SF_DIR q1,q2,...   (prints one JSON line)
Compared against in-process results by tests/test_local_cluster.py.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir, names_csv = sys.argv[1], sys.argv[2]
    names = names_csv.split(",")

    from pyspark.sql import SparkSession

    from dcosb_cassandra_spark.compare import canon_rows
    from dcosb_cassandra_spark.registry import REGISTRY, load_all

    spark = (
        SparkSession.builder.master("local-cluster[2,4,2048]")
        .appName("lc-parity")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        .getOrCreate()
    )
    # Executor JVMs spawn their own Python workers: the package must be
    # shipped (addPyFile) or module-referencing UDFs die on import.
    from dcosb_cassandra_spark.session import ship_package

    ship_package(spark)
    load_all()
    out = {}
    for name in names:
        df = REGISTRY[name].fn(spark, sf_dir)
        rows = [
            tuple(round(c, 5) if isinstance(c, float) else c for c in r)
            for r in df.collect()
        ]
        canon = canon_rows(rows, len(df.columns), df.columns)
        digest = hashlib.md5(repr(canon).encode()).hexdigest()
        out[name] = {"rows": len(rows), "digest": digest}
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
