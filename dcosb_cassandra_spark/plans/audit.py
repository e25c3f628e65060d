"""Physical-plan audits (SURVEY.md §4.2 "verify, don't build").

`Catalyst gives us pushdown/pruning/AQE for free *if* the plan is declared
right` — this module makes that checkable: capture the formatted plan and
assert scale-critical properties (filters reached the scan, dims broadcast,
no cartesian products, codegen engaged, column pruning happened).

Run as a module to dump an audit report for the headline queries:
    python -m dcosb_cassandra_spark.plans.audit
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """Captured .explain() output (JVM-side prints are not capturable from
    Python, so go through the QueryExecution API directly)."""
    jdf = df._jdf
    jvm = df.sparkSession._jvm
    explain_mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return jdf.queryExecution().explainString(explain_mode)


def executed_plan_string(df: DataFrame) -> str:
    """Final (post-AQE) physical plan — executes THIS plan (collect, not
    count — count would build a different plan), then re-reads the formatted
    explain, where AQE's final plan and `[codegen id : N]` spans appear."""
    df.collect()
    return plan_string(df, "formatted")


def audit(df: DataFrame) -> dict:
    """Scale-relevant features of a plan, as booleans/counts."""
    plan = plan_string(df)
    return {
        "has_pushed_filters": "PushedFilters: []" not in plan and "PushedFilters: [" in plan,
        "n_broadcast_joins": plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin"),
        "n_shuffle_exchanges": plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning"),
        "has_cartesian": "CartesianProduct" in plan,
        "has_partial_agg": "HashAggregate" in plan or "SortAggregate" in plan,
        "read_schemas": [
            line.split("ReadSchema:", 1)[1].strip()
            for line in plan.splitlines()
            if "ReadSchema:" in line
        ],
    }


def main() -> None:  # pragma: no cover - reporting tool
    import json
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
    from dcosb_cassandra_spark.registry import REGISTRY, load_all
    from dcosb_cassandra_spark.session import get_spark

    spark = get_spark("plan-audit")
    load_all()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    for name in sorted(REGISTRY):
        df = REGISTRY[name].fn(spark, sf_dir)
        a = audit(df)
        a.pop("read_schemas")
        print(json.dumps({"query": name, **a}))


if __name__ == "__main__":
    main()
