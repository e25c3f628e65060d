"""dcosb_cassandra_spark — a PySpark-native analytics engine with the
query/data-processing capabilities of GeneralElectric/dcosb-cassandra.

The reference (a DC/OS service broker provisioning Apache Cassandra) exposes
Apache Cassandra's CQL 3.4 query surface to its consumers; this package
re-expresses that surface — plus the relational-analytics, streaming, and
LLM-data-pipeline layers mandated by SURVEY.md §2 — as idiomatic PySpark
DataFrame/SQL plans. No custom Catalyst rules: every operator is a
composition of built-in operators so Catalyst/Tungsten/AQE pick the
physical strategy (SURVEY.md §4.3).

Layout
------
- ``session``    : SparkSession factory (UTC, AQE, shuffle partitions)
- ``catalog``    : parquet table loaders + schema constants (FIXTURES.md)
- ``registry``   : the query registry consumed by ``__spark_entry__.py``
- ``operators/`` : query implementations (CQL surface, relational, LWW, LLM)
- ``functions/`` : reusable column expressions (text, vectors, minhash, ...)
- ``sources/``   : loaders incl. mutation-log + multimodal binary builders
- ``streaming/`` : Structured Streaming twins of the batch operators
- ``plans/``     : plan inspection / explain tooling (scale audits)
"""

__version__ = "0.1.0"
