"""jde_to_datalake_spark — a PySpark-native analytics engine.

Re-expresses the query semantics of the reference ETL/reconciliation
system (amitthk/jde-to-datalake: JD Edwards ERP <-> bakery inventory
sync over an S3/Parquet lake) as idiomatic, lazy, Catalyst-optimized
Spark DataFrame / SQL / Structured Streaming plans, designed for a
multi-executor cluster at the ~100 TB scale rather than the
reference's single-process pandas envelope.

Layout
------
- ``session``      SparkSession factory with scale-appropriate conf
- ``functions``    scalar Column builders (SURVEY §2.9 F1-F22) + text/vector fns
- ``operators``    relational / flatten / reconcile / dedup / similarity ops
- ``sources``      lake + JDBC + REST source/sink adapters (SURVEY §2.1)
- ``plans``        idempotency ledger, schema versioning (SURVEY §2.4 A12)
- ``streaming``    micro-batch pipelines, watermarks, stateful ops (SURVEY §2.10)
"""

__version__ = "0.1.0"

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
