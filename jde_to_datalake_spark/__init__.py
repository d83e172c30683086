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


def get_spark(*args, **kwargs):
    """Session factory (lazy re-export of session.get_spark)."""
    from jde_to_datalake_spark.session import get_spark as _g

    return _g(*args, **kwargs)


def load_table(spark, sf_dir: str, name: str):
    """Testdata/lake table loader (lazy re-export)."""
    from jde_to_datalake_spark.session import load_table as _l

    return _l(spark, sf_dir, name)


def register_views(spark, sf_dir: str, tables=None):
    """Publish tables as temp views for spark.sql (lazy re-export)."""
    from jde_to_datalake_spark.plans.sql_api import register_views as _r

    return _r(spark, sf_dir, tables)


def serve_queries(spark, sf_dir: str, queries, host: str = "127.0.0.1", port: int = 0):
    """Start the thin HTTP query service (lazy re-export); returns the
    server — ``server.server_address`` has the bound port."""
    from jde_to_datalake_spark.plans.query_service import QueryService, serve

    return serve(QueryService(spark, sf_dir, queries), host=host, port=port)


def compact_partitions(spark, root: str, **kwargs):
    """Small-file compaction over a parquet lake (lazy re-export)."""
    from jde_to_datalake_spark.sources.lake_maintenance import (
        compact_partitions as _c,
    )

    return _c(spark, root, **kwargs)


def skew_report(df, keys, top_n: int = 10):
    """Key-distribution diagnostics for shuffle planning (lazy
    re-export; pair with operators.relational.salted_join)."""
    from jde_to_datalake_spark.operators.skew import skew_report as _s

    return _s(df, keys, top_n)
