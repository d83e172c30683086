"""SQL façade — run the engine's query surface through ``spark.sql``.

The reference exposes imperative endpoints only; this engine's
relations are plain DataFrames, so the full Spark SQL surface comes
for free once the tables are registered. ``register_views`` publishes
the testdata tables (and any derived relation) as temp views;
callers then use ANSI SQL — parsed, analyzed, and optimized by
Catalyst exactly like the DataFrame plans (both lower to the same
logical operators, so `.explain` shows identical physical plans for
equivalent queries).

This is also the multi-tenant story at scale: analysts get SQL over
the governed views; pipeline code composes the same relations through
the operator library.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from jde_to_datalake_spark.session import load_table

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register testdata tables as temp views for spark.sql access."""
    for name in tables or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def sql(spark: SparkSession, query: str) -> DataFrame:
    """Thin alias — the engine's SQL entry point is Catalyst's own."""
    return spark.sql(query)
