"""JDBC source/sink wrappers — SURVEY.md S1/S10/S11.

The reference reads staging tables with ``pd.read_sql`` (main.py:
116-126) and bulk-inserts with ``execute_values`` (utility.py:
223-256), serializing nested cols to JSON text. Spark equivalents,
expressed as thin configuration helpers (no JDBC server exists in the
test environment, so these are exercised at the plan level only):

- reads partition on a numeric column: numPartitions parallel range
  scans instead of one cursor;
- writes batch with ``batchsize`` (the execute_values analog);
- nested columns are serialized with ``to_json`` before the write
  (S10's dict/list -> JSON text behavior).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, MapType, StructType


def jdbc_reader(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    properties: dict[str, str] | None = None,
):
    """S1: parallel JDBC table scan (range-partitioned when bounds given)."""
    reader = (
        spark.read.format("jdbc").option("url", url).option("dbtable", table)
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader


def serialize_nested_for_jdbc(df: DataFrame) -> DataFrame:
    """S10: nested struct/array/map columns -> JSON text (utility.py:236-241)."""
    out = df
    for f in df.schema.fields:
        if isinstance(f.dataType, (StructType, ArrayType, MapType)):
            out = out.withColumn(f.name, F.to_json(F.col(f.name)))
    return out


def jdbc_writer(df: DataFrame, url: str, table: str, batchsize: int = 10_000,
                mode: str = "append", properties: dict[str, str] | None = None):
    """S10: batched JDBC append (the execute_values analog)."""
    writer = (
        serialize_nested_for_jdbc(df)
        .write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .mode(mode)
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    return writer
