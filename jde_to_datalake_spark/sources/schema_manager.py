"""Schema inference + versioning — SURVEY.md §1.3 / S9 / A7.

The reference infers field types by walking the first records
(schema_manager.py:177-223), generates DDL (225-279), and versions
schemas with MAX(version_number)+1 in Postgres plus JSON mirrors in
S3 (s3_helper.py:156-230). Here:

- inference is a single distributed agg pass over the WHOLE dataset
  (max string length per column — not a first-record guess);
- versions live in a parquet-backed table with the same
  ``COALESCE(MAX(version),0)+1`` semantics (A7);
- "latest" is ``ORDER BY version DESC LIMIT 1`` (A6), replacing the
  reference's max-LastModified S3 listing.

In production this table is a Delta table and schema evolution is
``mergeSchema``; the explicit version ledger is kept for parity with
the reference's GET /s3/schemas API.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TYPE_MAP = {
    T.LongType: "integer",
    T.IntegerType: "integer",
    T.ShortType: "integer",
    T.DoubleType: "float",
    T.FloatType: "float",
    T.DecimalType: "float",
    T.BooleanType: "boolean",
    T.TimestampType: "timestamp",
    T.TimestampNTZType: "timestamp",
    T.DateType: "timestamp",
    T.StringType: "string",
    T.ArrayType: "array",
    T.MapType: "json",
    T.StructType: "json",
    T.BinaryType: "binary",
}


def infer_schema(df: DataFrame) -> dict:
    """Reference-shaped schema doc {field: {type, max_length?}}.

    String max-lengths come from ONE aggregate over all rows (A9) —
    the reference samples the first record and mis-sizes columns.
    """
    out: dict[str, dict] = {}
    strings = []
    for f in df.schema.fields:
        t = _TYPE_MAP.get(type(f.dataType), "string")
        out[f.name] = {"type": t}
        if t == "string":
            strings.append(f.name)
    if strings:
        row = df.agg(
            *[F.max(F.length(F.col(c))).alias(c) for c in strings]
        ).collect()[0]
        for c in strings:
            out[c]["max_length"] = row[c]
    return out


def create_ddl_from_schema(table: str, schema: dict) -> str:
    """Reference-parity DDL generation (schema_manager.py:225-279):
    float->DECIMAL, json/array->JSONB-ish, long strings->TEXT, plus
    audit columns."""
    cols = []
    for name, spec in schema.items():
        t = spec["type"]
        if t == "integer":
            sql_t = "BIGINT"
        elif t == "float":
            sql_t = "DECIMAL(15,4)"
        elif t == "boolean":
            sql_t = "BOOLEAN"
        elif t == "timestamp":
            sql_t = "TIMESTAMP"
        elif t in ("json", "array"):
            sql_t = "STRING"  # JSON text column (JSONB in the reference)
        elif t == "binary":
            sql_t = "BINARY"
        else:
            ml = spec.get("max_length") or 0
            sql_t = "STRING" if ml > 255 else "VARCHAR(255)"
        cols.append(f'  `{name}` {sql_t}')
    cols.append("  `created_at` TIMESTAMP")
    cols.append("  `updated_at` TIMESTAMP")
    body = ",\n".join(cols)
    return f"CREATE TABLE IF NOT EXISTS `{table}` (\n{body}\n) USING parquet"


class SchemaRegistry:
    """Versioned schema store (A6/A7/S9) over a parquet table."""

    def __init__(self, path: str):
        self.path = path

    def _load(self, spark: SparkSession) -> DataFrame | None:
        if not os.path.isdir(self.path):
            return None
        return spark.read.parquet(self.path)

    def next_version(self, spark: SparkSession, table: str) -> int:
        cur = self._load(spark)
        if cur is None:
            return 1
        row = (
            cur.filter(F.col("table_name") == table)
            .agg(F.coalesce(F.max("version"), F.lit(0)).alias("v"))
            .collect()[0]
        )
        return int(row["v"]) + 1

    def save(self, spark: SparkSession, table: str, schema: dict) -> int:
        version = self.next_version(spark, table)
        row = spark.createDataFrame(
            [
                (
                    table,
                    version,
                    json.dumps(schema, sort_keys=True),
                    datetime.now(timezone.utc).isoformat(),
                )
            ],
            "table_name string, version int, schema_definition string, created_at string",
        )
        cur = self._load(spark)
        merged = row if cur is None else cur.unionByName(row)
        tmp = f"{self.path}__tmp_{uuid.uuid4().hex}"
        merged.write.mode("overwrite").parquet(tmp)
        old = f"{self.path}__old_{uuid.uuid4().hex}"
        if os.path.isdir(self.path):
            os.rename(self.path, old)
        os.rename(tmp, self.path)
        shutil.rmtree(old, ignore_errors=True)
        return version

    def latest(self, spark: SparkSession, table: str) -> dict | None:
        cur = self._load(spark)
        if cur is None:
            return None
        rows = (
            cur.filter(F.col("table_name") == table)
            .orderBy(F.col("version").desc())
            .limit(1)
            .collect()
        )
        if not rows:
            return None
        return json.loads(rows[0]["schema_definition"])
