"""Poison-row behavior: malformed inputs degrade to nulls/rejects,
never task failures — the only survivable contract at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from jde_to_datalake_spark.operators.flatten import expand_json_columns
from jde_to_datalake_spark.sources.rest import extract_envelope


def test_expand_json_malformed_yields_nulls(spark):
    schema = StructType(
        [StructField("amount", DoubleType()), StructField("unit", StringType())]
    )
    df = spark.createDataFrame(
        [
            (1, '{"amount": 2.5, "unit": "kg"}'),
            (2, "{not json at all"),
            (3, None),
            (4, '{"amount": "NaNish", "unit": 7}'),  # wrong field types
        ],
        "id long, onHand string",
    )
    out = expand_json_columns(df, {"onHand": schema}).orderBy("id")
    rows = out.collect()
    assert [r["onHand_amount"] for r in rows] == [2.5, None, None, None]
    assert [r["onHand_unit"] for r in rows] == ["kg", None, None, "7"]
    assert "onHand" not in out.columns


def test_envelope_missing_path_yields_no_rows(spark):
    rowset_schema = StructType([StructField("F4111_DOC", LongType())])
    df = spark.createDataFrame(
        [('{"ServiceRequest1": {"wrong_key": []}}',), ("broken {",), (None,)],
        "raw string",
    )
    out = extract_envelope(df, "raw", rowset_schema)
    assert out.count() == 0  # explode of null/missing rowset drops rows


def test_numeric_coercion_garbage_to_null(spark):
    df = spark.createDataFrame(
        [("12.5",), ("1e3",), ("abc",), ("",), (None,), ("  7 ",)], "v string"
    )
    got = [r["n"] for r in df.select(F.col("v").try_cast("double").alias("n")).collect()]
    assert got == [12.5, 1000.0, None, None, None, 7.0]
