"""CSV/JSON-lines sources with reject capture (sources/files.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)
from pyspark.errors import AnalysisException

from jde_to_datalake_spark.operators.quality import expectations_report, not_null
from jde_to_datalake_spark.sources.files import (
    CORRUPT_COL,
    infer_schema,
    read_csv,
    read_csv_with_rejects,
    read_json_lines_with_rejects,
)

SCHEMA = StructType(
    [
        StructField("id", IntegerType()),
        StructField("name", StringType()),
        StructField("qty", DoubleType()),
    ]
)


def _write(tmp_path, name: str, text: str) -> str:
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def test_csv_rejects_are_captured_not_fatal(spark, tmp_path):
    path = _write(
        tmp_path,
        "in.csv",
        "id,name,qty\n"
        "1,flour,2.5\n"
        "oops,sugar,1.0\n"      # id not an int
        "3,salt,not_a_number\n"  # qty not a double
        "4,water,0.25\n",
    )
    valid, rejects = read_csv_with_rejects(spark, path, SCHEMA)
    got = {r["id"]: r for r in valid.collect()}
    assert sorted(got) == [1, 4]
    assert got[1]["qty"] == 2.5 and got[4]["name"] == "water"
    raws = [r["raw"] for r in rejects.collect()]
    assert len(raws) == 2
    assert any("oops" in r for r in raws) and any("not_a_number" in r for r in raws)
    # valid side no longer carries the corrupt column
    assert CORRUPT_COL not in valid.columns


def test_json_lines_rejects(spark, tmp_path):
    path = _write(
        tmp_path,
        "in.jsonl",
        '{"id": 1, "name": "flour", "qty": 2.5}\n'
        "{this is not json}\n"
        '{"id": 2, "name": "sugar", "qty": 1.0}\n',
    )
    valid, rejects = read_json_lines_with_rejects(spark, path, SCHEMA)
    assert valid.count() == 2
    assert rejects.count() == 1
    assert "not json" in rejects.collect()[0]["raw"]


def test_corrupt_only_scan_is_disallowed_hence_text_rescan(spark, tmp_path):
    """Documents WHY rejects come from a separate text scan: Spark
    refuses any query over a permissive file scan that references only
    the corrupt-record column (QUERY_ONLY_CORRUPT_RECORD_COLUMN), and
    the documented cache() workaround would pin the whole input."""
    path = _write(tmp_path, "in.csv", "id,name,qty\n1,flour,2.5\nbad\n")
    df = read_csv(spark, path, SCHEMA)
    with pytest.raises(AnalysisException, match="CORRUPT_RECORD"):
        df.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL).count()


def test_valid_side_composes_with_quality_report(spark, tmp_path):
    path = _write(
        tmp_path,
        "in.csv",
        "id,name,qty\n1,flour,2.5\n,sugar,1.0\nbad,row,here\n",
    )
    valid, rejects = read_csv_with_rejects(spark, path, SCHEMA)
    rep = (
        expectations_report(valid, [not_null("id")])
        .toPandas()
        .set_index("check_name")
    )
    # "bad,row,here" is a reject; ",sugar,1.0" parses with a null id
    assert rejects.count() == 1
    assert rep.loc["not_null__id", "n_violations"] == 1
    assert rep.loc["not_null__id", "n_rows"] == 2


def test_infer_schema_roundtrip(spark, tmp_path):
    path = _write(
        tmp_path,
        "in.csv",
        "id,name,qty\n1,flour,2.5\n2,sugar,1.0\n",
    )
    schema = infer_schema(spark, path, fmt="csv", sampling_ratio=1.0)
    assert [f.name for f in schema.fields] == ["id", "name", "qty"]
    assert CORRUPT_COL not in schema.fieldNames()
    valid, rejects = read_csv_with_rejects(spark, path, schema)
    assert valid.count() == 2 and rejects.count() == 0


def test_custom_delimiter_reaches_both_scans(spark, tmp_path):
    path = _write(
        tmp_path,
        "in.tsv",
        "id|name|qty\n1|flour|2.5\nnope|sugar|1.0\n",
    )
    valid, rejects = read_csv_with_rejects(spark, path, SCHEMA, sep="|")
    assert valid.count() == 1
    raws = [r["raw"] for r in rejects.collect()]
    assert raws == ["nope|sugar|1.0"]


def test_explicit_schema_prunes_and_pushes_down(spark, tmp_path):
    """The typed CSV scan still participates in column pruning and
    filter pushdown — the point of declaring the schema up front."""
    path = _write(
        tmp_path,
        "in.csv",
        "id,name,qty\n" + "".join(f"{i},item{i},{i}.5\n" for i in range(100)),
    )
    df = read_csv(spark, path, SCHEMA).filter(F.col("id") > 90).select("id", "qty")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(id), GreaterThan(id,90)]" in plan
    assert df.count() == 9
