"""Sources/sinks: partitioned lake (S6-S8), schema registry (S9/A6/A7),
REST adapters (S2-S5), JDBC plumbing (S1/S10)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType, LongType

from jde_to_datalake_spark.session import load_table
from jde_to_datalake_spark.sources import parquet_lake, rest
from jde_to_datalake_spark.sources.jdbc import serialize_nested_for_jdbc
from jde_to_datalake_spark.sources.schema_manager import (
    SchemaRegistry,
    create_ddl_from_schema,
    infer_schema,
)
from tests.conftest import SF_DIR


def test_partitioned_lake_roundtrip_and_pruning(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events")
    root = str(tmp_path / "lake")
    parquet_lake.write_dispatch(ev, root, "events_dispatch", "ts")

    got = parquet_lake.read_dispatches(
        spark, root, "events_dispatch", start=(2024, 1, 10), end=(2024, 1, 15)
    )
    exp = ev.filter(
        (F.to_date("ts") >= F.lit("2024-01-10")) & (F.to_date("ts") <= F.lit("2024-01-15"))
    )
    assert got.count() == exp.count()

    # partition pruning must appear in the physical plan (no full scan)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "isnotnull(year" in plan or "year#" in plan


def test_schema_registry_versions(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    schema = infer_schema(docs)
    assert schema["text"]["type"] == "string"
    assert schema["text"]["max_length"] > 0
    assert schema["doc_id"]["type"] == "integer"

    reg = SchemaRegistry(str(tmp_path / "schemas"))
    v1 = reg.save(spark, "documents", schema)
    v2 = reg.save(spark, "documents", {**schema, "extra": {"type": "string"}})
    assert (v1, v2) == (1, 2)
    latest = reg.latest(spark, "documents")
    assert "extra" in latest
    assert reg.next_version(spark, "other_table") == 1

    ddl = create_ddl_from_schema("documents", schema)
    assert "CREATE TABLE" in ddl and "`created_at` TIMESTAMP" in ddl


def test_rest_source_pagination_and_retry(spark):
    calls = []

    def fetch(page, size):
        calls.append(page)
        if page < 2:
            return [{"id": page * size + i, "v": f"p{page}"} for i in range(size)]
        return [{"id": 999, "v": "last"}]  # short page ends pagination

    src = rest.RestJsonSource(fetch, page_size=3, sleeper=lambda s: None)
    df = src.to_df(spark, "id long, v string")
    assert df.count() == 7
    assert calls == [0, 1, 2]

    # retry/backoff: two failures then success
    attempts = {"n": 0}

    def flaky():
        attempts["n"] += 1
        if attempts["n"] < 3:
            raise RuntimeError("429")
        return "ok"

    assert rest.retry_with_backoff(flaky, sleeper=lambda s: None) == "ok"
    assert attempts["n"] == 3


def test_python_data_source_paged(spark):
    spark.dataSource.register(rest.PagedRestDataSource)
    df = spark.read.format("paged_rest").option("n_pages", 3).load()
    assert df.count() == 21  # 3 pages x 7 demo records
    assert df.rdd.getNumPartitions() == 3  # one partition per page


def test_envelope_extraction(spark):
    records = [
        {"F4111_DOC": 1, "F4111_LITM": "flour", "F4111_TRQT": "12.5"},
        {"F4111_DOC": 2, "F4111_LITM": "sugar", "F4111_TRQT": "-3"},
    ]
    env = rest.wrap_envelope_json(records)
    df = spark.createDataFrame([(env,)], "raw string")
    rowset_schema = StructType(
        [
            StructField("F4111_DOC", LongType()),
            StructField("F4111_LITM", StringType()),
            StructField("F4111_TRQT", StringType()),
        ]
    )
    out = rest.extract_envelope(df, "raw", rowset_schema)
    rows = {r["F4111_DOC"]: r["F4111_LITM"] for r in out.collect()}
    assert rows == {1: "flour", 2: "sugar"}


def test_jdbc_nested_serialization(spark):
    df = spark.createDataFrame(
        [(1, {"a": 1}, ["x", "y"])], "id long, m map<string,int>, arr array<string>"
    )
    out = serialize_nested_for_jdbc(df)
    row = out.collect()[0]
    assert isinstance(row["m"], str) and '"a":1' in row["m"]
    assert row["arr"] == '["x","y"]'


def test_paged_rest_stream_reader(spark, tmp_path):
    """Streaming variant: one page per micro-batch, offset-checkpointed."""
    spark.dataSource.register(rest.PagedRestDataSource)
    q = (
        spark.readStream.format("paged_rest")
        .option("max_pages", 3)
        .load()
        .writeStream.format("memory")
        .queryName("paged_rest_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    import time as _time

    deadline = _time.time() + 120
    while _time.time() < deadline:
        if spark.sql("SELECT count(*) c FROM paged_rest_stream").collect()[0]["c"] >= 21:
            break
        _time.sleep(0.5)
    q.stop()
    got = spark.sql("SELECT * FROM paged_rest_stream").collect()
    assert len(got) == 21  # 3 pages x 7 demo records
    assert {r["record_id"] for r in got} == {p * 1000 + i for p in range(3) for i in range(7)}


def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    """bucketBy co-location: repeated joins on the bucket key need no
    exchange — the 100 TB pattern for fact-fact joins reused across
    many queries (SCALE.md)."""
    import uuid

    # warehouse dir is a static conf; tables land in the session default
    # and are dropped in the finally block
    suffix = uuid.uuid4().hex[:8]
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
    lt, ot = f"li_b_{suffix}", f"o_b_{suffix}"
    (li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
       .mode("overwrite").saveAsTable(lt))
    (o.withColumnRenamed("o_orderkey", "l_orderkey")
       .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
       .mode("overwrite").saveAsTable(ot))
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table(lt).join(spark.table(ot), "l_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
        assert joined.count() == li.join(
            o, li.l_orderkey == o.o_orderkey
        ).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql(f"DROP TABLE IF EXISTS {lt}")
        spark.sql(f"DROP TABLE IF EXISTS {ot}")
