"""Generated columns (Delta's GENERATED ALWAYS AS): declared once,
computed at write when omitted, validated when supplied, materialized
table-wide by compact — the formalization of 'cluster on a derivative
of a timestamp' (TIMESTAMP_NTZ predicates never reach parquet footer
stats, so skipping needs the derived DATE/numeric column)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jde_to_datalake_spark.sources.versioned import VersionedTable


@pytest.fixture()
def table(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.commit(
        spark.createDataFrame(
            [(1, "2024-01-05 10:00:00"), (2, "2024-03-20 11:30:00")],
            "k bigint, ts string",
        ).select("k", F.col("ts").cast("timestamp_ntz").alias("ts"))
    )
    return t


def test_writes_compute_when_omitted_and_validate_when_supplied(
    spark, table
):
    table.add_generated_column(spark, "day", "CAST(ts AS DATE)")
    # omitted -> computed
    table.commit(
        spark.createDataFrame([(3, "2024-06-01 00:10:00")], "k bigint, ts string")
        .select("k", F.col("ts").cast("timestamp_ntz").alias("ts")),
        mode="append",
    )
    got = {
        (r["k"], str(r["day"]))
        for r in table.read(spark, merge_schema=True)
        .filter("k = 3")
        .collect()
    }
    assert got == {(3, "2024-06-01")}
    # supplied-and-equal passes; supplied-and-different is rejected
    ok = spark.createDataFrame(
        [(4, "2024-07-01 05:00:00", "2024-07-01")], "k bigint, ts string, day string"
    ).select(
        "k",
        F.col("ts").cast("timestamp_ntz").alias("ts"),
        F.col("day").cast("date").alias("day"),
    )
    table.commit(ok, mode="append")
    bad = spark.createDataFrame(
        [(5, "2024-07-01 05:00:00", "1999-01-01")], "k bigint, ts string, day string"
    ).select(
        "k",
        F.col("ts").cast("timestamp_ntz").alias("ts"),
        F.col("day").cast("date").alias("day"),
    )
    with pytest.raises(ValueError, match="generated column 'day'"):
        table.commit(bad, mode="append")
    with pytest.raises(ValueError, match="generated column 'day'"):
        table.merge(spark, bad, key="k")


def test_declaration_guards(spark, table):
    with pytest.raises(ValueError, match="already names a column"):
        table.add_generated_column(spark, "ts", "CAST(ts AS DATE)")
    with pytest.raises(Exception):  # bad reference fails at declare time
        table.add_generated_column(spark, "day", "CAST(nope AS DATE)")
    table.add_generated_column(spark, "day", "CAST(ts AS DATE)")
    with pytest.raises(ValueError, match="already declared"):
        table.add_generated_column(spark, "day", "CAST(ts AS DATE)")
    with pytest.raises(ValueError, match="no generated column"):
        table.drop_generated_column("nope")
    table.drop_generated_column("day")
    assert table.generated_columns() == {}


def test_compact_materializes_and_skipping_prunes_on_the_derivative(
    spark, table
):
    """The payoff: timestamp predicates cannot prune parquet footers,
    but the generated day column can — compact clusters on it and
    files_for_range prunes."""
    table.add_generated_column(spark, "day", "CAST(ts AS DATE)")
    rows = [
        (10 + i, f"2024-{1 + (i % 12):02d}-10 08:00:00") for i in range(48)
    ]
    table.commit(
        spark.createDataFrame(rows, "k bigint, ts string").select(
            "k", F.col("ts").cast("timestamp_ntz").alias("ts")
        ),
        mode="append",
    )
    v = table.compact(spark, target_partitions=6, cluster_by="day")
    m = table._manifest(v)
    # the pre-declaration rows (k=1,2) got the column materialized
    assert (
        table.read(spark).filter(F.col("day").isNull()).count() == 0
    )
    # footer stats exist for day and prune a month probe
    import datetime

    pruned = table.files_for_range(
        "day", datetime.date(2024, 2, 1), datetime.date(2024, 2, 28)
    )
    assert 0 < len(pruned) < len(m["files"])
    got = {
        r["k"]
        for r in table.read_where(
            spark, "day",
            datetime.date(2024, 2, 1), datetime.date(2024, 2, 28),
        ).collect()
    }
    assert got == {10 + i for i in range(48) if i % 12 == 1}


def test_declaration_survives_restore_clone_and_cold_read(
    spark, table, tmp_path
):
    v0 = table.latest_version()
    table.add_generated_column(spark, "day", "CAST(ts AS DATE)")
    table.commit(
        spark.createDataFrame([(9, "2025-01-01 00:00:00")], "k bigint, ts string")
        .select("k", F.col("ts").cast("timestamp_ntz").alias("ts")),
        mode="append",
    )
    cold = VersionedTable(table.root)
    assert cold.generated_columns() == {"day": "CAST(ts AS DATE)"}
    clone = table.clone_to(str(tmp_path / "clone"))
    assert clone.generated_columns() == {"day": "CAST(ts AS DATE)"}
    table.restore(v0)
    assert table.generated_columns() == {}
