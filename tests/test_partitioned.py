"""Hive-partitioned versioned tables: CONVERT TO VERSIONED
PARTITIONED BY adopts an existing ``year=/month=/day=`` layout
metadata-only (the reference's own lake layout, s3_helper.py:45), and
the adopted table keeps full lake semantics — partition columns on
every read, stats-based pruning that subsumes partition pruning, and
partitioned layouts for every later write."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from jde_to_datalake_spark.sources.versioned import (
    VersionedTable,
    _parse_partition_value,
    _path_partitions,
)


def _hive_dataset(spark, path, months=(1, 2, 3)):
    df = spark.range(0, 90).select(
        F.col("id").alias("k"),
        (F.lit(2024)).alias("year"),
        (F.col("id") % len(months) + 1).cast("int").alias("month"),
        (F.col("id") * 2).alias("v"),
    )
    df.write.partitionBy("year", "month").parquet(path)
    return df


@pytest.fixture()
def adopted(spark, tmp_path):
    root = str(tmp_path / "lake")
    _hive_dataset(spark, root)
    return VersionedTable.convert_from_parquet(
        root, partitioned_by=["year", "month"]
    )


def test_path_partition_parsing():
    assert _path_partitions("year=2024/month=06/part-0.parquet") == {
        "year": 2024,
        "month": 6,
    }
    assert _path_partitions("part-0.parquet") == {}
    assert _parse_partition_value("__HIVE_DEFAULT_PARTITION__") is None
    assert _parse_partition_value("a%20b") == "a b"
    assert _parse_partition_value("1.5") == 1.5


def test_adopt_hive_layout_metadata_only(spark, adopted, tmp_path):
    t = adopted
    assert t.partitioned_by() == ["year", "month"]
    # metadata-only: the adopted files are the ORIGINAL hive files
    files = t._manifest(0)["files"]
    assert all("=" in os.path.dirname(f) for f in files)
    # partition columns surface on read, correctly typed and valued
    df = t.read(spark)
    assert {"k", "v", "year", "month"} <= set(df.columns)
    assert df.count() == 90
    assert df.filter("month = 2").count() == 30
    assert df.select(F.min("year"), F.max("year")).first() == (2024, 2024)


def test_partition_stats_prune_files(spark, adopted):
    t = adopted
    all_files = t._manifest(0)["files"]
    picked = t.files_for_ranges({"month": (2, 2)})
    assert picked and len(picked) < len(all_files)
    assert all("month=2" in f for f in picked)
    # a year probe outside the data prunes everything
    assert t.files_for_ranges({"year": (2025, 2026)}) == []
    # read_where plans over the pruned subset and returns exact rows
    got = t.read_where_all(spark, {"month": (2, 2)})
    assert got.count() == 30 and got.select("month").distinct().first()[0] == 2


def test_reject_flat_convert_of_hive_layout(spark, tmp_path):
    root = str(tmp_path / "lake")
    _hive_dataset(spark, root)
    with pytest.raises(ValueError, match="partitioned_by"):
        VersionedTable.convert_from_parquet(root)


def test_reject_ambiguous_layouts(spark, tmp_path):
    root = str(tmp_path / "lake")
    _hive_dataset(spark, root)
    with pytest.raises(ValueError, match="ambiguous"):
        VersionedTable.convert_from_parquet(
            root, partitioned_by=["year", "month", "day"]
        )
    with pytest.raises(ValueError, match="ambiguous"):
        VersionedTable.convert_from_parquet(root, partitioned_by=["year"])


def test_writes_after_adoption_keep_hive_layout(spark, adopted):
    t = adopted
    batch = spark.createDataFrame(
        [(1000, 2025, 1, 7)], ["k", "year", "month", "v"]
    )
    v1 = t.commit(batch, mode="append")
    new = set(t._manifest(v1)["files"]) - set(t._manifest(0)["files"])
    assert new and all("year=2025" in f and "month=1" in f for f in new)
    # unified read: old hive files + new write, partition cols everywhere
    df = t.read(spark)
    assert df.count() == 91
    assert df.filter("year = 2025").select("k").first()[0] == 1000
    # the new file's partition stats prune too
    assert set(t.files_for_ranges({"year": (2025, 2025)})) == new
    # a frame missing a partition column is rejected
    with pytest.raises(ValueError, match="partition column"):
        t.commit(spark.createDataFrame([(1, 5)], ["k", "v"]), mode="append")


def test_merge_on_partitioned_table(spark, adopted):
    t = adopted
    pre = {
        r["k"]: (r["year"], r["month"], r["v"])
        for r in t.read(spark).collect()
    }
    src = spark.createDataFrame(
        [(5, 2024, pre[5][1], 999), (2000, 2024, 9, 1)],
        ["k", "year", "month", "v"],
    )
    t.merge(spark, src, key="k")
    got = {
        r["k"]: (r["year"], r["month"], r["v"])
        for r in t.read(spark).collect()
    }
    assert got[5] == (2024, pre[5][1], 999)
    assert got[2000] == (2024, 9, 1)
    assert len(got) == 91
    # every rewritten/inserted file still lives in a k=v directory with
    # the right values recorded as stats
    latest = t._manifest(t.latest_version())
    for f in latest["files"]:
        pv = _path_partitions(f)
        assert set(pv) == {"year", "month"}
        assert latest["stats"][f]["month"] == [pv["month"], pv["month"]]


def test_delete_where_on_partition_column(spark, adopted):
    t = adopted
    t.delete_where(spark, "month = 3", prune_ranges={"month": (3, 3)})
    df = t.read(spark)
    assert df.count() == 60
    assert df.filter("month = 3").count() == 0


def test_update_where_on_partitioned_table(spark, adopted):
    t = adopted
    t.update_where(
        spark,
        {"v": "v + 1"},
        "month = 1",
        prune_ranges={"month": (1, 1)},
    )
    df = t.read(spark)
    assert df.count() == 90
    assert (
        df.filter("month = 1").agg(F.sum("v")).first()[0]
        == df.filter("month = 1").count()
        + 2 * sum(range(0, 90, 3))
    )


def test_compact_preserves_partition_values(spark, adopted):
    t = adopted
    before = sorted(
        tuple(r) for r in t.read(spark).select("k", "year", "month", "v").collect()
    )
    t.compact(spark, target_partitions=1)
    after = sorted(
        tuple(r) for r in t.read(spark).select("k", "year", "month", "v").collect()
    )
    assert after == before
    # compaction output is still hive-laid (one file per partition)
    for f in t._manifest(t.latest_version())["files"]:
        assert set(_path_partitions(f)) == {"year", "month"}


def test_partitioned_ddl_guards(spark, adopted):
    t = adopted
    with pytest.raises(ValueError, match="partition column"):
        t.rename_column("month", "mo")
    with pytest.raises(ValueError, match="partition column"):
        t.drop_column("year")
    with pytest.raises(ValueError, match="not supported"):
        t.clone_to(t.root + "_clone")
    # non-partition columns still rename fine
    t.rename_column("v", "val")
    assert t.read(spark).filter("k = 0").select("val").first()[0] == 0


def test_time_travel_and_restore_keep_partitions(spark, adopted):
    t = adopted
    t.delete_where(spark, "month = 2")
    assert t.read(spark, 0).count() == 90
    t.restore(0)
    df = t.read(spark)
    assert df.count() == 90 and t.partitioned_by() == ["year", "month"]
    assert df.filter("month = 2").count() == 30


def test_lake_sql_convert_partitioned(spark, tmp_path):
    from jde_to_datalake_spark.plans.lake_sql import LakeSQL

    root = str(tmp_path / "lake")
    _hive_dataset(spark, root)
    lk = LakeSQL(spark)
    lk.sql(
        f"CONVERT TO VERSIONED '{root}' AS lake "
        "PARTITIONED BY (year, month)"
    )
    assert lk.tables["lake"].partitioned_by() == ["year", "month"]
    got = lk.sql(
        "SELECT month, count(*) AS n FROM lake GROUP BY month ORDER BY month"
    ).collect()
    assert [(r["month"], r["n"]) for r in got] == [(1, 30), (2, 30), (3, 30)]
    lk.sql("DELETE FROM lake WHERE month = 3")
    assert lk.sql("SELECT count(*) AS c FROM lake").first()["c"] == 60


def test_vacuum_reclaims_partitioned_rewrites(spark, adopted):
    t = adopted
    t.compact(spark, target_partitions=1)
    removed = t.vacuum(keep_last=1, retention_seconds=0)
    assert removed  # old per-partition files (and originals) reclaimed
    assert t.read(spark).count() == 90  # data intact through hard links


def test_stream_carries_partition_columns(spark, adopted, tmp_path):
    """Table-as-stream over a hive-adopted table: partition values are
    injected into the Arrow read from the k=v paths (the pyarrow twin
    of basePath discovery)."""
    from jde_to_datalake_spark.sources.versioned_stream import (
        versioned_stream,
    )

    out = []
    q = (
        versioned_stream(spark, adopted)
        .writeStream.foreachBatch(lambda b, i: out.append(b.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = [r for batch in out for r in batch]
    assert len(rows) == 90
    assert {r["month"] for r in rows} == {1, 2, 3}
    assert all(r["year"] == 2024 for r in rows)


def test_create_partitioned_table_via_commit(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "fresh"))
    df = spark.range(0, 20).select(
        F.col("id").alias("k"), (F.col("id") % 2).cast("int").alias("p")
    )
    t.commit(df, mode="overwrite", partitioned_by=["p"])
    assert t.partitioned_by() == ["p"]
    for f in t._manifest(0)["files"]:
        assert "p=" in f
    assert t.read(spark).count() == 20
    # the layout is immutable
    with pytest.raises(ValueError, match="immutable"):
        t.commit(df, mode="append", partitioned_by=["k"])
    # later writes without the arg keep the layout
    t.commit(
        spark.createDataFrame([(100, 1)], "k bigint, p int"), mode="append"
    )
    assert t.read(spark).count() == 21


def test_lake_sql_ctas_partitioned(spark, tmp_path):
    from jde_to_datalake_spark.plans.lake_sql import LakeSQL

    lk = LakeSQL(spark)
    lk.sql(
        f"CREATE TABLE pt LOCATION '{tmp_path / 'pt'}' "
        "PARTITIONED BY (p) AS "
        "SELECT id AS k, CAST(id % 3 AS INT) AS p FROM range(30)"
    )
    t = lk.tables["pt"]
    assert t.partitioned_by() == ["p"]
    got = lk.sql(
        "SELECT p, count(*) AS n FROM pt GROUP BY p ORDER BY p"
    ).collect()
    assert [(r["p"], r["n"]) for r in got] == [(0, 10), (1, 10), (2, 10)]
    assert len(t.files_for_ranges({"p": (1, 1)})) < len(
        t._manifest(t.latest_version())["files"]
    )


def test_native_sink_routes_partitioned_layout(spark, adopted, tmp_path):
    """writeStream.format('versioned_table') into a hive-partitioned
    table: task files are flat, so the sink's commit must re-lay them
    into k=v directories through the commit() pipeline."""
    from jde_to_datalake_spark.sources.versioned_stream import (
        VersionedTableDataSource,
    )

    spark.dataSource.register(VersionedTableDataSource)
    src_dir = str(tmp_path / "src")
    spark.createDataFrame(
        [(5000, 2026, 4, 1)], "k bigint, year int, month int, v bigint"
    ).repartition(1).write.parquet(src_dir)
    stream = spark.readStream.schema(
        "k bigint, year int, month int, v bigint"
    ).parquet(src_dir)
    q = (
        stream.writeStream.format("versioned_table")
        .option("path", adopted.root)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    t = adopted
    new = set(t._manifest(t.latest_version())["files"]) - set(
        t._manifest(0)["files"]
    )
    assert new and all(
        "year=2026" in f and "month=4" in f for f in new
    )
    df = t.read(spark)
    assert df.count() == 91
    assert df.filter("year = 2026").first()["k"] == 5000


def test_optimize_where_scopes_the_rewrite(spark, adopted):
    """OPTIMIZE <t> WHERE month = 1 (Delta's partition-scoped
    OPTIMIZE): only the matching partition's files rewrite; the rest
    carry by reference."""
    from jde_to_datalake_spark.plans.lake_sql import LakeSQL

    t = adopted
    # create small-file debris inside month=1
    for i in range(2):
        t.commit(
            spark.createDataFrame(
                [(2000 + i, 2024, 1, 5)], "k bigint, year int, month int, v bigint"
            ),
            mode="append",
        )
    lk = LakeSQL(spark)
    lk.register("lake", t)
    before = t.read(spark).count()
    lk.sql("OPTIMIZE lake WHERE month = 1")
    d = t.commit_delta(t.latest_version())
    assert d["remove"] and all("month=1" in f for f in d["remove"])
    assert t.read(spark).count() == before
    # scoped ZORDER: clusters only the targeted slice
    lk.sql("OPTIMIZE lake WHERE month = 2 ZORDER BY (k)")
    d2 = t.commit_delta(t.latest_version())
    assert d2["remove"] and all("month=2" in f for f in d2["remove"])
    assert t.read(spark).count() == before
    with pytest.raises(ValueError, match="simple conjuncts"):
        lk.sql("OPTIMIZE lake WHERE upper(x) = 'A'")


def test_partitioned_read_plans_file_subset(spark, adopted):
    """The pruned read's PHYSICAL scan lists only the stats-surviving
    files — partition pruning is real at the plan level, not a
    post-filter."""
    t = adopted
    picked = set(t.files_for_ranges({"month": (2, 2)}))
    scanned = {
        f.split("/lake/", 1)[1]
        for f in t.read_where_all(spark, {"month": (2, 2)}).inputFiles()
    }
    assert scanned == picked


def test_derive_table_into_partitioned_silver(spark, adopted, tmp_path):
    """Bronze stream -> derived PARTITIONED silver table: the derived
    writer's commits keep the hive layout via stage()."""
    from jde_to_datalake_spark.streaming.derived import derive_table

    silver = VersionedTable(str(tmp_path / "silver"))
    # seed the layout with a first commit (a partitionBy write of an
    # empty frame produces no files, so the seed carries one row)
    silver.commit(
        spark.createDataFrame(
            [(-1, 2024, 1, 0)], "k bigint, year int, month int, v bigint"
        ),
        mode="overwrite",
        partitioned_by=["year", "month"],
    )
    q = derive_table(
        spark,
        adopted,
        silver,
        lambda df: df.filter(F.col("v") % 4 == 0),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination()
    assert silver.partitioned_by() == ["year", "month"]
    exp = adopted.read(spark).filter("v % 4 = 0").count()
    assert silver.read(spark).count() == exp + 1  # + the seed row
    for f in silver._manifest(silver.latest_version())["files"]:
        assert set(_path_partitions(f)) == {"year", "month"}


def test_partition_column_names_validated(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    df = spark.createDataFrame([(1, 2)], "k int, _p int")
    with pytest.raises(ValueError, match="start with a letter"):
        t.commit(df, mode="overwrite", partitioned_by=["_p"])


def test_overwrite_to_empty_stays_readable(spark, adopted):
    t = adopted
    t.commit(t.read(spark).filter("k < 0"), mode="overwrite")
    df = t.read(spark)
    assert df.count() == 0
    assert {"k", "v", "year", "month"} <= set(df.columns)


def test_catalyst_partition_filters_on_adopted_table(spark, adopted):
    """Filters on the partition column surface as Catalyst
    PartitionFilters (genuine partition pruning on the Spark plan),
    while data-column filters still push down to the parquet scan."""
    df = adopted.read(spark).filter(
        (F.col("k") > 10) & (F.col("month") == 2)
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "month" in plan.split(
        "PartitionFilters", 1
    )[1].split("]", 1)[0]
    assert "PushedFilters" in plan and "GreaterThan(k,10" in plan


def test_describe_detail_reports_partitioning(spark, adopted):
    from jde_to_datalake_spark.plans.lake_sql import LakeSQL

    assert adopted.detail()["partitioned_by"] == ["year", "month"]
    lk = LakeSQL(spark)
    lk.register("lake", adopted)
    row = lk.sql("DESCRIBE DETAIL lake").collect()[0]
    assert row["partitioned_by"] == '["year", "month"]'


def test_show_partitions(spark, adopted):
    from jde_to_datalake_spark.plans.lake_sql import LakeSQL

    lk = LakeSQL(spark)
    lk.register("lake", adopted)
    got = {
        (r["year"], r["month"])
        for r in lk.sql("SHOW PARTITIONS lake").collect()
    }
    assert got == {("2024", "1"), ("2024", "2"), ("2024", "3")}
    t2 = VersionedTable(adopted.root + "_flat")
    t2.commit(spark.createDataFrame([(1,)], "k int"), mode="overwrite")
    lk.register("flat", t2)
    with pytest.raises(ValueError, match="not a partitioned"):
        lk.sql("SHOW PARTITIONS flat")


def test_generated_partition_column_contract(spark, tmp_path):
    """Partition columns and generated columns compose only in the
    create-time order Delta also requires: the partition column must
    ride every write from the first commit, and declaring it
    GENERATED afterwards is rejected (existing files were never
    validated against the expression)."""
    t = VersionedTable(str(tmp_path / "t"))
    df = spark.range(0, 40).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    t.commit(
        df.withColumn("bucket", F.expr("CAST(k % 4 AS INT)")),
        mode="overwrite",
        partitioned_by=["bucket"],
    )
    with pytest.raises(ValueError, match="already names a column"):
        t.add_generated_column(spark, "bucket", "CAST(k % 4 AS INT)")
    # writes carrying the derivative keep the layout and its stats
    t.commit(
        spark.createDataFrame(
            [(100, 1, 0)], "k bigint, v bigint, bucket int"
        ),
        mode="append",
    )
    latest = t._manifest(t.latest_version())
    new_f = set(latest["files"]) - set(t._manifest(0)["files"])
    assert new_f and all("bucket=0" in f for f in new_f)
    assert t.read(spark).count() == 41
    assert len(t.files_for_ranges({"bucket": (2, 2)})) < len(latest["files"])


def test_partition_types_identical_across_batch_stream_cdf(
    spark, adopted, tmp_path
):
    """The round-8 drift: the batch basePath scan inferred int for
    small partition values while the stream sniff said bigint — a
    silver table derived via stream got a different schema than one
    derived via batch read of the SAME bronze table. Types are now
    PINNED in the manifest; every surface must agree byte-for-byte."""
    from jde_to_datalake_spark.sources.versioned_stream import (
        VersionedTableDataSource,
        sniff_schema_ddl,
    )

    t = adopted
    pt = t.partition_types()
    assert set(pt) == {"year", "month"}

    batch = t.read(spark)
    batch_schema = {f.name: f.dataType.simpleString()
                    for f in batch.schema.fields}
    # the pinned types ARE the batch types
    for c, ddl in pt.items():
        assert batch_schema[c] == ddl, (c, ddl, batch_schema[c])

    # stream surface: the sniffed DDL produces the same schema
    spark.dataSource.register(VersionedTableDataSource)
    sdf = (
        spark.readStream.format("versioned_table")
        .option("path", t.root)
        .schema(sniff_schema_ddl(t.root))
        .load()
    )
    stream_schema = {f.name: f.dataType.simpleString()
                     for f in sdf.schema.fields}
    assert stream_schema == batch_schema

    # stream rows carry correctly-typed partition constants end-to-end
    out = str(tmp_path / "out")
    q = (
        sdf.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out)
    got_schema = {f.name: f.dataType.simpleString()
                  for f in got.schema.fields}
    assert got_schema == batch_schema
    assert got.count() == batch.count()
    assert (
        got.agg(F.sum("month")).first()[0]
        == batch.agg(F.sum("month")).first()[0]
    )

    # CDF surface: data columns match batch types too
    t.commit(
        spark.createDataFrame(
            [(999, 2025, 7, 0)], "k bigint, year int, month int, v bigint"
        ),
        mode="append",
    )
    cdf = t.read_changes(spark, 0, t.latest_version())
    cdf_schema = {f.name: f.dataType.simpleString()
                  for f in cdf.schema.fields
                  if not f.name.startswith("_")}
    assert cdf_schema == batch_schema


def test_partition_types_pinned_from_commit_frame(spark, tmp_path):
    """A table CREATED partitioned pins the written frame's own
    column types — exact, not path-inferred — and later reads cast
    Spark's per-read inference back to them."""
    t = VersionedTable(str(tmp_path / "tbl"))
    t.commit(
        spark.createDataFrame(
            [(1, 5000000000, "a")], "k int, big bigint, s string"
        ),
        mode="overwrite",
        partitioned_by=["big"],
    )
    assert t.partition_types() == {"big": "bigint"}
    assert dict(
        (f.name, f.dataType.simpleString()) for f in t.read(spark).schema
    )["big"] == "bigint"
    # later commits inherit the pin even if their frame narrows
    t.commit(
        spark.createDataFrame([(2, 7, "b")], "k int, big int, s string"),
        mode="append",
    )
    assert t.partition_types() == {"big": "bigint"}
    assert dict(
        (f.name, f.dataType.simpleString()) for f in t.read(spark).schema
    )["big"] == "bigint"


def test_read_staged_surfaces_partitions_before_first_commit(
    spark, tmp_path
):
    """stage(df, partitioned_by=[...]) before the table's FIRST commit
    has no manifest to consult — the audit surface must still see the
    partition columns (round-8 advisor: they were silently absent
    from write-audit-publish)."""
    t = VersionedTable(str(tmp_path / "tbl"))
    df = spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "b")], "k int, g int, s string"
    )
    staged = t.stage(df, partitioned_by=["g"])
    assert all("g=" in f for f in staged)
    audit = t.read_staged(spark, staged)
    assert "g" in audit.columns
    got = sorted((r["k"], r["g"]) for r in audit.collect())
    assert got == [(1, 10), (2, 20)]


# -- model-based property over a PARTITIONED table ---------------------------
# The flat-table op-sequence property lives in test_versioned.py; this
# variant drives the same DML surface over a hive-partitioned table
# (p = k % 2, functionally dependent on the key) and additionally pins
# the partition-plane invariants after EVERY op: each live data file
# carries a constant min=max stat for p, the pinned partition type
# never drifts, and a batch read and the stream sniff agree on the
# schema — the newest lake layer (round 8-9) exercised by arbitrary
# op interleavings instead of one-scenario tests.

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_POPS = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.lists(st.integers(0, 9), min_size=1, max_size=3)),
        st.tuples(st.just("overwrite"), st.lists(st.integers(0, 9), min_size=1, max_size=3)),
        st.tuples(st.just("merge"), st.lists(st.integers(0, 9), min_size=1, max_size=3)),
        st.tuples(st.just("delete"), st.lists(st.integers(0, 9), min_size=1, max_size=3)),
        st.tuples(st.just("update"), st.lists(st.integers(0, 9), min_size=1, max_size=3)),
        st.tuples(st.just("sync"), st.lists(st.integers(0, 9), min_size=1, max_size=3)),
        st.tuples(st.just("compact"), st.just([])),
        st.tuples(st.just("restore"), st.lists(st.integers(0, 99), min_size=1, max_size=1)),
        st.tuples(st.just("vacuum"), st.just([])),
        st.tuples(st.just("interleaved_vacuum"), st.lists(st.integers(0, 9), min_size=1, max_size=3)),
        st.tuples(st.just("rename"), st.just([])),
    ),
    min_size=1,
    max_size=6,
)


@settings(
    # CI default 6; LAKE_PROP_EXAMPLES=N soaks at depth (pair with
    # LAKE_PROP_STORE=s3 for the object-store leg — see
    # test_versioned._prop_table)
    max_examples=int(os.environ.get("LAKE_PROP_EXAMPLES", "6")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_POPS)
def test_partitioned_op_sequences_match_dict_model(
    spark, tmp_path_factory, ops
):
    from collections import Counter as _C

    from tests.test_versioned import _prop_table

    table = _prop_table(str(tmp_path_factory.mktemp("pvt") / "t"))
    model: "_C" = _C()  # MULTISET of (k, p, v): appends duplicate
    name = "v"  # current LOGICAL name of the value column
    snaps: dict[int, tuple] = {}  # version -> (model items, logical name)
    stamp = 0

    def mk(rows):
        return spark.createDataFrame(rows, ["k", "p", name])

    def commit(rows, mode):
        table.commit(mk(rows), mode=mode, partitioned_by=["p"])

    def _drop_keys(m, ks):
        return _C({t: c for t, c in m.items() if t[0] not in ks})

    def _key_counts(m):
        tot: dict = {}
        for (k, _p, _v), c in m.items():
            tot[k] = tot.get(k, 0) + c
        return tot

    for op, keys in ops:
        stamp += 1
        rows = [(k, k % 2, f"s{stamp}") for k in sorted(set(keys))]
        empty = table.latest_version() is None
        if op == "append":
            commit(rows, "append")
            model.update(rows)
        elif op == "overwrite":
            commit(rows, "overwrite")
            model = _C(rows)
        elif op == "merge":
            if empty:
                commit(rows, "append")
                model.update(rows)
            else:
                # keyed merge collapses a key's duplicates to the one
                # batch row
                table.merge(spark, mk(rows), key="k")
                model = _drop_keys(model, {k for k, _p, _v in rows})
                model.update(rows)
        elif op == "delete":
            if empty:
                continue
            ks = [k for k, _p, _v in rows]
            table.delete_where(spark, F.col("k").isin(ks))
            model = _drop_keys(model, set(ks))
        elif op == "update":
            if empty:
                continue
            upd = {k for k, _p, _v in rows}
            table.update_where(
                spark, {name: F.lit(f"s{stamp}")}, F.col("k").isin(list(upd))
            )
            # EVERY copy of a matched key restamps (duplicates stay)
            nm: "_C" = _C()
            for (k, p, v), c in model.items():
                nm[(k, p, f"s{stamp}" if k in upd else v)] += c
            model = nm
        elif op == "sync":
            if empty:
                continue
            table.merge_into(
                spark,
                mk(rows),
                "k",
                matched=[("update", None, None)],
                not_matched=[("insert", None)],
                not_matched_by_source=[("delete", None)],
            )
            # matched-update restamps EACH duplicate copy (Delta
            # parity); unmatched source keys insert one row
            tot = _key_counts(model)
            model = _C(
                {(k, p, v): max(tot.get(k, 0), 1) for k, p, v in rows}
            )
        elif op == "compact":
            if empty:
                continue
            table.compact(spark)
        elif op == "interleaved_vacuum":
            # vacuum (another handle, plus a disjoint-key merge to
            # force reconciliation) races this handle's merge publish
            # on a PARTITIONED table: the partition-dir rmdir sweep,
            # the trimmed base manifest mid-check, and the pinned
            # partition types must all survive; with retries the merge
            # lands exactly once
            if empty:
                continue
            other = _prop_table(table.root)
            ik = 100 + stamp
            fired = {"done": False}
            real_once = table._publish_once

            def raced_vac(*a, **kw):
                if not fired["done"]:
                    fired["done"] = True
                    other.merge(
                        spark,
                        spark.createDataFrame(
                            [(ik, ik % 2, f"i{stamp}")], ["k", "p", name]
                        ),
                        key="k",
                    )
                    other.vacuum(keep_last=1)  # default retention
                return real_once(*a, **kw)

            table._publish_once = raced_vac
            try:
                table.merge(spark, mk(rows), key="k", retries=3)
            finally:
                table.__dict__.pop("_publish_once", None)
            model = _drop_keys(model, {k for k, _p, _v in rows} | {ik})
            model.update(rows)
            model.update([(ik, ik % 2, f"i{stamp}")])
        elif op == "restore":
            if not snaps:
                continue
            target = sorted(snaps)[keys[0] % len(snaps)]
            table.restore(target)
            model, name = _C(dict(snaps[target][0])), snaps[target][1]
        elif op == "rename":
            # VALUE-column rename is metadata-only even on a
            # partitioned table (partition-column renames are
            # rejected — test_partitioned_ddl_guards); stats keep
            # the physical name, so skipping and the partition
            # plane must be unaffected
            if empty:
                continue
            new = f"v{stamp}"
            table.rename_column(name, new)
            name = new
        else:  # vacuum
            table.vacuum(keep_last=1, retention_seconds=0)
            snaps = {
                v: s for v, s in snaps.items()
                if v == table.latest_version()
            }
        v = table.latest_version()
        if v is not None:
            snaps[v] = (tuple(sorted(model.items())), name)
            # partition-plane invariants hold after EVERY op
            m = table._manifest(v)
            assert m.get("partitioned_by") == ["p"]
            assert table.partition_types(v).get("p") == "bigint"
            stats = m.get("stats", {})
            for f in m["files"]:
                pv = _path_partitions(f).get("p")
                if pv is None:
                    continue  # the flat schema-carrying empty part
                s = stats.get(f, {}).get("p")
                assert s == [pv, pv], (f, s)
        # restore targets must still be retained (the racing-vacuum
        # op trims history through a second handle)
        retained = set(table.versions())
        snaps = {vv: s for vv, s in snaps.items() if vv in retained}

    if table.latest_version() is None:
        assert not model
        return
    got = sorted(
        (r["k"], r["p"], r[name]) for r in table.read(spark).collect()
    )
    assert got == sorted(model.elements())
    # pruning on the partition column reads the p=1 subset only
    if model:
        odd = sorted(
            (r["k"], r["p"], r[name])
            for r in table.read_where_in(spark, "p", [1]).collect()
        )
        assert odd == sorted(t for t in model.elements() if t[1] == 1)
    # batch read and stream sniff agree on the schema (type pinning,
    # logical names after any renames)
    from jde_to_datalake_spark.sources.versioned_stream import (
        sniff_schema_ddl,
    )

    if model:
        batch = table.read(spark).schema.simpleString()
        sniffed = spark.createDataFrame(
            [], sniff_schema_ddl(table.root)
        ).schema.simpleString()
        assert batch == sniffed, (batch, sniffed)

    # CDF invariant with PARTITION COLUMNS in the feed: sign-folding
    # the change stream from the beginning reproduces the final
    # snapshot (k, p, v) exactly — unless vacuum trimmed history, in
    # which case the stream must fail with the retention guidance
    from collections import Counter

    import pyarrow as pa
    from pyspark.sql.types import _parse_datatype_string

    from jde_to_datalake_spark.sources.versioned_stream import (
        CDF_META_DDL,
        VersionedTableStreamReader,
        _cdf_partitions,
    )

    latest = table.latest_version()

    # authoritative check against the LOG, not _manifest: a handle's
    # manifest cache legally outlives a vacuum run through ANOTHER
    # handle (the racing-vacuum op), while the stream reads the log
    if set(range(latest + 1)) - set(table.versions()):
        with pytest.raises(RuntimeError, match="vacuumed"):
            _cdf_partitions(table, -1, latest)
        return
    reader = VersionedTableStreamReader(
        _parse_datatype_string(
            f"k bigint, p bigint, {name} string, {CDF_META_DDL}"
        ),
        {"path": table.root, "read_change_feed": "true"},
    )
    net: Counter = Counter()
    for part in _cdf_partitions(table, -1, latest):
        for out in reader._read_cdf(part):
            if isinstance(out, pa.RecordBatch):
                tb = pa.Table.from_batches([out])
                it = zip(
                    tb.column("k").to_pylist(),
                    tb.column("p").to_pylist(),
                    tb.column(name).to_pylist(),
                    tb.column("_change_type").to_pylist(),
                )
            else:
                it = [(out[0], out[1], out[2], out[3])]
            for k, p, v_, ct in it:
                net[(k, p, v_)] += 1 if ct == "insert" else -1
    # multiset: duplicate rows fold to their exact multiplicity
    assert all(c >= 0 for c in net.values())
    assert Counter({t: c for t, c in net.items() if c > 0}) == model
