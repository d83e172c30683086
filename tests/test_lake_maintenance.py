"""Lake maintenance: stats, compaction, clustered/z-ordered layout
(sources/lake_maintenance.py). The data-skipping tests assert via
executed-plan SQLMetrics, not via claims: a clustered layout must make
the scan *read fewer rows* for the same predicate."""

from __future__ import annotations

from pyspark.sql import functions as F

from jde_to_datalake_spark.plans.metrics import profile
from jde_to_datalake_spark.sources.lake_maintenance import (
    compact_partitions,
    compaction_candidates,
    partition_file_stats,
    write_clustered,
    write_zordered,
    zorder_value,
)

SF = "/root/testdata/sf0.001"


def test_partition_file_stats_counts_files(spark, tmp_path):
    root = str(tmp_path / "lake")
    df = spark.range(1000).withColumn("pk", (F.col("id") % 3).cast("int"))
    # many tasks x partitionBy -> several files per partition
    df.repartition(4).write.partitionBy("pk").parquet(root)
    stats = partition_file_stats(spark, root)
    assert [s.partition for s in stats] == ["pk=0", "pk=1", "pk=2"]
    assert all(s.n_files >= 2 for s in stats)
    assert all(s.total_bytes > 0 for s in stats)


def test_compaction_rewrites_small_files_preserving_rows(spark, tmp_path):
    root = str(tmp_path / "lake")
    df = spark.range(2000).withColumn("pk", (F.col("id") % 2).cast("int"))
    df.repartition(8).write.partitionBy("pk").parquet(root)
    before = spark.read.parquet(root)
    before_rows = before.count()
    before_sum = before.agg(F.sum("id")).collect()[0][0]
    stats = partition_file_stats(spark, root)
    assert all(s.n_files == 8 for s in stats)

    report = compact_partitions(spark, root, target_bytes=1 << 30)
    assert {r["partition"] for r in report} == {"pk=0", "pk=1"}
    assert all(r["files_after"] == 1 for r in report)

    after_stats = partition_file_stats(spark, root)
    # one data file (+ possibly a _SUCCESS marker, excluded by stats)
    assert all(s.n_files == 1 for s in after_stats)
    after = spark.read.parquet(root)
    assert after.count() == before_rows
    assert after.agg(F.sum("id")).collect()[0][0] == before_sum
    # partition column still usable for pruning
    assert after.filter(F.col("pk") == 1).count() == 1000


def test_compaction_candidates_skip_already_compact(spark, tmp_path):
    root = str(tmp_path / "lake")
    spark.range(100).coalesce(1).write.parquet(root)
    stats = partition_file_stats(spark, root)
    assert compaction_candidates(stats, target_bytes=1 << 30) == []
    # and compact_partitions is then a no-op
    assert compact_partitions(spark, root, target_bytes=1 << 30) == []


def test_clustered_write_skips_files_on_range_predicate(spark, tmp_path):
    clustered = str(tmp_path / "clustered")
    unclustered = str(tmp_path / "unclustered")
    # l_shipdate lands as TIMESTAMP_NTZ; cluster on its DATE derivative
    # (NTZ predicates never convert to parquet stats filters — see
    # module docstring; asserted separately below)
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey",
        F.col("l_shipdate").cast("date").alias("l_shipdate"),
        "l_quantity",
    )
    write_clustered(lineitem, clustered, ["l_shipdate"], n_files=8)
    # same content, same file count, random order
    lineitem.repartition(8).write.parquet(unclustered)

    pred = F.col("l_shipdate") >= "2001-06-01"  # last ~6% of dates
    p_clu = profile(spark.read.parquet(clustered).filter(pred))
    p_unc = profile(spark.read.parquet(unclustered).filter(pred))
    assert p_clu["output_rows"] == p_unc["output_rows"]  # same answer
    # row-group stats prune: the clustered scan reads only the files
    # whose min/max overlap the predicate; the random layout reads all
    assert p_unc["scan_rows"] == lineitem.count()
    assert p_clu["scan_rows"] < p_unc["scan_rows"] / 3


def test_timestamp_ntz_clustering_does_not_skip(spark, tmp_path):
    """Regression pin for the caveat: an NTZ cluster key shows pushed
    filters but prunes nothing — if a Spark upgrade makes this start
    skipping, the docstring (and the guidance) should flip."""
    path = str(tmp_path / "ntz")
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_shipdate"
    )
    assert lineitem.schema["l_shipdate"].dataType.typeName() == "timestamp_ntz"
    write_clustered(lineitem, path, ["l_shipdate"], n_files=8)
    p = profile(
        spark.read.parquet(path).filter(F.col("l_shipdate") >= "2001-06-01")
    )
    assert p["scan_rows"] == lineitem.count()  # no row-group skipped


def test_zorder_value_bits_and_locality(spark):
    df = spark.range(1024).select(
        F.col("id").alias("x"), (1023 - F.col("id")).alias("y")
    )
    work, z = zorder_value(df, ["x", "y"], bits_per_col=4)
    vals = work.withColumn("z", z).select("z").collect()
    zs = [r["z"] for r in vals]
    # 4 bits x 2 cols -> values live in [0, 256)
    assert 0 <= min(zs) and max(zs) < 256


def test_zordered_write_skips_on_each_dimension(spark, tmp_path):
    zpath = str(tmp_path / "zord")
    rpath = str(tmp_path / "rand")
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    n = orders.count()
    write_zordered(orders, zpath, ["o_custkey", "o_totalprice"], n_files=16, bits_per_col=6)
    orders.repartition(16).write.parquet(rpath)

    zdf = spark.read.parquet(zpath)
    assert set(zdf.columns) == set(orders.columns)  # helpers dropped

    for pred in [
        F.col("o_custkey") < 50,                 # dimension 1
        F.col("o_totalprice") > 400000.0,        # dimension 2
    ]:
        pz = profile(spark.read.parquet(zpath).filter(pred))
        pr = profile(spark.read.parquet(rpath).filter(pred))
        assert pz["output_rows"] == pr["output_rows"]
        assert pr["scan_rows"] == n
        assert pz["scan_rows"] < n * 0.7  # skips on EITHER dimension


def test_compaction_keeps_clustering_when_asked(spark, tmp_path):
    root = str(tmp_path / "lake")
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey",
        F.col("l_shipdate").cast("date").alias("l_shipdate"),
        "l_quantity",
    )
    # land as many small files (the dispatch-per-call pattern)
    lineitem.repartition(16).write.parquet(root)
    report = compact_partitions(
        spark, root, target_bytes=1 << 14, sort_within_by=["l_shipdate"]
    )
    assert report and report[0]["files_before"] == 16
    n_after = report[0]["files_after"]
    assert 1 < n_after < 16  # target-sized, not single-file

    pred = F.col("l_shipdate") >= "2001-06-01"
    p = profile(spark.read.parquet(root).filter(pred))
    assert p["scan_rows"] < lineitem.count()  # stats tight post-compact
