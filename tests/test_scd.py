"""SCD Type 2 maintenance over the versioned table (sources/scd.py —
the lakehouse form of the reference's dated snapshot history,
backend/s3_helper.py:45-75)."""

import pytest
from pyspark.sql import functions as F

from jde_to_datalake_spark.sources.scd import apply_scd2, scd2_batch_writer
from jde_to_datalake_spark.sources.versioned import VersionedTable


@pytest.fixture()
def dim(tmp_path):
    return VersionedTable(str(tmp_path / "dim"))


def _batch(spark, rows):
    return spark.createDataFrame(rows, ["item", "status", "price", "ts"])


def _rows(spark, dim):
    return sorted(tuple(r) for r in dim.read(spark).collect())


KW = dict(key="item", tracked=["status", "price"], ts_col="ts")


def _apply(spark, dim, rows, **kw):
    return apply_scd2(spark, dim, _batch(spark, rows), "item",
                      ["status", "price"], "ts", **kw)


def test_first_batch_creates_current_rows(spark, dim):
    _apply(spark, dim, [(1, "a", 10.0, 100), (2, "b", 20.0, 100)])
    assert _rows(spark, dim) == [
        (1, "a", 10.0, 100, None, True),
        (2, "b", 20.0, 100, None, True),
    ]


def test_change_closes_and_opens(spark, dim):
    _apply(spark, dim, [(1, "a", 10.0, 100)])
    _apply(spark, dim, [(1, "a", 11.0, 200)])
    assert _rows(spark, dim) == [
        (1, "a", 10.0, 100, 200, False),
        (1, "a", 11.0, 200, None, True),
    ]


def test_unchanged_attributes_are_not_versioned(spark, dim):
    v0 = _apply(spark, dim, [(1, "a", 10.0, 100)])
    v1 = _apply(spark, dim, [(1, "a", 10.0, 500)])  # newer ts, same attrs
    assert v1 == v0  # no churn version, no commit at all
    assert _rows(spark, dim) == [(1, "a", 10.0, 100, None, True)]


def test_stale_timestamp_is_skipped(spark, dim):
    _apply(spark, dim, [(1, "a", 10.0, 100)])
    v = _apply(spark, dim, [(1, "a", 99.0, 50)])  # older than valid_from
    assert _rows(spark, dim) == [(1, "a", 10.0, 100, None, True)]
    assert v == dim.latest_version()


def test_sequence_by_latest_per_key_within_batch(spark, dim):
    _apply(spark, dim, [(1, "a", 10.0, 100)])
    _apply(spark, dim, [(1, "a", 12.0, 300), (1, "a", 13.0, 400)])
    cur = [r for r in _rows(spark, dim) if r[5]]
    assert cur == [(1, "a", 13.0, 400, None, True)]


def test_exactly_one_current_row_per_key_under_many_batches(spark, dim):
    for ts in range(1, 6):
        _apply(
            spark,
            dim,
            [(1, "a", float(ts), ts * 100), (2, "b", float(-ts), ts * 100)],
        )
    rows = _rows(spark, dim)
    from collections import Counter

    cur = Counter(r[0] for r in rows if r[5])
    assert cur == {1: 1, 2: 1}
    # each key's history chains: every close timestamp is the next
    # version's open timestamp
    for k in (1, 2):
        hist = sorted((r for r in rows if r[0] == k), key=lambda r: r[3])
        for a, b in zip(hist, hist[1:]):
            assert a[4] == b[3]


def test_partial_rewrite_carries_untouched_files(spark, dim):
    for i in range(4):
        _apply(spark, dim, [(i, "a", float(i), 100)])
    v0 = dim.latest_version()
    v1 = _apply(spark, dim, [(2, "a", 99.0, 200)])
    m0, m1 = set(dim._manifest(v0)["files"]), set(dim._manifest(v1)["files"])
    assert m0 & m1, "files without batch keys carried by reference"


def test_bookkeeping_column_collision_raises(spark, dim):
    df = spark.createDataFrame([(1, "a", 100, True)],
                               ["item", "status", "ts", "is_current"])
    with pytest.raises(ValueError, match="bookkeeping"):
        apply_scd2(spark, dim, df, "item", ["status"], "ts")


def test_missing_column_raises(spark, dim):
    df = spark.createDataFrame([(1, 100)], ["item", "ts"])
    with pytest.raises(ValueError, match="lacks column"):
        apply_scd2(spark, dim, df, "item", ["status"], "ts")


def test_null_keys_are_dropped(spark, dim):
    df = spark.createDataFrame(
        [(None, "a", 1.0, 100), (1, "a", 1.0, 100)],
        "item int, status string, price double, ts int",
    )
    apply_scd2(spark, dim, df, "item", ["status", "price"], "ts")
    assert [r[0] for r in _rows(spark, dim)] == [1]


def test_speaks_logical_names_under_rename(spark, dim):
    _apply(spark, dim, [(1, "a", 10.0, 100)])
    dim.rename_column("status", "state")
    df = spark.createDataFrame([(1, "b", 10.0, 200)],
                               ["item", "state", "price", "ts"])
    apply_scd2(spark, dim, df, "item", ["state", "price"], "ts")
    got = sorted(tuple(r) for r in dim.read(spark).collect())
    assert dim.read(spark).columns[1] == "state"
    assert got == [
        (1, "a", 10.0, 100, 200, False),
        (1, "b", 10.0, 200, None, True),
    ]


def test_writer_is_exactly_once_with_app_id(spark, dim):
    write = scd2_batch_writer(dim, "item", ["status", "price"], "ts",
                              app_id="scd-test")
    write(_batch(spark, [(1, "a", 10.0, 100)]), 0)
    v1 = dim.latest_version()
    write(_batch(spark, [(1, "a", 11.0, 200)]), 1)
    v2 = dim.latest_version()
    assert v2 == v1 + 1
    # crash-window re-delivery of batch 1: skipped outright
    write(_batch(spark, [(1, "a", 11.0, 200)]), 1)
    assert dim.latest_version() == v2
    assert _rows(spark, dim) == [
        (1, "a", 10.0, 100, 200, False),
        (1, "a", 11.0, 200, None, True),
    ]


def test_history_reports_scd2_operation(spark, dim):
    _apply(spark, dim, [(1, "a", 10.0, 100)])
    _apply(spark, dim, [(1, "a", 11.0, 200)])
    assert [h["operation"] for h in dim.history()] == ["SCD2", "SCD2"]


def test_custom_bookkeeping_column_names(spark, dim):
    _apply(spark, dim, [(1, "a", 10.0, 100)],
           start_col="eff_from", end_col="eff_to", current_col="live")
    _apply(spark, dim, [(1, "b", 10.0, 200)],
           start_col="eff_from", end_col="eff_to", current_col="live")
    df = dim.read(spark)
    assert df.columns == ["item", "status", "price", "eff_from", "eff_to", "live"]
    assert sorted(tuple(r) for r in df.collect()) == [
        (1, "a", 10.0, 100, 200, False),
        (1, "b", 10.0, 200, None, True),
    ]


# -- CDC delete events ------------------------------------------------------


def _dbatch(spark, rows):
    return spark.createDataFrame(
        rows, "item int, status string, price double, ts int, deleted boolean"
    )


def _dapply(spark, dim, rows):
    return apply_scd2(spark, dim, _dbatch(spark, rows), "item",
                      ["status", "price"], "ts", delete_col="deleted")


def test_delete_event_closes_without_reopening(spark, dim):
    _dapply(spark, dim, [(1, "a", 10.0, 100, False)])
    _dapply(spark, dim, [(1, None, None, 200, True)])
    assert _rows(spark, dim) == [(1, "a", 10.0, 100, 200, False)]


def test_delete_then_reinsert_reopens(spark, dim):
    _dapply(spark, dim, [(1, "a", 10.0, 100, False)])
    _dapply(spark, dim, [(1, None, None, 200, True)])
    _dapply(spark, dim, [(1, "b", 11.0, 300, False)])
    assert _rows(spark, dim) == [
        (1, "a", 10.0, 100, 200, False),
        (1, "b", 11.0, 300, None, True),
    ]


def test_delete_for_unknown_key_is_ignored(spark, dim):
    v0 = _dapply(spark, dim, [(1, "a", 10.0, 100, False)])
    v1 = _dapply(spark, dim, [(9, None, None, 200, True)])
    assert v1 == v0
    assert _rows(spark, dim) == [(1, "a", 10.0, 100, None, True)]


def test_stale_delete_is_skipped(spark, dim):
    _dapply(spark, dim, [(1, "a", 10.0, 100, False)])
    v = _dapply(spark, dim, [(1, None, None, 50, True)])
    assert _rows(spark, dim) == [(1, "a", 10.0, 100, None, True)]
    assert v == dim.latest_version()


def test_delete_flag_never_lands_in_dimension(spark, dim):
    _dapply(spark, dim, [(1, "a", 10.0, 100, False)])
    assert "deleted" not in dim.read(spark).columns


def test_first_batch_drops_delete_events(spark, dim):
    _dapply(spark, dim, [(1, "a", 10.0, 100, False), (2, None, None, 100, True)])
    assert [r[0] for r in _rows(spark, dim)] == [1]


# -- streaming end-to-end ----------------------------------------------------


def test_scd2_from_cdc_stream_end_to_end(spark, tmp_path):
    """Bronze CDC table -> versioned stream -> foreachBatch SCD-2
    dimension, across two availableNow runs with a shared checkpoint
    (the full pipeline a warehouse sync would run)."""
    from jde_to_datalake_spark.sources.versioned_stream import versioned_stream
    from jde_to_datalake_spark.streaming.ingest import checkpoint_app_id

    src = VersionedTable(str(tmp_path / "cdc"))
    dim = VersionedTable(str(tmp_path / "dim"))
    ckpt = str(tmp_path / "ckpt")
    schema = "item bigint, status string, price double, ts bigint"

    def cdc(rows):
        src.commit(spark.createDataFrame(rows, schema), mode="append")

    def run():
        app = checkpoint_app_id(ckpt)
        q = (
            versioned_stream(spark, src, schema=schema)
            .writeStream.foreachBatch(
                scd2_batch_writer(dim, "item", ["status", "price"], "ts",
                                  app_id=app)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    cdc([(1, "a", 10.0, 100), (2, "b", 20.0, 100)])
    run()
    cdc([(1, "a", 11.0, 200), (3, "c", 30.0, 200)])
    run()
    # re-run with nothing new: dimension untouched
    v = dim.latest_version()
    run()
    assert dim.latest_version() == v
    assert sorted(tuple(r) for r in dim.read(spark).collect()) == [
        (1, "a", 10.0, 100, 200, False),
        (1, "a", 11.0, 200, None, True),
        (2, "b", 20.0, 100, None, True),
        (3, "c", 30.0, 200, None, True),
    ]


def test_empty_batch_is_noop(spark, dim):
    empty = spark.createDataFrame(
        [], "item int, status string, price double, ts int"
    )
    # on a fresh table: nothing to create
    assert apply_scd2(spark, dim, empty, "item", ["status", "price"], "ts") is None
    # on a populated table: current version unchanged
    v0 = _apply(spark, dim, [(1, "a", 10.0, 100)])
    assert apply_scd2(spark, dim, empty, "item", ["status", "price"], "ts") == v0


def test_stale_redelivery_cannot_resurrect_closed_key(spark, dim):
    """At-least-once CDC: redelivering the ORIGINAL upsert after the
    key was deleted must not reopen it with stale data (a closed key
    reopens only for a strictly newer timestamp)."""
    _dapply(spark, dim, [(1, "a", 10.0, 100, False)])
    _dapply(spark, dim, [(1, None, None, 200, True)])
    v = dim.latest_version()
    assert _dapply(spark, dim, [(1, "a", 10.0, 100, False)]) == v
    assert _rows(spark, dim) == [(1, "a", 10.0, 100, 200, False)]
    # an in-between stale upsert (newer than the open, older than the
    # close) is equally dead
    assert _dapply(spark, dim, [(1, "b", 9.9, 150, False)]) == v
    assert _rows(spark, dim) == [(1, "a", 10.0, 100, 200, False)]
