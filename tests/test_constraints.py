"""Table-level CHECK constraints (Delta's ALTER TABLE ADD CONSTRAINT):
persisted table metadata, validated against existing data when added,
enforced on every row-adding write, carried through restore/clone,
speaking logical column names under an active rename."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jde_to_datalake_spark.sources.versioned import (
    AuditFailure,
    VersionedTable,
)


@pytest.fixture()
def table(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.commit(
        spark.createDataFrame(
            [(1, 10, "a"), (2, 20, None)], "k bigint, qty bigint, tag string"
        )
    )
    return t


def test_add_validates_existing_then_enforces_writes(spark, table):
    # existing data violates -> the add itself is rejected, nothing saved
    with pytest.raises(ValueError, match="existing rows violate"):
        table.add_constraint(spark, "qty_big", "qty > 15")
    assert table.constraints() == {}
    v = table.add_constraint(spark, "qty_pos", "qty > 0")
    assert table.constraints() == {"qty_pos": "qty > 0"}
    # metadata-only: no data file written
    assert table._manifest(v)["files"] == table._manifest(v - 1)["files"]
    # a violating append is rejected and publishes NOTHING
    with pytest.raises(ValueError, match="qty_pos"):
        table.commit(
            spark.createDataFrame([(3, -5, "x")], "k bigint, qty bigint, tag string"),
            mode="append",
        )
    assert table.latest_version() == v
    # NULL satisfies CHECK (SQL semantics); valid rows pass
    table.commit(
        spark.createDataFrame(
            [(3, None, "x"), (4, 7, "y")], "k bigint, qty bigint, tag string"
        ),
        mode="append",
    )
    assert table.read(spark).count() == 4


def test_merge_and_audited_commit_enforce(spark, table):
    table.add_constraint(spark, "qty_pos", "qty > 0")
    with pytest.raises(ValueError, match="qty_pos"):
        table.merge(
            spark,
            spark.createDataFrame([(2, -1, "z")], "k bigint, qty bigint, tag string"),
            key="k",
        )
    # valid merge still works
    table.merge(
        spark,
        spark.createDataFrame([(2, 99, "z")], "k bigint, qty bigint, tag string"),
        key="k",
    )
    assert {r["qty"] for r in table.read(spark).filter("k = 2").collect()} == {99}
    with pytest.raises(ValueError, match="qty_pos"):
        table.commit_audited(
            spark.createDataFrame([(9, 0, "w")], "k bigint, qty bigint, tag string"),
            checks=[],
        )


def test_drop_constraint_and_unknown_names(spark, table):
    table.add_constraint(spark, "qty_pos", "qty > 0")
    with pytest.raises(ValueError, match="already exists"):
        table.add_constraint(spark, "qty_pos", "qty > 1")
    with pytest.raises(ValueError, match="does not exist"):
        table.drop_constraint("nope")
    table.drop_constraint("qty_pos")
    assert table.constraints() == {}
    table.commit(  # enforcement ended
        spark.createDataFrame([(5, -1, "x")], "k bigint, qty bigint, tag string"),
        mode="append",
    )


def test_constraints_survive_restore_clone_and_log_reconstruction(
    spark, table, tmp_path
):
    v_clean = table.latest_version()
    table.add_constraint(spark, "qty_pos", "qty > 0")
    # a few deltas on top so reconstruction crosses non-checkpoint records
    for i in range(3):
        table.commit(
            spark.createDataFrame(
                [(10 + i, 1 + i, "x")], "k bigint, qty bigint, tag string"
            ),
            mode="append",
        )
    cold = VersionedTable(table.root)
    assert cold.constraints() == {"qty_pos": "qty > 0"}
    clone = table.clone_to(str(tmp_path / "clone"))
    assert clone.constraints() == {"qty_pos": "qty > 0"}
    with pytest.raises(ValueError, match="qty_pos"):
        clone.commit(
            spark.createDataFrame([(9, -9, "x")], "k bigint, qty bigint, tag string"),
            mode="append",
        )
    # restore to the pre-constraint version clears it (metadata rolls back)
    table.restore(v_clean)
    assert table.constraints() == {}


def test_constraints_speak_logical_names_under_rename(spark, table):
    table.rename_column("qty", "quantity")
    table.add_constraint(spark, "q_pos", "quantity > 0")
    with pytest.raises(ValueError, match="q_pos"):
        table.commit(
            spark.createDataFrame(
                [(7, -1, "x")], "k bigint, quantity bigint, tag string"
            ),
            mode="append",
        )
    table.commit(
        spark.createDataFrame(
            [(7, 1, "x")], "k bigint, quantity bigint, tag string"
        ),
        mode="append",
    )
    assert table.read(spark).filter("k = 7").count() == 1
