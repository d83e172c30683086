"""Property test: SQL DML is prune-safe for ARBITRARY predicates.

``UPDATE``/``DELETE`` statements feed ``_infer_prune_ranges`` to skip
files by footer stats before evaluating the predicate — an UNSOUND
inference silently leaves matching rows untouched (it does not crash,
it corrupts). Exactly this class produced two real bugs found by
execution review (a space-separated ``TIMESTAMP`` literal sorting
before the stats' 'T' form pruned every file of the bound's day;
top-level OR folded as if it were AND), so the pruning layer gets a
generator: random predicates mixing int / string / timestamp atoms,
AND/OR nesting, BETWEEN, IN, and the SQL-standard space-separated
temporal literal form — a DELETE must remove exactly the rows Spark's
own evaluation of the same predicate matches, and an UPDATE must
restamp exactly those, no matter what the pruner inferred (soundness;
pruning is only ever allowed to be a fast path).

The table is committed via ``repartitionByRange`` on k so files carry
NARROW disjoint footer stats — the regime where wrong pruning is
observable (one file per range; a single-file table would mask it).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from jde_to_datalake_spark.plans.lake_sql import LakeSQL
from jde_to_datalake_spark.sources.versioned import VersionedTable

HS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# 40 rows: k 0..39, s cycles a..d, ts spans 3 days of 2024-06 with a
# mid-day time component (so date-boundary bounds genuinely split)
_N = 40


def _seed_df(spark):
    # plain literal rows on purpose: an expression-built seed
    # (element_at over id % 4) let Catalyst propagate an impossible
    # filter constraint (k = -1) INTO the projection and ANSI-throw on
    # the folded element_at(arr, 0) — the hazard class the verify
    # notes call out; literals have nothing to fold
    import datetime as dt

    rows = [
        (
            i,
            "abcd"[i % 4],
            dt.datetime(2024, 6, 28 + i % 3, i % 24, 30, 0),
        )
        for i in range(_N)
    ]
    return spark.createDataFrame(rows, "k bigint, s string, ts timestamp")


@st.composite
def predicate(draw):
    def atom():
        kind = draw(st.sampled_from(
            ["k_cmp", "k_between", "k_in", "s_eq", "s_in", "ts_cmp",
             "ts_date"]
        ))
        if kind == "k_cmp":
            op = draw(st.sampled_from(["<", "<=", ">", ">=", "="]))
            return f"k {op} {draw(st.integers(-2, _N + 2))}"
        if kind == "k_between":
            a = draw(st.integers(-2, _N))
            return f"k BETWEEN {a} AND {a + draw(st.integers(0, 10))}"
        if kind == "k_in":
            vals = draw(st.lists(st.integers(0, _N), min_size=1,
                                 max_size=3))
            return f"k IN ({', '.join(map(str, vals))})"
        if kind == "s_eq":
            return f"s = '{draw(st.sampled_from('abcdz'))}'"
        if kind == "s_in":
            vals = draw(st.lists(st.sampled_from("abcdz"), min_size=1,
                                 max_size=2))
            return "s IN ({})".format(", ".join(f"'{v}'" for v in vals))
        day = draw(st.integers(27, 32))
        day = min(day, 30)
        hh = draw(st.integers(0, 23))
        lit = f"2024-06-{day:02d} {hh:02d}:59:59"
        if kind == "ts_date":
            return f"ts {draw(st.sampled_from(['<', '>=']))} DATE '2024-06-{day:02d}'"
        op = draw(st.sampled_from(["<", "<=", ">", ">="]))
        # the SQL-standard SPACE-separated literal — the exact form
        # the round-8 advisor bug mis-pruned
        return f"ts {op} TIMESTAMP '{lit}'"

    n = draw(st.integers(1, 3))
    parts = [atom() for _ in range(n)]
    out = parts[0]
    for p in parts[1:]:
        out = f"{out} {draw(st.sampled_from(['AND', 'OR']))} {p}"
    return out


@pytest.mark.soak
@HS
@given(pred=predicate())
def test_delete_matches_spark_filter_exactly(spark, tmp_path_factory, pred):
    root = str(tmp_path_factory.mktemp("sqlprune") / "t")
    t = VersionedTable(root)
    seed = _seed_df(spark)
    t.commit(
        seed.repartitionByRange(6, "k").sortWithinPartitions("k"),
        mode="overwrite",
    )
    lk = LakeSQL(spark)
    lk.register("t", t)
    expect_removed = {
        r["k"] for r in seed.filter(F.expr(pred)).collect()
    }
    lk.sql(f"DELETE FROM t WHERE {pred}")
    remaining = {r["k"] for r in t.read(spark).collect()}
    assert remaining == set(range(_N)) - expect_removed, (
        f"pred={pred!r}: removed {set(range(_N)) - remaining} "
        f"but Spark matches {expect_removed}"
    )


@pytest.mark.soak
@HS
@given(pred=predicate())
def test_update_restamps_spark_filter_exactly(spark, tmp_path_factory, pred):
    root = str(tmp_path_factory.mktemp("sqlpruneu") / "t")
    t = VersionedTable(root)
    seed = _seed_df(spark)
    t.commit(
        seed.repartitionByRange(6, "k").sortWithinPartitions("k"),
        mode="overwrite",
    )
    lk = LakeSQL(spark)
    lk.register("t", t)
    expect_hit = {r["k"] for r in seed.filter(F.expr(pred)).collect()}
    lk.sql(f"UPDATE t SET s = 'HIT' WHERE {pred}")
    got_hit = {
        r["k"] for r in t.read(spark).filter(F.col("s") == "HIT").collect()
    }
    n = t.read(spark).count()
    assert n == _N  # UPDATE never changes cardinality
    assert got_hit == expect_hit, (
        f"pred={pred!r}: restamped {got_hit} vs Spark {expect_hit}"
    )
