"""Fuzzy join: DuckDB oracle parity + blocking-recall properties."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from jde_to_datalake_spark.operators.fuzzy import fuzzy_join
from jde_to_datalake_spark.session import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def names(spark):
    """Two drifted name sets derived from part names (deterministic)."""
    p = load_table(spark, SF_DIR, "part").select(
        F.lower(F.trim("p_name")).alias("name")
    )
    left = p.select("name")
    # right side: drop the last character of every name starting
    # before 'm' (edit distance 1 from its source), keep the rest
    right = p.select(
        F.when(
            F.col("name").substr(F.lit(1), F.lit(1)) < F.lit("m"),
            F.expr("substring(name, 1, length(name) - 1)"),
        ).otherwise(F.col("name")).alias("name")
    )
    return left, right


def test_matches_duckdb_exact_levenshtein(spark, names):
    """Blocked+verified pairs == DuckDB's brute-force levenshtein join.

    max_df is effectively off here, so the only possible recall gap
    would be distance<=1 pairs sharing NO 2-gram — impossible for
    normalized names longer than 2 chars with one edit."""
    left, right = names
    got = {
        (r.left_name, r.right_name, r.distance)
        for r in fuzzy_join(
            left, right, "name", "name", max_distance=1, q=2, max_df=10**6
        ).collect()
    }
    la = [r.name for r in left.distinct().collect()]
    lb = [r.name for r in right.distinct().collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE a(name VARCHAR)")
    con.executemany("INSERT INTO a VALUES (?)", [(x,) for x in la])
    con.execute("CREATE TABLE b(name VARCHAR)")
    con.executemany("INSERT INTO b VALUES (?)", [(x,) for x in lb])
    expected = set(
        con.execute(
            "SELECT a.name, b.name, levenshtein(a.name, b.name) AS d "
            "FROM a, b WHERE levenshtein(a.name, b.name) <= 1"
        ).fetchall()
    )
    assert got == expected
    assert got, "no fuzzy matches found at all — fixture degenerate"


def test_exact_matches_have_distance_zero(spark, names):
    left, _ = names
    out = fuzzy_join(left, left, "name", "name", max_distance=0, q=2).collect()
    assert out and all(
        r.distance == 0 and r.left_name == r.right_name for r in out
    )


def test_stop_gram_guard_only_affects_blocking(spark):
    """With max_df=0 every gram is a stop-gram -> no candidates, no
    errors (the documented recall trade, made visible)."""
    left = spark.createDataFrame([("widget x",)], ["name"])
    out = fuzzy_join(left, left, "name", "name", max_distance=1, q=2, max_df=0)
    assert out.count() == 0


def test_length_prune_is_safe(spark):
    """Names whose lengths differ by more than k are never emitted,
    and a distance-k pair with equal lengths survives."""
    l = spark.createDataFrame([("abcdef",), ("abc",)], ["name"])
    r = spark.createDataFrame([("abcdxf",), ("abcdefgh",)], ["name"])
    got = {
        (x.left_name, x.right_name)
        for x in fuzzy_join(l, r, "name", "name", max_distance=1, q=2).collect()
    }
    assert ("abcdef", "abcdxf") in got
    assert all(abs(len(a) - len(b)) <= 1 for a, b in got)


def test_short_names_block_via_whole_self_gram(spark):
    """len < q strings still match each other (the whole-self gram)."""
    l = spark.createDataFrame([("a",)], ["name"])
    r = spark.createDataFrame([("a",), ("b",)], ["name"])
    got = {
        (x.left_name, x.right_name, x.distance)
        for x in fuzzy_join(l, r, "name", "name", max_distance=1, q=2).collect()
    }
    assert ("a", "a", 0) in got


# -- hypothesis properties ---------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

HS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_WORD = st.text(alphabet="abcdefgh", min_size=4, max_size=12)


@HS
@given(
    base=_WORD,
    pos=st.integers(min_value=0, max_value=11),
    ch=st.sampled_from("xyz"),
    op=st.sampled_from(["sub", "ins", "del"]),
)
def test_recall_guarantee_one_edit(spark, base, pos, ch, op):
    """For names longer than q*(k+1)-1 = 3 chars, a single edit is
    ALWAYS recalled (the documented q-gram blocking bound)."""
    pos = pos % len(base)
    if op == "sub":
        edited = base[:pos] + ch + base[pos + 1:]
    elif op == "ins":
        edited = base[:pos] + ch + base[pos:]
    else:
        edited = base[:pos] + base[pos + 1:]
    if len(edited) <= 3 or edited == base:
        return  # outside the guarantee / zero-distance
    l = spark.createDataFrame([(base,)], ["name"])
    r = spark.createDataFrame([(edited,)], ["name"])
    got = {
        (x.left_name, x.right_name)
        for x in fuzzy_join(
            l, r, "name", "name", max_distance=1, q=2, max_df=10**6
        ).collect()
    }
    assert (base, edited) in got
