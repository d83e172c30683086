"""Shared fixtures: one SparkSession per test run + DuckDB oracle harness.

``assert_parity`` mirrors the driver's t2 gate: run the Spark query and
the DuckDB oracle on the same parquet tables, sort columns by name,
sort rows, and compare values exactly (floats included — the engine's
decimal-staging convention makes aggregates bit-identical, so exact
comparison is the honest check).
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="session")
def spark():
    from jde_to_datalake_spark.session import get_spark

    s = get_spark("tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    yield con
    con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        elif df[c].dtype == object:
            had_decimal = df[c].map(lambda v: hasattr(v, "as_tuple")).any()
            if had_decimal:
                # Decimal -> float64 (a *float-kind* column on both engines:
                # DuckDB DECIMAL and Spark DecimalType both land here)
                df[c] = df[c].map(
                    lambda v: float(v) if v is not None else None
                ).astype("float64")
    sort_cols = list(df.columns)
    return df.sort_values(sort_cols, kind="mergesort", na_position="last").reset_index(
        drop=True
    )


def _dtype_kind(s: pd.Series) -> str:
    """Coarse dtype class; the driver's value hash is type-sensitive, so
    an int64 Spark column vs a float64 oracle column (e.g. DuckDB
    HUGEINT -> float64 on fetch_df) must FAIL here, not pass via
    ``100 == 100.0`` — the exact laxness that let round 1's four
    hash-fail oracles slip through the local harness."""
    dt = s.dtype
    if pd.api.types.is_bool_dtype(dt):
        return "bool"
    if pd.api.types.is_integer_dtype(dt):
        return "int"
    if pd.api.types.is_float_dtype(dt):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(dt):
        return "datetime"
    return "object"


def _values_equal(a, b) -> bool:
    if pd.isna(a) and pd.isna(b):
        return True
    if isinstance(a, float) and isinstance(b, float):
        return a == b or (math.isnan(a) and math.isnan(b))
    return a == b


def compare_frames(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str):
    got = _normalize(spark_pdf)
    exp = _normalize(duck_pdf)
    assert sorted(got.columns) == sorted(exp.columns), (
        f"{name}: columns differ: {sorted(got.columns)} vs {sorted(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name}: row count {len(got)} vs {len(exp)}"
    for c in got.columns:
        gk, ek = _dtype_kind(got[c]), _dtype_kind(exp[c])
        # all-null columns degrade to object on either side; only enforce
        # kinds when both sides actually carry typed values
        if got[c].notna().any() and exp[c].notna().any():
            assert gk == ek, (
                f"{name}: column {c} dtype-kind mismatch: spark={gk} "
                f"({got[c].dtype}) vs oracle={ek} ({exp[c].dtype}) — "
                "the driver's typed hash would fail this"
            )
    for c in got.columns:
        gv, ev = got[c].tolist(), exp[c].tolist()
        bad = [
            (i, a, b)
            for i, (a, b) in enumerate(zip(gv, ev))
            if not _values_equal(a, b)
        ]
        assert not bad, (
            f"{name}: column {c} mismatches (first 5 of {len(bad)}): {bad[:5]}"
        )


def run_parity(spark, duck, name: str, sf_dir: str = SF_DIR):
    import __spark_entry__ as E

    q = E.queries()[name]
    sql = E.oracle_sql().get(name)
    spark_pdf = q(spark, sf_dir).toPandas()
    assert sql is not None, f"{name}: no oracle registered"
    duck_pdf = duck.execute(sql).fetch_df()
    compare_frames(spark_pdf, duck_pdf, name)
    return spark_pdf
