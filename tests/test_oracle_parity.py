"""Driver-gate mirror: every queries() entry with an oracle must
hash-match DuckDB on the same parquet tables (here at sf0.001 for
speed; the driver runs sf0.01)."""

from __future__ import annotations

import pytest

import __spark_entry__ as E
from tests.conftest import run_parity

ORACLE_NAMES = sorted(E.oracle_sql().keys())


def test_registry_consistency():
    qs = E.queries()
    oracles = E.oracle_sql()
    assert qs, "queries() is empty"
    missing = set(oracles) - set(qs)
    assert not missing, f"oracles without queries: {missing}"


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_parity(spark, duck, name):
    run_parity(spark, duck, name)


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema.fieldNames()
