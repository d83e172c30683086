"""Empty-input totality: EVERY registered query must evaluate on
zero-row tables (correct schemas, no rows) without raising.

Catches ANSI edge cases (aggregates over nothing, element_at on
nothing, windows over nothing) and any hidden assumption that a
scan is non-empty — at 100 TB a date-partition read regularly
returns zero rows and must compose cleanly.
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as E
from jde_to_datalake_spark.session import load_table
from tests.conftest import SF_DIR, TABLES


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        df = load_table(spark, SF_DIR, t)
        df.filter("1 = 0").coalesce(1).write.parquet(
            os.path.join(str(out), f"{t}.parquet")
        )
    return str(out)


@pytest.mark.parametrize("name", sorted(E.queries().keys()))
def test_query_total_on_empty_inputs(spark, empty_sf_dir, name):
    df = E.queries()[name](spark, empty_sf_dir)
    rows = df.collect()
    # global aggregates may legitimately return one (all-null/zero) row;
    # everything else must be empty — and nothing may raise
    assert len(rows) <= 1
