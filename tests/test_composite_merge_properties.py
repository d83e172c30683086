"""Property test: composite-key MERGE matches a dict model.

The composite probe INTERSECTS per-column footer-stat tests and
NULL-component rows are pure inserts (versioned.py merge docstring) —
the interaction of tuple matching, per-column pruning, and the
NULL-insert rule is exactly where a wrong intersection would silently
drop or duplicate rows. Random sequences of composite merges (keys
straddling narrow per-file ranges, occasional NULL components) and
key-scoped deletes must leave the table equal to a plain Python
model; the table stays range-clustered on k1 between ops so per-file
stats remain NARROW and a wrong file-probe exclusion is observable
(a single wide file would mask it by always being touched).
"""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from jde_to_datalake_spark.sources.versioned import VersionedTable

HS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_SCHEMA = "k1 bigint, k2 string, v string"


@st.composite
def merge_ops(draw):
    ops = []
    n = draw(st.integers(1, 5))
    for _ in range(n):
        kind = draw(
            st.sampled_from(
                ["merge", "merge", "merge", "delete", "maintenance"]
            )
        )
        if kind == "maintenance":
            # row-invariant housekeeping interleaved with the DML:
            # compact rewrites the clustered files, vacuum trims the
            # log — the composite-key NULL semantics must be unmoved
            ops.append(("maintenance", draw(st.sampled_from(["vacuum", "compact"]))))
        elif kind == "merge":
            n_rows = draw(st.integers(1, 4))
            tuples = draw(
                st.lists(
                    st.tuples(
                        st.one_of(st.none(), st.integers(0, 9)),
                        st.one_of(st.none(), st.sampled_from("xy")),
                    ),
                    min_size=n_rows,
                    max_size=n_rows,
                    unique=True,
                )
            )
            ops.append(("merge", tuples))
        else:
            ops.append(("delete", draw(st.integers(0, 9))))
    return ops


@pytest.mark.soak
@HS
@given(ops=merge_ops())
def test_composite_merges_match_dict_model(spark, tmp_path_factory, ops):
    t = VersionedTable(str(tmp_path_factory.mktemp("cm") / "t"))
    # seed: full (k1 in 0..9) x (k2 in x,y) grid, range-clustered on k1
    seed = [(k1, k2, "seed") for k1 in range(10) for k2 in "xy"]
    t.commit(
        spark.createDataFrame(seed, _SCHEMA)
        .repartitionByRange(5, "k1")
        .sortWithinPartitions("k1", "k2"),
        mode="overwrite",
    )
    keyed: dict = {(k1, k2): "seed" for k1, k2, _ in seed}
    loose: Counter = Counter()  # NULL-component rows: pure inserts
    stamp = 0
    for op, payload in ops:
        stamp += 1
        if op == "maintenance":
            if payload == "vacuum":
                t.vacuum(keep_last=1, retention_seconds=0)
            else:
                t.compact(spark)
        elif op == "merge":
            rows = [(k1, k2, f"s{stamp}") for k1, k2 in payload]
            t.merge(spark, spark.createDataFrame(rows, _SCHEMA), key=["k1", "k2"])
            for k1, k2, v in rows:
                if k1 is None or k2 is None:
                    loose[(k1, k2, v)] += 1  # matches nothing: insert
                else:
                    keyed[(k1, k2)] = v
        else:
            t.delete_where(spark, F.col("k1") == payload)
            keyed = {kk: v for kk, v in keyed.items() if kk[0] != payload}
            loose = Counter(
                {r: c for r, c in loose.items() if r[0] != payload}
            )
    got = Counter(
        (r["k1"], r["k2"], r["v"]) for r in t.read(spark).collect()
    )
    want = Counter({(k1, k2, v): 1 for (k1, k2), v in keyed.items()})
    want.update(loose)
    assert got == want


def test_composite_duplicate_tuple_guard(spark, tmp_path):
    """Two source rows with the SAME full tuple raise (Delta's multiple-
    source-match error); differing in ONE component is fine."""
    t = VersionedTable(str(tmp_path / "t"))
    t.commit(
        spark.createDataFrame([(1, "x", "a")], _SCHEMA), mode="overwrite"
    )
    with pytest.raises(ValueError, match="duplicate"):
        t.merge(
            spark,
            spark.createDataFrame([(1, "x", "b"), (1, "x", "c")], _SCHEMA),
            key=["k1", "k2"],
        )
    t.merge(
        spark,
        spark.createDataFrame([(1, "x", "b"), (1, "y", "c")], _SCHEMA),
        key=["k1", "k2"],
    )
    got = sorted(
        (r["k1"], r["k2"], r["v"]) for r in t.read(spark).collect()
    )
    assert got == [(1, "x", "b"), (1, "y", "c")]
