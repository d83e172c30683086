"""Property test: SCD2 batch sequences match a dict model.

``apply_scd2``'s per-batch rules (sources/scd.py module docstring) —
close-on-change, no-churn on unchanged attributes, stale-row skip,
CDC-delete closes without opening, closed keys reopen only strictly
past their last recorded event — interact across batches in ways the
scenario tests in test_scd.py pin one at a time. This drives random
batch sequences (stale/duplicate timestamps, redeliveries, deletes
for unknown/closed keys, reopen races) against an independent Python
model of those rules and requires the ENTIRE dimension (history rows
included) to match multiset-exactly. Integer timestamps make every
comparison exact."""

from __future__ import annotations

import pytest
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from jde_to_datalake_spark.sources.scd import apply_scd2
from jde_to_datalake_spark.sources.versioned import VersionedTable

HS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_BATCHES = st.lists(
    st.tuples(
        st.dictionaries(
            st.integers(0, 4),  # key
            st.tuples(
                st.integers(1, 9),  # ts
                st.sampled_from("ab"),  # tracked attribute
                st.booleans(),  # CDC delete flag
            ),
            min_size=1,
            max_size=3,
        ),
        # maintenance between batches: compact rewrites the dimension
        # (row-invariant), vacuum trims its history to the bone — the
        # next batch's close/reopen/skip logic must be unaffected
        st.sampled_from([None, "vacuum", "compact"]),
    ),
    min_size=1,
    max_size=4,
)


def _model_apply(rows: list, batch: dict) -> None:
    """rows: mutable list of [k, attr, valid_from, valid_to, is_cur]."""
    for k, (ts, attr, is_del) in batch.items():
        mine = [r for r in rows if r[0] == k]
        cur = next((r for r in mine if r[4]), None)
        if not mine:
            if not is_del:
                rows.append([k, attr, ts, None, True])
        elif cur is not None:
            if ts > cur[2] and (is_del or attr != cur[1]):
                cur[3], cur[4] = ts, False  # close at the event ts
                if not is_del:
                    rows.append([k, attr, ts, None, True])
            # else: stale, or unchanged attributes — no churn
        else:
            last_ev = max(
                (r[3] if r[3] is not None else r[2]) for r in mine
            )
            if not is_del and ts > last_ev:
                rows.append([k, attr, ts, None, True])


@pytest.mark.soak
@HS
@given(batches=_BATCHES)
def test_scd2_sequences_match_dict_model(spark, tmp_path_factory, batches):
    t = VersionedTable(str(tmp_path_factory.mktemp("scdp") / "dim"))
    rows: list = []  # the model dimension
    started = False
    for batch, maint in batches:
        df = spark.createDataFrame(
            [(k, ts, a, d) for k, (ts, a, d) in sorted(batch.items())],
            "k bigint, ts bigint, attr string, deleted boolean",
        )
        v = apply_scd2(
            spark, t, df, key="k", tracked=["attr"], ts_col="ts",
            delete_col="deleted",
        )
        if maint is not None and t.latest_version() is not None:
            if maint == "vacuum":
                t.vacuum(keep_last=1, retention_seconds=0)
            else:
                t.compact(spark)
        if not started:
            # first NON-EMPTY commit seeds the dimension from the
            # batch's non-delete rows only; an all-delete first batch
            # commits nothing (v is None)
            live = {
                k: (ts, a)
                for k, (ts, a, d) in batch.items()
                if not d
            }
            rows = [[k, a, ts, None, True] for k, (ts, a) in live.items()]
            started = v is not None
            assert started == bool(live)
            continue
        _model_apply(rows, batch)
    if not started:
        assert t.latest_version() is None
        return
    got = Counter(
        (r["k"], r["attr"], r["valid_from"], r["valid_to"],
         r["is_current"])
        for r in t.read(spark).collect()
    )
    want = Counter((k, a, vf, vt, c) for k, a, vf, vt, c in rows)
    assert got == want
    # structural invariants of any well-formed Type-2 dimension
    per_key: dict = {}
    for k, a, vf, vt, c in rows:
        per_key.setdefault(k, []).append((vf, vt, c))
    for k, rs in per_key.items():
        assert sum(1 for _vf, _vt, c in rs if c) <= 1  # one current max
        for vf, vt, c in rs:
            assert c == (vt is None)  # open row iff no end timestamp
            if vt is not None:
                assert vt > vf  # closes strictly after opens
