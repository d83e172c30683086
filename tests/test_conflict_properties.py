"""Model-based property test of the commute classifier.

``VersionedTable._check_commutes`` (the ConflictChecker's core) is
pure log-level logic — it reads only delta records, never data. These
properties pin it against an INDEPENDENT model of the conflict rules
documented in ``publish()``'s docstring, over randomized synthetic
commit histories and read declarations (hypothesis): the classifier
must raise exactly when the model says an overlap exists — never
declare commute on a real overlap (soundness: a wrong pass silently
loses an update), and never conflict on provable disjointness
(completeness: a wrong raise re-serializes disjoint writers, the
round-7 throughput ceiling reconciliation exists to remove).

Pure Python (no Spark session, no data files): thousands of histories
per second, so the generator can explore corners the integration
matrix (test_conflicts.py) pins one-by-one — basename aliasing in the
protected set, missing footer stats, incomparable range types,
DV sidecars with absent ref records, same-app txn stamps, vacuumed
records mid-range.
"""

from __future__ import annotations

import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from jde_to_datalake_spark.sources.log_store import InMemoryLogStore
from jde_to_datalake_spark.sources.versioned import (
    ConcurrentCommitError,
    VersionedTable,
)

HS = settings(
    max_examples=120,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

FILES = ["f1.parquet", "f2.parquet", "d/f3.parquet", "d/f4.parquet"]

# stat/bound values mix ints and strings on purpose: comparing a
# string bound to int stats raises TypeError inside the classifier,
# which must degrade to "inconclusive" (conflict), never crash
_vals = st.one_of(st.integers(-5, 5), st.sampled_from(["a", "m", "z"]))


def _sorted_pair(draw):
    a, b = draw(_vals), draw(_vals)
    try:
        return (a, b) if a <= b else (b, a)
    except TypeError:
        return (a, a)


@st.composite
def commit_record(draw):
    rec: dict = {"version": -1, "mode": "append", "committed_at": "t"}
    adds = draw(st.lists(st.sampled_from(FILES), max_size=2, unique=True))
    if adds:
        rec["add"] = adds
        stats = {}
        for f in adds:
            if draw(st.booleans()):
                stats[f] = {"k": list(_sorted_pair(draw))}
        if stats:
            rec["add_stats"] = stats
    removes = draw(st.lists(st.sampled_from(FILES), max_size=2, unique=True))
    if removes:
        rec["remove"] = removes
    if draw(st.booleans()):
        rec["dv_add"] = ["dv1.bin"]
        if draw(st.booleans()):
            rec["dv_refs_upd"] = {
                "dv1.bin": draw(
                    st.lists(st.sampled_from(FILES), min_size=1, max_size=2)
                )
            }
    apps = draw(st.lists(st.sampled_from(["app1", "app2"]), max_size=1))
    if apps:
        rec["txn"] = {a: {"version": 1, "at": "t"} for a in apps}
    if draw(st.booleans()) and draw(st.booleans()):
        rec["set_constraints"] = {"c": "k IS NOT NULL"}
    return rec


@st.composite
def scenario(draw):
    recs = draw(st.lists(commit_record(), min_size=1, max_size=3))
    vacuumed = draw(st.booleans()) and len(recs) > 1
    blind = draw(st.booleans())
    prot_base = draw(
        st.lists(st.sampled_from(FILES), max_size=2, unique=True)
    )
    # publish() protects relpaths AND their basenames — mirror it
    protected = set(prot_base) | {os.path.basename(f) for f in prot_base}
    kind = draw(st.sampled_from(["none", "empty", "range"]))
    if kind == "none":
        ranges = None  # unbounded read predicate
    elif kind == "empty":
        ranges = {}  # depends only on read_files
    else:
        ranges = {"k": _sorted_pair(draw)}
    txn_apps = set(draw(st.lists(st.sampled_from(["app1"]), max_size=1)))
    return recs, vacuumed, blind, protected, ranges, txn_apps


def _model_add_conflicts(fstats, ranges) -> bool:
    """Independent restatement of the documented add rule."""
    if ranges is None:
        return True  # unbounded read predicate: any new row mattered
    if not ranges:
        return False  # result depends only on read_files
    if not fstats:
        return True  # no stats: maybe overlaps
    for col, (lo, hi) in ranges.items():
        s = fstats.get(col)
        if s is None:
            continue
        mn, mx = s
        try:
            if (hi is not None and mn > hi) or (lo is not None and mx < lo):
                return False  # provably outside the read envelope
        except TypeError:
            continue  # incomparable: inconclusive
    return True


def _model_verdict(recs, vacuumed, blind, protected, ranges, txn_apps):
    """True = the model expects ConcurrentCommitError."""
    if vacuumed:
        return True  # record trimmed mid-check: retryable conflict
    for rec in recs:
        if "set_constraints" in rec:
            return True
        if txn_apps & set(rec.get("txn", {})):
            return True
        if blind:
            continue
        removed = set(rec.get("remove", []))
        removed |= {os.path.basename(f) for f in removed}
        if protected & removed:
            return True
        for d in rec.get("dv_add", []):
            refs = rec.get("dv_refs_upd", {}).get(d)
            if refs is None or any(r in protected for r in refs):
                return True
        for f in rec.get("add", []):
            if _model_add_conflicts(
                rec.get("add_stats", {}).get(f), ranges
            ):
                return True
    return False


@HS
@given(scenario())
def test_commute_classification_matches_model(tmp_path_factory, sc):
    recs, vacuumed, blind, protected, ranges, txn_apps = sc
    root = str(tmp_path_factory.mktemp("log"))
    store = InMemoryLogStore(root)
    try:
        t = VersionedTable(root, log_store=store)
        hi = len(recs)
        for i, rec in enumerate(recs, start=1):
            if vacuumed and i == 1:
                continue  # hole in the log = concurrently vacuumed
            store.put_if_absent(i, {**rec, "version": i})
        expect_conflict = _model_verdict(
            recs, vacuumed, blind, protected, ranges, txn_apps
        )
        try:
            t._check_commutes(
                0,
                hi,
                blind_append=blind,
                protected=protected,
                read_ranges=ranges,
                txn_apps=txn_apps,
            )
            got_conflict = False
        except ConcurrentCommitError:
            got_conflict = True
        assert got_conflict == expect_conflict, (
            f"classifier={'conflict' if got_conflict else 'commute'} "
            f"model={'conflict' if expect_conflict else 'commute'} "
            f"recs={recs} blind={blind} protected={protected} "
            f"ranges={ranges} txn={txn_apps} vacuumed={vacuumed}"
        )
    finally:
        InMemoryLogStore.reset(root)


def test_model_sanity_disjoint_add_commutes(tmp_path):
    """Non-property anchor: a key-disjoint add under a declared range
    commutes; the same add with overlapping stats conflicts."""
    root = str(tmp_path / "t")
    store = InMemoryLogStore(root)
    try:
        t = VersionedTable(root, log_store=store)
        store.put_if_absent(
            1,
            {
                "version": 1,
                "mode": "append",
                "committed_at": "t",
                "add": ["f1.parquet"],
                "add_stats": {"f1.parquet": {"k": [100, 200]}},
            },
        )
        t._check_commutes(
            0, 1, blind_append=False, protected=set(),
            read_ranges={"k": (0, 50)}, txn_apps=set(),
        )  # disjoint: must NOT raise
        with pytest.raises(ConcurrentCommitError):
            t._check_commutes(
                0, 1, blind_append=False, protected=set(),
                read_ranges={"k": (150, 250)}, txn_apps=set(),
            )
    finally:
        InMemoryLogStore.reset(root)
