"""Property-based tests (hypothesis) for the scalar library (F1-F22).

Each property checks the Spark Column implementation against an
independent pure-Python reference (``decimal.Decimal`` for the
precision pipeline — the same library the reference system uses), over
generated inputs far beyond the fixture corpus.
"""

from __future__ import annotations

import decimal

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from jde_to_datalake_spark.functions import scalars as S

HS = settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _one(spark, col, **kwargs):
    df = spark.createDataFrame([kwargs]) if kwargs else spark.range(1)
    return df.select(col.alias("v")).collect()[0]["v"]


def _py_norm_qty(q: float) -> str:
    """Reference implementation: 9-dp HALF_UP, strip trailing zeros
    (backend/utility.py:749-773)."""
    d = decimal.Decimal(str(q)).quantize(
        decimal.Decimal("0.000000001"), rounding=decimal.ROUND_HALF_UP
    )
    s = format(d, "f")
    if "." in s:
        s = s.rstrip("0").rstrip(".")
    return s


@HS
@given(q=st.decimals(min_value=0, max_value=10**6, places=6).map(float))
def test_normalize_quantity_matches_decimal_reference(spark, q):
    got = _one(spark, S.normalize_quantity_string(F.col("q")), q=q)
    assert got == _py_norm_qty(q), (q, got)


@HS
@given(
    name=st.text(
        alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
        min_size=1, max_size=12,
    ),
    lot=st.one_of(st.none(), st.integers(0, 999).map(str)),
)
def test_batch_name_lot_roundtrip(spark, name, lot):
    """F8 then F9: lot extracted from the built batch name is the lot."""
    df = spark.createDataFrame([(name, lot)], "name string, lot string")
    bn = df.select(S.batch_name(F.col("name"), F.col("lot")).alias("v")).collect()[0]["v"]
    assert bn == (name if lot in (None, "") else f"{name}_{lot}")
    extracted = df.select(
        S.lot_from_batch_number(F.lit(bn), F.col("name")).alias("v")
    ).collect()[0]["v"]
    if lot not in (None, ""):
        assert extracted == lot
    else:
        assert extracted == name  # no prefix match -> unchanged (reference parity)


@HS
@given(u=st.sampled_from(["KG", "EA", "LT", "GR", "ML", "kg", "unknown", "L"]))
def test_unit_roundtrip_known_units(spark, u):
    """F1: JDE->lake->JDE is identity for units in the map."""
    jde_units = {"KG", "EA", "LT", "GR", "ML"}
    lake = _one(spark, S.convert_unit(F.col("u"), "to_lake"), u=u)
    back = _one(spark, S.convert_unit(F.lit(lake), "to_jde"), u=u)
    if u.upper() in jde_units:
        assert back == u.upper()


@HS
@given(
    prefix=st.sampled_from(["B_", "P_", "M_", "X_", ""]),
    rest=st.integers(0, 10**6).map(str),
)
def test_business_unit_total_function(spark, prefix, rest):
    """F10: every input maps to one of the three BUs, default 1110."""
    expected = {"B_": "1110", "P_": "1130", "M_": "1120"}.get(prefix, "1110")
    got = _one(spark, S.business_unit(F.col("n")), n=prefix + rest)
    assert got == expected


@HS
@given(
    qty=st.decimals(min_value=0, max_value=10**4, places=4).map(float),
    src=st.sampled_from(["KG", "G", "L", "ML", "EA"]),
    tgt=st.sampled_from(["KG", "G", "L", "ML", "EA"]),
)
def test_unit_quantity_conversion_reference(spark, qty, src, tgt):
    """F4: multiplier table lookup with x1.0 default."""
    factors = {
        ("KG", "G"): 1000.0, ("G", "KG"): 0.001,
        ("L", "ML"): 1000.0, ("ML", "L"): 0.001,
        ("KG", "L"): 1.0, ("L", "KG"): 1.0,
    }
    expected = qty * factors.get((src, tgt), 1.0)
    got = _one(
        spark,
        S.convert_unit_quantity(F.col("src"), F.col("tgt"), F.col("qty")),
        src=src, tgt=tgt, qty=qty,
    )
    assert got == pytest.approx(expected, rel=1e-12)


@HS
@given(
    texts=st.lists(
        st.text(alphabet="ab cd", min_size=0, max_size=40), min_size=1, max_size=6
    )
)
def test_minhash_signature_invariants(spark, texts):
    """Signatures: one row per (doc-with->=3-tokens, hash_idx); values
    in [0, p); identical texts get identical signatures."""
    from jde_to_datalake_spark.operators.dedup import (
        MINHASH_P,
        minhash_signatures,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)] + [(100, texts[0])],
        "doc_id long, text string",
    )
    sig = minhash_signatures(docs, num_hashes=4).collect()
    by_doc: dict[int, dict[int, int]] = {}
    for r in sig:
        by_doc.setdefault(r["doc_id"], {})[r["hash_idx"]] = r["minhash"]
        assert 0 <= r["minhash"] < MINHASH_P
    eligible = [i for i, t in enumerate(texts) if len(t.split()) >= 3]
    assert set(by_doc) == set(eligible) | ({100} if 0 in eligible else set())
    if 0 in eligible:
        assert by_doc[0] == by_doc[100]  # same text -> same signature


@HS
@given(
    texts=st.lists(
        st.text(alphabet="xy z", min_size=5, max_size=30), min_size=2, max_size=5
    )
)
def test_jaccard_pairs_bounds_and_symmetry(spark, texts):
    """ngram Jaccard: 0 < j <= 1, id_a < id_b, dup texts give j == 1."""
    from jde_to_datalake_spark.operators.dedup import ngram_jaccard_pairs

    rows = [(i, t) for i, t in enumerate(texts)] + [(50, texts[0])]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = ngram_jaccard_pairs(docs, n=2, threshold=0.0, max_df=1000).collect()
    for r in pairs:
        assert r["id_a"] < r["id_b"]
        assert 0.0 < r["jaccard"] <= 1.0
    if len(texts[0].split()) >= 2:
        dup = [r for r in pairs if r["id_a"] == 0 and r["id_b"] == 50]
        assert len(dup) == 1 and dup[0]["jaccard"] == 1.0


def test_lsh_pairs_survive_single_member_buckets_and_short_docs(spark):
    """Regression: size-1 buckets / <n-token docs must not crash the
    LSH pipeline under ANSI (explode-inferred predicates evaluate the
    pair/gram expressions eagerly)."""
    from jde_to_datalake_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta"),
            (1, "alpha beta gamma delta"),   # exact dup of 0
            (2, "completely different text here"),  # likely alone in buckets
            (3, "xy"),                        # < 3 tokens
            (4, " "),                         # whitespace only
        ],
        "doc_id long, text string",
    )
    pairs = minhash_lsh_pairs(docs, num_hashes=8, band_size=2, threshold=0.2)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs.collect()}
    assert got.get((0, 1)) == 1.0  # identical docs always pair at j=1


# ---------------------------------------------------------------------------
# F19: generated ids (uuid / monotonic / prefixed-sequential)
# ---------------------------------------------------------------------------

def test_generated_uuid_format_and_uniqueness(spark):
    import re

    rows = (
        spark.range(500)
        .repartition(4)
        .select(S.generated_uuid().alias("u"))
        .collect()
    )
    vals = [r["u"] for r in rows]
    pat = re.compile(
        r"^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$"
    )
    assert all(pat.match(v) for v in vals), vals[:3]
    assert len(set(vals)) == len(vals)  # unique per row


def test_monotonic_row_id_unique_and_partition_monotonic(spark):
    df = (
        spark.range(1000)
        .repartition(8)
        .select(
            F.spark_partition_id().alias("pid"),
            S.monotonic_row_id().alias("rid"),
        )
    )
    rows = df.collect()
    rids = [r["rid"] for r in rows]
    assert len(set(rids)) == len(rids)  # cluster-unique
    by_pid: dict[int, list[int]] = {}
    for r in rows:
        by_pid.setdefault(r["pid"], []).append(r["rid"])
    for pid, ids in by_pid.items():
        assert ids == sorted(ids), f"partition {pid} not monotonic"


def test_prefixed_sequence_id_shape(spark):
    rows = (
        spark.range(3)
        .select(
            S.prefixed_sequence_id("prod_", F.col("id")).alias("a"),
            S.prefixed_sequence_id("txn_", F.col("id"), F.lit("20260813")).alias("b"),
        )
        .collect()
    )
    assert [r["a"] for r in rows] == [
        "prod_000000000", "prod_000000001", "prod_000000002",
    ]
    assert rows[1]["b"] == "txn_000000001_20260813"


# ---------------------------------------------------------------------------
# dedup finisher: connected components via min-label propagation
# ---------------------------------------------------------------------------

def _py_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find reference: node -> min id of its component."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@HS
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=25,
    )
)
@pytest.mark.soak
def test_duplicate_clusters_matches_union_find(spark, edges):
    from jde_to_datalake_spark.operators.dedup import duplicate_clusters

    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], "id_a long, id_b long"
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in duplicate_clusters(pairs).collect()
    }
    assert got == _py_components(edges)


def test_duplicate_clusters_empty_and_chain(spark):
    from jde_to_datalake_spark.operators.dedup import duplicate_clusters

    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert duplicate_clusters(empty).count() == 0

    # a 6-node chain needs label propagation across multiple hops —
    # the transitive case a pairwise view can't express
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "id_a long, id_b long"
    )
    got = duplicate_clusters(chain).collect()
    assert {r["cluster_id"] for r in got} == {0}
    assert len(got) == 7
