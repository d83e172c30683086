"""Scalar function library — SURVEY.md §2.9 (F1-F22).

Every function here returns a ``Column`` built from Spark built-ins, so
expressions stay inside whole-stage codegen (JVM, vectorized) — no
Python UDFs. The reference implements each of these as row-at-a-time
Python (citations inline); at 100 TB that is the difference between a
codegen'd projection and 10^11 Python interpreter round-trips.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# F1/F2: unit-of-measure maps (reference: backend/utility.py:21-48,93-106).
# Expressed as map literals -> `element_at` lookup; fallback lower()/upper().
# At scale these could equally be a broadcast dimension table; a map literal
# is constant-folded by Catalyst and never shuffles.
# ---------------------------------------------------------------------------

JDE_TO_LAKE_UNITS = {
    "KG": "kg",
    "EA": "each",
    "LT": "L",
    "GR": "g",
    "ML": "mL",
    "CS": "case",
    "BX": "box",
    "LB": "lb",
    "OZ": "oz",
}
LAKE_TO_JDE_UNITS = {v.upper(): k for k, v in JDE_TO_LAKE_UNITS.items()}

RATE_UNITS = {"KG": "g/L", "GR": "g/L", "LT": "mL/L", "ML": "mL/L", "EA": "each/L"}

# (src, tgt) -> multiplier (reference backend/utility.py:109-127)
UNIT_QTY_FACTORS = {
    ("KG", "G"): 1000.0,
    ("G", "KG"): 0.001,
    ("L", "ML"): 1000.0,
    ("ML", "L"): 0.001,
    ("KG", "L"): 1.0,
    ("L", "KG"): 1.0,
}


def _map_literal(d: dict) -> Column:
    pairs = []
    for k, v in d.items():
        pairs.append(F.lit(k))
        pairs.append(F.lit(v))
    return F.create_map(*pairs)


def convert_unit(unit: Column, direction: str = "to_lake") -> Column:
    """F1: dict-map UoM conversion with case-normalizing fallback.

    Reference: backend/utility.py:21-35 (to lake), :93-99 (to JDE).
    """
    if direction == "to_lake":
        return F.coalesce(
            F.element_at(_map_literal(JDE_TO_LAKE_UNITS), F.upper(unit)), F.lower(unit)
        )
    return F.coalesce(
        F.element_at(_map_literal(LAKE_TO_JDE_UNITS), F.upper(unit)), F.upper(unit)
    )


def convert_rate_unit(unit: Column) -> Column:
    """F2: rate-unit map (backend/utility.py:38-48)."""
    return F.coalesce(
        F.element_at(_map_literal(RATE_UNITS), F.upper(unit)), F.lower(unit)
    )


def validate_unit(unit: Column, strict: bool = False) -> Column:
    """F3: unit-membership validation (backend/utility.py:50-75).

    Returns a boolean validity column by default; with ``strict=True``
    the invalid rows raise at execution time (the reference raises a
    ValueError). The recommended scale pattern is the boolean form +
    a reject-table filter — a poison row must not kill a 100 TB job.
    """
    known = [k for k in JDE_TO_LAKE_UNITS] + [k for k in LAKE_TO_JDE_UNITS]
    valid = F.upper(unit).isin(sorted(set(known)))
    if not strict:
        return valid
    return F.when(valid, unit).otherwise(
        F.raise_error(F.concat(F.lit("invalid unit: "), unit))
    )


def convert_unit_quantity(src: Column, tgt: Column, qty: Column) -> Column:
    """F4: (src,tgt) multiplier lookup, default x1.0, null-safe qty.

    Reference: backend/utility.py:77-91,109-127. Key is the concatenated
    upper-cased pair; non-numeric qty -> NULL (pandas `coerce` parity).
    """
    factors = {f"{k[0]}|{k[1]}": v for k, v in UNIT_QTY_FACTORS.items()}
    factor = F.coalesce(
        F.element_at(
            _map_literal(factors), F.concat_ws("|", F.upper(src), F.upper(tgt))
        ),
        F.lit(1.0),
    )
    return qty.try_cast("double") * factor


def preserve_quantity_precision(qty: Column) -> Column:
    """F5: quantize to 9 dp ROUND_HALF_UP (backend/utility.py:776-807).

    Spark's ``round`` is HALF_UP — same convention as the reference's
    ``Decimal.quantize(ROUND_HALF_UP)``.
    """
    return F.round(qty.cast("decimal(38,9)"), 9)


def normalize_quantity_string(qty: Column) -> Column:
    """F6: 9-dp string with trailing zeros (and bare dot) stripped.

    Reference: backend/utility.py:749-773. '12.300000000' -> '12.3',
    '5.000000000' -> '5'.
    """
    # decimal->string keeps the full 9-dp scale and no grouping
    # separators, so one anchored regex strips zeros + the bare dot
    fixed = qty.cast("decimal(38,9)").cast("string")
    return F.regexp_replace(fixed, "\\.?0+$", "")


def unique_transaction_id(
    name: Column, lot: Column, vessel: Column, qty: Column
) -> Column:
    """F7: `{name}_{lot}_{vessel}_{normalized_qty}` idempotency key.

    Reference: backend/jde_helper.py:853-855, backend/bakery_helper.py:535.
    """
    return F.concat_ws("_", name, lot, vessel, normalize_quantity_string(qty))


def batch_name(name: Column, lot: Column) -> Column:
    """F8: `name` or `name_lot` (backend/jde_helper.py:636-638)."""
    return F.when(lot.isNull() | (lot == ""), name).otherwise(
        F.concat_ws("_", name, lot)
    )


def lot_from_batch_number(batch_number: Column, name: Column) -> Column:
    """F9: strip leading `{name}_` prefix from batchNumber.

    Reference: backend/jde_helper.py:888-897. Uses a literal (quoted)
    prefix match, not regex, to mirror ``str.replace(prefix, '', 1)``.
    """
    prefix = F.concat(name, F.lit("_"))
    return F.when(
        batch_number.startswith(prefix),
        batch_number.substr(F.length(name) + F.lit(2), F.lit(2147483647)),
    ).otherwise(batch_number)


def business_unit(name: Column) -> Column:
    """F10: prefix map B_->1110, P_->1130, M_->1120, default 1110.

    Reference: backend/jde_helper.py:876-886.
    """
    return (
        F.when(name.startswith("B_"), F.lit("1110"))
        .when(name.startswith("P_"), F.lit("1130"))
        .when(name.startswith("M_"), F.lit("1120"))
        .otherwise(F.lit("1110"))
    )


def status_ladder(
    product_found: Column, dispatched: Column, qty_on_hand: Column
) -> Column:
    """F11: cardex-vs-bakery status ladder (backend/main.py:499-511)."""
    return (
        F.when(~product_found, F.lit("Product Not Found"))
        .when(dispatched, F.lit("Dispatched"))
        .when(qty_on_hand > 0, F.lit("Partial Match"))
        .otherwise(F.lit("Missing in Bakery Ops"))
    )


def determine_status(a: Column, b: Column) -> Column:
    """F12: pivot-report status via canonical-string equality.

    Reference: backend/main.py:394-409 compares ``str(a) == str(b)``;
    we reproduce that through a canonical 2-dp decimal string so both
    Spark and the oracle agree on the textual form.
    """
    sa = a.cast("decimal(38,2)").cast("string")
    sb = b.cast("decimal(38,2)").cast("string")
    return (
        F.when(a.isNull() | b.isNull(), F.lit("Missing Data"))
        .when(sa == sb, F.lit("Match"))
        .otherwise(F.lit("Mismatch"))
    )


def match_status(a: Column, b: Column) -> Column:
    """F13: numeric match status, NaN -> Unknown (LiveDataComparison.js:208-214)."""
    return (
        F.when(F.isnan(a) | F.isnan(b), F.lit("Unknown"))
        .when(a == b, F.lit("Match"))
        .otherwise(F.lit("Mismatch"))
    )


def date_window_start(days_back: int) -> Column:
    """F14: `today - days_back` as dd/MM/yyyy (backend/main.py:430-432)."""
    return F.date_format(F.date_sub(F.current_date(), days_back), "dd/MM/yyyy")


def iso_timestamp(s: Column) -> Column:
    """F15: tolerant ISO-8601 parse, Z-stripped (backend/main.py:1829-1832)."""
    return F.try_to_timestamp(F.regexp_replace(s, "Z$", ""))


def truncate_status(s: Column, n: int = 699) -> Column:
    """F16: status text cap (backend/jde_helper.py:1000)."""
    return F.substring(s, 1, n)


def sha256_cache_key(*cols: Column) -> Column:
    """F17: SHA-256 request-cache key (backend/utility.py:428-494).

    The reference canonicalizes by sorting dict keys; callers must pass
    columns in a fixed documented order to get the same canonical form.
    """
    return F.sha2(F.concat_ws("||", *cols), 256)


def surrogate_id(c: Column, modulus: int = 1_000_000) -> Column:
    """F18: deterministic surrogate id hash (backend/main.py:1995-1997).

    xxhash64 instead of Python ``hash`` — deterministic across runs and
    executors (the reference's version is not; intentional improvement).
    """
    return F.pmod(F.abs(F.xxhash64(c)), F.lit(modulus))


def generated_uuid() -> Column:
    """F19: random v4 UUID per row (backend/session_helper.py:29).

    Nondeterministic by nature — proven by pytest properties (format,
    per-row uniqueness), not by the value-hash oracle gate.
    """
    return F.expr("uuid()")


def monotonic_row_id() -> Column:
    """F19: cluster-unique surrogate row id.

    ``monotonically_increasing_id`` encodes (partition id, row offset)
    — unique and increasing within each partition with no shuffle or
    global coordination, the only id shape that scales to 100 TB.
    Values depend on partitioning, so pytest proves uniqueness and
    per-partition monotonicity; oracle-checked ids use
    ``prefixed_sequence_id`` instead.
    """
    return F.monotonically_increasing_id()


def prefixed_sequence_id(prefix: str, seq: Column, suffix: Column | None = None) -> Column:
    """F19: deterministic prefixed id — f"prod_{n}_{ts}" (backend/main.py:1708,1748).

    Zero-padded so lexical order == numeric order (stable pagination /
    pruning on the id column).
    """
    body = F.lpad(seq.cast("string"), 9, "0")
    if suffix is not None:
        return F.concat(F.lit(prefix), body, F.lit("_"), suffix)
    return F.concat(F.lit(prefix), body)


def note_transaction_id(text: Column) -> Column:
    """F20: extract `JDE_Transaction_Id: X` from note text.

    Reference: backend/jde_helper.py:446-451.
    """
    return F.regexp_extract(text, "JDE_Transaction_Id:\\s*(\\S+)", 1)


def clamp_nonneg(c: Column) -> Column:
    """F21: max(0, x) clamp (backend/main.py:1775)."""
    return F.greatest(F.lit(0.0), c)


def nan_inf_to_null(c: Column) -> Column:
    """F22: NaN/±Inf -> NULL cleanup (backend/main.py:313-317)."""
    return F.when(
        F.isnan(c) | (c == float("inf")) | (c == float("-inf")), F.lit(None)
    ).otherwise(c)


def stable_row_hash(df) -> Column:
    """``xxhash64`` over EVERY column of ``df`` — the deterministic
    within-batch tie-break the ledger merge and the derived-table
    merge sink order duplicates by (stable across re-deliveries and
    partitionings, unlike ``dropDuplicates``' keep-whichever-arrives).

    Spark refuses hash expressions on map-typed input (maps have no
    canonical order; ``xxhash64`` on one is a plan-time
    DATATYPE_MISMATCH.HASH_MAP_TYPE error unless a legacy conf is
    set), so any column whose type CONTAINS a map — top-level, inside
    a struct, or under an array — is folded through ``to_json`` first.
    JSON serialization is deterministic for identical rows (the same
    physical map renders the same byte sequence on every re-delivery),
    which is exactly the property a tie-break needs; cross-row "equal
    maps built in different key order" may hash apart, costing only a
    different-but-still-deterministic pick."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    def contains_map(dt) -> bool:
        if isinstance(dt, MapType):
            return True
        if isinstance(dt, ArrayType):
            return contains_map(dt.elementType)
        if isinstance(dt, StructType):
            return any(contains_map(f.dataType) for f in dt.fields)
        return False

    cols = [
        F.to_json(F.col(f.name))
        if contains_map(f.dataType)
        else F.col(f.name)
        for f in df.schema.fields
    ]
    return F.xxhash64(*cols)
