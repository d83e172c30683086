"""Stateful operators — A10's order-dependent running inventory.

The reference mutates ``onHand.amount`` per movement with a clamp at
zero at EVERY step (backend/main.py:1770-1789). That clamp makes the
computation non-associative: a batch signed-sum (relational.py) is
only equivalent when no intermediate balance goes negative (SURVEY §7
watch list). The faithful semantics needs ordered, per-key stateful
processing:

- ``running_inventory_ordered``  batch form via applyInPandas — one
  shuffle on the product key, each group processed in (ts, id) order
  inside an Arrow batch. This is the documented escape hatch where
  built-in operators can't express the semantics.
- ``running_inventory_stream``   streaming form via
  applyInPandasWithState, state = current balance per product,
  identical arithmetic -> batch and stream agree.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

RESULT_SCHEMA = StructType(
    [
        StructField("product_id", LongType()),
        StructField("on_hand", DoubleType()),
        StructField("n_movements", LongType()),
    ]
)


def _fold_clamped(qty_signed: pd.Series) -> float:
    bal = 0.0
    for q in qty_signed:
        bal = max(0.0, bal + q)
    return bal


def running_inventory_ordered(
    movements: DataFrame,
    product_col: str = "product_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    qty_col: str = "value",
    usage_types: tuple[str, ...] = ("click", "view"),
    type_col: str = "event_type",
) -> DataFrame:
    """Order-dependent clamp-at-zero fold per product (batch).

    Deterministic: rows are sorted by (ts, id) inside each group
    before folding, so the result is independent of partitioning.
    """
    signed = movements.withColumn(
        "__signed",
        F.when(F.col(type_col).isin(*usage_types), -F.col(qty_col)).otherwise(
            F.col(qty_col)
        ),
    ).select(
        F.col(product_col).alias("product_id"),
        F.col(ts_col).alias("__ts"),
        F.col(id_col).alias("__id"),
        "__signed",
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["__ts", "__id"], kind="mergesort")
        return pd.DataFrame(
            {
                "product_id": [pdf["product_id"].iloc[0]],
                "on_hand": [_fold_clamped(pdf["__signed"])],
                "n_movements": [len(pdf)],
            }
        )

    return signed.groupBy("product_id").applyInPandas(fold, RESULT_SCHEMA)


def running_inventory_stream(
    movements: DataFrame,
    product_col: str = "product_id",
    qty_col: str = "__signed",
    ts_col: str = "__ts",
    id_col: str = "__id",
    timeout: str = GroupStateTimeout.NoTimeout,
) -> DataFrame:
    """Streaming form: per-product balance kept in GroupState.

    Caveat (documented, SURVEY §7): cross-batch ordering is arrival
    order; within a batch rows are folded in (ts, id) order. State is
    one (float, long) pair per product — O(#products), not O(#events).

    Unlike the batch twin (``running_inventory_ordered``), the stream
    does NOT derive the signed quantity or the ordering columns — the
    caller's upstream projection supplies them (the defaults match
    the batch twin's internal names; pass real column names for raw
    streams). Missing columns are rejected HERE with the mapping
    spelled out: letting them through would surface as an opaque
    KeyError inside the executor's Python worker at runtime."""
    missing = [
        c
        for c in (product_col, qty_col, ts_col, id_col)
        if c not in movements.columns
    ]
    if missing:
        raise ValueError(
            f"running_inventory_stream: column(s) {missing} absent from "
            f"the input ({movements.columns}). Project the signed "
            f"quantity and ordering columns first, e.g. "
            f".withColumn('{qty_col}', when(type.isin(usage), -qty)"
            f".otherwise(qty)) with ts/id columns named via "
            f"ts_col=/id_col= — the batch twin running_inventory_ordered "
            f"derives these internally; the stream takes them as input."
        )
    state_schema = StructType(
        [StructField("on_hand", DoubleType()), StructField("n", LongType())]
    )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            bal, n = state.get
        else:
            bal, n = 0.0, 0
        for pdf in pdfs:
            pdf = pdf.sort_values([ts_col, id_col], kind="mergesort")
            for q in pdf[qty_col]:
                bal = max(0.0, bal + q)
            n += len(pdf)
        state.update((bal, n))
        yield pd.DataFrame(
            {"product_id": [key[0]], "on_hand": [bal], "n_movements": [n]}
        )

    return movements.groupBy(product_col).applyInPandasWithState(
        update, RESULT_SCHEMA, state_schema, "update", timeout
    )


class RunningInventoryProcessor:
    """transformWithStateInPandas form (Spark 4 StatefulProcessor API).

    Same clamp-at-zero fold as the GroupState form, but on the
    current-generation state API: typed ValueState, per-key TTL hooks,
    and state-store-backed recovery. Keyed by product; state is one
    (balance, count) row per key — O(#products).

    Requires protobuf (the TWS state-server wire protocol) at runtime
    — absent in this container, so the tested path here is
    ``running_inventory_stream`` (applyInPandasWithState); this form
    is the drop-in upgrade on a standard cluster image.
    """

    def __init__(self):
        # imported lazily so batch-only deployments don't need the API
        from pyspark.sql.streaming.stateful_processor import StatefulProcessor

        class _Proc(StatefulProcessor):
            def init(self, handle):
                state_schema = StructType(
                    [
                        StructField("on_hand", DoubleType()),
                        StructField("n", LongType()),
                    ]
                )
                self._state = handle.getValueState("inv", state_schema)

            def handleInputRows(self, key, rows, timerValues):
                if self._state.exists():
                    bal, n = self._state.get()
                else:
                    bal, n = 0.0, 0
                for pdf in rows:
                    pdf = pdf.sort_values(["__ts", "__id"], kind="mergesort")
                    for q in pdf["__signed"]:
                        bal = max(0.0, bal + q)
                    n += len(pdf)
                self._state.update((bal, n))
                yield pd.DataFrame(
                    {"product_id": [key[0]], "on_hand": [bal], "n_movements": [n]}
                )

            def close(self):
                pass

        self.processor = _Proc()


def running_inventory_tws(movements: DataFrame) -> DataFrame:
    """A10 on transformWithStateInPandas (expects __signed/__ts/__id,
    validated loudly like ``running_inventory_stream``)."""
    missing = [
        c
        for c in ("product_id", "__signed", "__ts", "__id")
        if c not in movements.columns
    ]
    if missing:
        raise ValueError(
            f"running_inventory_tws: column(s) {missing} absent from the "
            f"input ({movements.columns}); project product_id/__signed/"
            "__ts/__id first (see running_inventory_stream)."
        )
    return movements.groupBy("product_id").transformWithStateInPandas(
        statefulProcessor=RunningInventoryProcessor().processor,
        outputStructType=RESULT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
