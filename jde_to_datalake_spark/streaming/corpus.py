"""Streaming corpus ingestion — the training-data tier's stream side.

The batch dedup family (operators/dedup.py) has a streaming analog for
continuous corpus ingestion: exact near-real-time dedup on the content
fingerprint, and row-local MinHash/LSH band-key projection so incoming
documents can be bucket-matched against an existing signature index
without stopping the stream.

Both are pure projections plus engine-managed dedup state — the same
expressions as the batch operators (one code path), which is what
makes stream/batch parity testable.

Reference anchor: the DAG polling loops re-fetch a lookback window and
rely on a uniqueness ledger to suppress re-dispatch
(dag_bakery_system_to_jde.py:107-109, 38-59); this is that pattern
applied to the document corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jde_to_datalake_spark.functions.text import fingerprint
from jde_to_datalake_spark.operators.dedup import band_index


def dedup_document_stream(
    stream: DataFrame,
    text_col: str = "text",
    event_time_col: str | None = None,
    watermark: str = "1 day",
) -> DataFrame:
    """Exact streaming dedup: keep the first-arrived copy per content.

    The dedup key is the normalized-content SHA-256 (same expression
    as ``operators.dedup.exact_dedup`` — a re-ingested document dedups
    against the batch fingerprint convention, not a parallel one).

    With ``event_time_col``: ``dropDuplicatesWithinWatermark`` bounds
    state to the watermark horizon — the streaming form of the
    reference's bounded lookback; duplicates farther apart than the
    horizon are the batch pass's job (the standard lambda split).
    Without it: unbounded-state dropDuplicates (exact forever-dedup;
    only for bounded corpora).

    Scale: state is keyed by the 256-bit fingerprint — uniform, no
    skew; size = distinct contents within the horizon.
    """
    out = stream.withColumn("fingerprint", fingerprint(F.col(text_col)))
    if event_time_col is not None:
        out = out.withColumn(
            event_time_col, F.col(event_time_col).cast("timestamp")
        )
        return out.withWatermark(event_time_col, watermark).dropDuplicatesWithinWatermark(
            ["fingerprint"]
        )
    return out.dropDuplicates(["fingerprint"])


def minhash_band_stream(
    stream: DataFrame,
    num_hashes: int = 8,
    band_size: int = 2,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Row-local MinHash band keys over a document stream.

    Emits (id, band, band_hash) — literally the batch ``band_index``
    projection (operators/dedup.py) applied to a streaming frame, so a
    streamed document's keys equi-join an index built by the batch
    pass (see ``operators.dedup.incremental_lsh_candidates``) to
    surface near-dup candidates incrementally. Pure projection +
    explode: no state, no shuffle, works under any trigger.
    """
    return band_index(stream, num_hashes, band_size, n, text_col, id_col)
