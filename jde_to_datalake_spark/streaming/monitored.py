"""Monitored continuous ingestion: the ingestion loop plus the
operations reports a data team actually alerts on, in one composition.

    document stream
      -> streaming/ingest.ingest_corpus_stream
           (exact+near-dup dedup vs the persisted index, bloom
            prefilter, per-batch funnel metrics appended)
      -> post-drain operations report:
           - per-batch funnel trail + run totals (the metrics table)
           - distribution drift of a document statistic between the
             pre-run corpus snapshot and the post-run corpus
             (operators/quality.histogram_drift, fixed edges)
           - per-domain corpus composition when documents carry URLs
             (functions/urls.url_report + domain_stats, optionally
             against a loadable public-suffix table)

Reference anchor: the DAG loops pair every dispatch poll with ledger
accounting the operators can be alerted on
(dag_bakery_system_to_jde.py:38-59,383-423); this is that operational
pairing for corpus ingestion at lake scale.

Scale posture: the loop itself is the audited streaming/ingest.py path
(index joined once per batch, corpus MERGE partial-rewrite); every
report is metadata-scale output — the metrics table is one row per
batch, the drift report is |buckets| rows from two single-scan
conditional aggregations, domain_stats collapses to |domains| rows via
one map-side-combined groupBy. Nothing here adds a corpus-sized
shuffle or a driver-side collect of data-scale rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jde_to_datalake_spark.functions.urls import domain_stats, url_report
from jde_to_datalake_spark.operators.quality import histogram_drift
from jde_to_datalake_spark.sources.versioned import VersionedTable
from jde_to_datalake_spark.streaming.ingest import ingest_corpus_stream


_FUNNEL_COLS = (
    "n_rows", "n_known", "n_batch_first", "n_novel", "n_near_flagged"
)


def _trail_totals(trail: DataFrame) -> DataFrame:
    return trail.agg(
        F.count(F.lit(1)).alias("n_batches"),
        *[F.sum(c).alias(c) for c in _FUNNEL_COLS],
    )


def _run_funnel(
    spark: SparkSession,
    metrics: VersionedTable,
    batch_trail: DataFrame,
    base_metrics_version: "int | None",
) -> "tuple[DataFrame | None, str | None]":
    """Run totals over only THIS run's batch rows, derived from the
    metrics table's own CHANGE FEED since the pre-drain version
    (batch_id alone can't distinguish runs when a fresh checkpoint
    resets it to 0). Sign-folding (+insert / -delete) instead of
    exceptAll: exceptAll cancels a run's rows against BYTE-IDENTICAL
    rows appended by an earlier run (re-draining the same source
    under a fresh checkpoint produced funnel totals of zero for a run
    that processed data), while in the feed this run's appends are
    inserts and any compaction's re-emitted pre-run rows arrive as
    delete+insert pairs that cancel under the fold.

    Degradation ladder when vacuum has trimmed history mid-drain (a
    long drain with ``compact_every`` set — ``maintain_index_tables``
    trims metrics manifests past ``vacuum_keep_last`` unconditionally,
    so a run draining more than ~``keep_last * compact_every`` batches
    outlives its own base version): the feed fold raises ValueError
    (span trimmed — its retention guidance) or FileNotFoundError (a
    manifest read under it hit a vacuumed record); then the exceptAll
    multiset difference against the base SNAPSHOT is tried; if that
    snapshot is itself unreadable (same vacuum), the funnel degrades
    to ``(None, retention guidance)`` — the per-batch trail in
    ``report['batches']`` remains complete either way, so a crashed
    report assembly after a successful drain is never the outcome.
    Returns ``(funnel_frame_or_None, note_or_None)``."""
    if base_metrics_version is None:
        return _trail_totals(batch_trail), None
    sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
        F.lit(-1)
    )
    try:
        # v_from is the BASE snapshot (changes are everything after
        # it, exclusive of the snapshot itself)
        ch = metrics.read_changes(spark, v_from=base_metrics_version)
        return (
            ch.agg(
                F.sum(sign).cast("bigint").alias("n_batches"),
                *[
                    F.sum(F.col(c) * sign).cast("bigint").alias(c)
                    for c in _FUNNEL_COLS
                ],
            ),
            None,
        )
    except (ValueError, FileNotFoundError):
        pass
    try:
        base_snap = metrics.read(spark, base_metrics_version)
    except (ValueError, FileNotFoundError):
        return None, (
            "funnel unavailable: vacuum trimmed the metrics history "
            f"past this run's base version {base_metrics_version} "
            "mid-drain; raise vacuum_keep_last (or compact_every) so "
            "at least ceil(run_batches / compact_every) versions are "
            "retained — the full per-batch trail is still in "
            "report['batches']"
        )
    return _trail_totals(batch_trail.exceptAll(base_snap)), None


def run_monitored_ingestion(
    stream: DataFrame,
    corpus: VersionedTable,
    index: VersionedTable,
    metrics: VersionedTable,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    bands: VersionedTable | None = None,
    bloom_filter: VersionedTable | None = None,
    drift_edges: "list[float] | None" = None,
    url_col: str | None = None,
    blocklist: "list[str] | DataFrame | None" = None,
    suffixes: DataFrame | None = None,
    compact_every: "int | None" = None,
    small_file_bytes: "int | None" = None,
) -> dict:
    """Drain ``stream`` through the ingestion loop (availableNow), then
    assemble the operations report. Returns lazy frames (callers sink
    them to their dashboard tables) plus run bookkeeping:

    - ``batches``     the per-micro-batch funnel trail (one row per
      delivery attempt — recovery re-deliveries stay visible);
    - ``funnel``      run totals over the NEW batch rows: documents
      seen / known / intra-batch dups / ingested / near-dup flagged;
    - ``drift``       histogram_drift of the per-document token count
      between the pre-run corpus snapshot and the post-run corpus
      (None on a first run — no baseline to drift from). Fixed
      ``drift_edges`` (default token-count decades) keep the report
      exactly reproducible;
    - ``domains``     per-domain document/kept/blocked counts over the
      post-run corpus when ``url_col`` is given (None otherwise);
    - ``base_version`` / ``version``  the corpus snapshot pair the
      drift report compares.
    """
    spark = stream.sparkSession
    base_version = corpus.latest_version()
    base_metrics_version = metrics.latest_version()
    q = ingest_corpus_stream(
        stream, corpus, index, checkpoint_dir,
        text_col=text_col, id_col=id_col,
        bands=bands, metrics=metrics, bloom_filter=bloom_filter,
        compact_every=compact_every, small_file_bytes=small_file_bytes,
    )
    q.awaitTermination()

    report: dict = {
        "base_version": base_version,
        "version": corpus.latest_version(),
    }
    batch_trail = (
        metrics.read(spark) if metrics.latest_version() is not None
        else None
    )
    report["batches"] = batch_trail
    if batch_trail is not None:
        funnel, note = _run_funnel(
            spark, metrics, batch_trail, base_metrics_version
        )
        report["funnel"] = funnel
        if note is not None:
            report["funnel_note"] = note
    else:
        report["funnel"] = None

    def _with_tokens(df: DataFrame) -> DataFrame:
        # empty/whitespace-only text is 0 tokens, same as NULL:
        # split('') yields [''] (size 1), which would otherwise count
        # empty docs as 1-token docs and skew the lowest drift bucket
        # (round-5 advice)
        return df.withColumn(
            "__n_tokens",
            F.when(
                F.col(text_col).isNull()
                | (F.length(F.trim(text_col)) == 0),
                F.lit(0),
            ).otherwise(F.size(F.split(F.trim(text_col), "\\s+"))).cast(
                "double"
            ),
        )

    if (
        base_version is not None
        and corpus.latest_version() is not None
        and corpus.latest_version() != base_version
    ):
        report["drift"] = histogram_drift(
            _with_tokens(corpus.read(spark, base_version)),
            _with_tokens(corpus.read(spark)),
            "__n_tokens",
            edges=drift_edges or [10.0, 30.0, 100.0, 300.0, 1000.0],
        )
    else:
        report["drift"] = None

    if url_col is not None and corpus.latest_version() is not None:
        report["domains"] = domain_stats(
            url_report(
                corpus.read(spark),
                url_col=url_col,
                blocklist=blocklist,
                id_col=id_col,
                suffixes=suffixes,
            )
        )
    else:
        report["domains"] = None
    return report
