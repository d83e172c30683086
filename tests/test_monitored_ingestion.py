"""Monitored end-to-end ingestion (streaming/monitored.py): the loop
drains a streamed source, and the operations report — per-batch funnel
trail, run totals, snapshot drift, domain composition — is consistent
with what actually landed in the corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from jde_to_datalake_spark.sources.versioned import VersionedTable
from jde_to_datalake_spark.streaming.monitored import run_monitored_ingestion


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, url string"
    )


def _tables(tmp_path, tag):
    return (
        VersionedTable(str(tmp_path / f"corpus{tag}")),
        VersionedTable(str(tmp_path / f"index{tag}")),
        VersionedTable(str(tmp_path / f"metrics{tag}")),
    )


def _stream(spark, schema, src_dir):
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )


def test_monitored_run_reports_funnel_drift_and_domains(spark, tmp_path):
    run1 = _docs(spark, [
        (1, "alpha beta gamma", "https://ok.site.com/a"),
        (2, "alpha beta gamma", "https://ok.site.com/b"),      # dup of 1
        (3, "delta " * 40, "https://big.example.com.br/x"),
    ])
    run2 = _docs(spark, [
        (4, "alpha beta gamma", "https://ok.site.com/c"),      # known
        (5, "epsilon zeta", "https://spam.bad.com/y"),
        (6, "eta theta iota " * 200, "https://big.example.com.br/z"),
    ])
    src1, src2 = str(tmp_path / "src1"), str(tmp_path / "src2")
    run1.coalesce(1).write.parquet(src1)
    run2.coalesce(1).write.parquet(src2)
    corpus, index, metrics = _tables(tmp_path, "")

    # first run: no baseline, so no drift report
    rep1 = run_monitored_ingestion(
        _stream(spark, run1.schema, src1), corpus, index, metrics,
        str(tmp_path / "ckpt1"), url_col="url",
        blocklist=["bad.com"],
    )
    assert rep1["base_version"] is None and rep1["drift"] is None
    f1 = rep1["funnel"].collect()[0]
    assert (f1["n_rows"], f1["n_known"], f1["n_novel"]) == (3, 0, 2)
    assert corpus.read(spark).count() == 2

    # second run over a fresh checkpoint/source, same tables
    rep2 = run_monitored_ingestion(
        _stream(spark, run2.schema, src2), corpus, index, metrics,
        str(tmp_path / "ckpt2"), url_col="url",
        blocklist=["bad.com"],
    )
    f2 = rep2["funnel"].collect()[0]
    # doc 4 is known; docs 5 and 6 are novel
    assert (f2["n_rows"], f2["n_known"], f2["n_novel"]) == (3, 1, 2)
    # the funnel is THIS run's totals, not the lifetime trail
    assert rep2["batches"].count() == 2  # one batch per run
    # drift: baseline snapshot vs post-run corpus, token-count buckets
    drift = {r["bucket"]: r for r in rep2["drift"].collect()}
    assert sum(r["n_base"] for r in drift.values()) == 2
    assert sum(r["n_cur"] for r in drift.values()) == 4
    # the 600-token doc lands in a bucket the baseline never touched
    moved = [r for r in drift.values() if r["n_cur"] > 0 and r["n_base"] == 0]
    assert moved
    # domains: post-run corpus composition with the blocklist applied
    domains = {r["domain"]: r for r in rep2["domains"].collect()}
    assert domains["example.com.br"]["n_docs"] == 2
    assert domains["bad.com"]["n_blocked"] == 1
    assert domains["site.com"]["n_kept"] == 1


def test_monitored_run_accepts_suffix_table_and_no_urls(spark, tmp_path):
    docs = _docs(spark, [(1, "plain text", None)]).select("doc_id", "text")
    src = str(tmp_path / "src")
    docs.coalesce(1).write.parquet(src)
    corpus, index, metrics = _tables(tmp_path, "n")
    rep = run_monitored_ingestion(
        _stream(spark, docs.schema, src), corpus, index, metrics,
        str(tmp_path / "ckptn"),
    )
    assert rep["domains"] is None and rep["drift"] is None
    assert rep["funnel"].collect()[0]["n_novel"] == 1


def test_drift_counts_empty_text_as_zero_tokens(spark, tmp_path):
    """Round-5 advice (low): split('') yields [''] so empty/whitespace
    text would count as 1 token and skew the lowest drift bucket; it
    must bucket as 0 tokens, same as the NULL-safe path."""
    run1 = _docs(spark, [(1, "alpha beta", "https://a.com/x")])
    run2 = _docs(spark, [
        (2, "", "https://a.com/y"),
        (3, "   ", "https://a.com/z"),
        (4, "one two three", "https://a.com/w"),
    ])
    src1, src2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    run1.coalesce(1).write.parquet(src1)
    run2.coalesce(1).write.parquet(src2)
    corpus, index, metrics = _tables(tmp_path, "e")
    run_monitored_ingestion(
        _stream(spark, run1.schema, src1), corpus, index, metrics,
        str(tmp_path / "cke1"),
    )
    rep = run_monitored_ingestion(
        _stream(spark, run2.schema, src2), corpus, index, metrics,
        str(tmp_path / "cke2"),
        drift_edges=[0.5, 10.0],  # bucket 0 = exactly-zero tokens
    )
    drift = {r["bucket"]: r for r in rep["drift"].collect()}
    # the empty and whitespace-only docs fingerprint to the same
    # content (one survives dedup) and land in the ZERO bucket of the
    # current side — under the old split('') bug they counted 1 token
    # and joined the baseline doc's bucket; bucket 1 holds the 2- and
    # 3-token docs
    assert drift[0]["n_cur"] == 1 and drift[0]["n_base"] == 0
    assert drift[1]["n_base"] == 1 and drift[1]["n_cur"] == 2


def test_identical_rerun_funnel_not_cancelled(spark, tmp_path):
    """Re-draining the same source under fresh checkpoints appends
    BYTE-IDENTICAL metrics rows (batch_id 0, all-known counts) — the
    old exceptAll run-total subtracted a run's rows against an earlier
    run's identical ones and reported a data-processing run as zero
    batches (round-11 review). The change-feed fold counts exactly
    this run's appends."""
    docs = _docs(spark, [(1, "rerun alpha", "https://ok.site.com/a")])
    src = str(tmp_path / "src")
    docs.coalesce(1).write.parquet(src)
    corpus, index, metrics = _tables(tmp_path, "")

    funnels = []
    for i in range(3):
        rep = run_monitored_ingestion(
            _stream(spark, docs.schema, src), corpus, index, metrics,
            str(tmp_path / f"ckpt{i}"),
        )
        funnels.append(rep["funnel"].collect()[0])
    # run 1 ingests; runs 2 and 3 are all-known — with IDENTICAL
    # metrics rows (batch_id 0, n_rows 1, n_known 1, n_novel 0)
    assert (funnels[0]["n_rows"], funnels[0]["n_novel"]) == (1, 1)
    for f in funnels[1:]:
        # pre-fix: exceptAll cancelled these rows -> n_batches == 0
        assert f["n_batches"] == 1
        assert (f["n_rows"], f["n_known"], f["n_novel"]) == (1, 1, 0)
    assert metrics.read(spark).count() == 3  # the full lifetime trail


def test_funnel_degrades_when_vacuum_trims_base_version(spark, tmp_path):
    """Round-11 advisor (medium): a vacuumed base_metrics_version used
    to CRASH report assembly after a successful drain — read_changes'
    FileNotFoundError escaped the ValueError-only catch, and the
    exceptAll fallback read the same vacuumed version. The funnel must
    degrade to (None, retention guidance) instead; the sign-fold path
    stays intact when history is retained."""
    from jde_to_datalake_spark.sources.versioned import VersionedTable
    from jde_to_datalake_spark.streaming.monitored import _run_funnel

    schema = (
        "batch_id bigint, n_rows bigint, n_known bigint, "
        "n_batch_first bigint, n_novel bigint, n_near_flagged bigint"
    )

    def mrow(b):
        return spark.createDataFrame([(b, 10, 2, 1, 7, 3)], schema)

    m = VersionedTable(str(tmp_path / "metrics"))
    m.commit(mrow(0))
    base = m.latest_version()
    m.commit(mrow(1))
    m.commit(mrow(2))
    trail = m.read(spark)
    # intact history: the change-feed sign-fold counts this run's rows
    funnel, note = _run_funnel(spark, m, trail, base)
    assert note is None
    row = funnel.collect()[0]
    assert row["n_batches"] == 2 and row["n_rows"] == 20
    # vacuum trims the base version's manifest mid-"drain"
    m.vacuum(keep_last=1, retention_seconds=0)
    funnel, note = _run_funnel(spark, m, trail, base)
    assert funnel is None
    assert "vacuum" in note and "report['batches']" in note
    # a no-baseline first run still aggregates the whole trail
    funnel, note = _run_funnel(spark, m, trail, None)
    assert note is None
    assert funnel.collect()[0]["n_batches"] == 3
