"""Corpus-preparation operators for large-scale training-data pipelines.

Beyond-reference tier (BASELINE.json north star): token-window
chunking, Gopher/C4-style repetition metrics, PII detection/redaction
counts, benchmark decontamination, and a composite keep/drop filter.

Everything row-local stays row-local (array higher-order functions, no
explode+groupBy where an in-row fold suffices), so per-document
metrics are a single zero-shuffle projection over the 100 TB
`documents` scan. The one deliberate shuffle-free exception is
decontamination, which joins each document's shingles against a
BROADCAST distinct-shingle set built from the (small) held-out
benchmark — no shuffle of the corpus side.

Regex patterns are restricted to syntax with identical semantics in
Java regex (Spark) and RE2 (DuckDB): no lookarounds, no backrefs.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import DataFrame, Window, functions as F

from jde_to_datalake_spark.functions.text import tokens
from jde_to_datalake_spark.operators.dedup import shingles
from jde_to_datalake_spark.session import spread

# PII patterns — dialect-portable (Java regex + RE2)
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
# no '.' in the phone class — dotted digit runs must stay IP-only, so
# "10.0.255.1" never double-counts as a phone (dot-separated phone
# styles are traded away for that disjointness)
PHONE_RE = "\\+?[0-9][0-9() -]{6,}[0-9]"
IP_RE = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

# Gopher-style keep thresholds (tuned to the synthetic corpus so both
# outcomes occur; the rule SHAPE is the operator, constants are config)
KEEP_MIN_TOKENS = 10
KEEP_MAX_TOKENS = 10_000
KEEP_MIN_AVG_TOKEN_LEN = 2.0
KEEP_MAX_AVG_TOKEN_LEN = 12.0
KEEP_MAX_TOP_TOKEN_FRAC = 0.20
CONTAM_MIN_HITS = 1  # distinct shared eval shingles that flag a doc


def chunk_plan(
    docs: DataFrame,
    chunk_size: int = 20,
    overlap: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-window chunking with overlap: one row per (doc, chunk).

    Chunk k covers 1-indexed token span [1 + k*stride,
    min(1 + k*stride + chunk_size - 1, n)], stride = chunk_size -
    overlap; every token is covered and consecutive chunks share
    `overlap` tokens (except a shorter tail). Pure built-ins
    (sequence/posexplode/slice/array_join) — zero shuffles, scales as
    a flat map over the documents scan.
    """
    if overlap >= chunk_size:
        raise ValueError("overlap must be < chunk_size")
    stride = chunk_size - overlap
    toked = spread(docs, keys=(id_col,)).select(
        F.col(id_col), tokens(F.col(text_col)).alias("__toks")
    )
    n = F.size(F.col("__toks"))
    starts = F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(stride))
    exploded = toked.select(
        F.col(id_col), F.col("__toks"), F.posexplode(starts).alias("pos", "start")
    )
    n2 = F.size(F.col("__toks"))
    end = F.least(F.col("start") + F.lit(chunk_size - 1), n2)
    return exploded.select(
        F.col(id_col),
        F.col("pos").cast("bigint").alias("chunk_idx"),
        F.col("start").cast("bigint").alias("start_tok"),
        end.cast("bigint").alias("end_tok"),
        (end - F.col("start") + F.lit(1)).cast("bigint").alias("n_toks"),
        F.array_join(
            F.slice(F.col("__toks"), F.col("start"), F.lit(chunk_size)), " "
        ).alias("chunk_text"),
    )


def sequence_pack(
    docs: DataFrame,
    budget: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
    shuffle_salt: str | None = None,
) -> DataFrame:
    """GPT-style sequence packing: concatenate every document's tokens
    in ``id_col`` order into one virtual stream, cut the stream into
    consecutive packs of exactly ``budget`` tokens (the final pack may
    be short), and emit one row per (document, pack) overlap::

        doc_id | pack_id | tok_start | tok_end | pos_in_pack | n_toks

    ``tok_start``/``tok_end`` are the 1-based token span of the
    document that lands in this pack; ``pos_in_pack`` is the 0-based
    offset of that slice inside the pack. A document longer than the
    budget straddles several packs (one row each); callers slice the
    token array with (tok_start, n_toks) to assemble batches.

    The global token offset is a corpus-wide prefix sum — the naive
    form is a single-partition window (a 100 TB non-starter), so it is
    computed distributed in two phases:

    1. ``repartitionByRange(id)`` puts contiguous id ranges in
       partition-id order; a window partitioned by
       ``spark_partition_id()`` gives each row its PARTITION-LOCAL
       exclusive cumsum at full cluster width.
    2. Per-partition token totals (one row per partition — metadata
       scale) are collected, exclusive-prefix-summed on the driver,
       and broadcast-joined back: ``offset = partition_prefix +
       local_cumsum``.

    Both shuffles move only the slim (id, n_tokens) projection, never
    the text. The staged frame is lazily checkpointed so its two
    consumers (the window and the totals) see the SAME partition ids
    — without it the range repartition could be recomputed with
    different sampled bounds between consumers.

    ``shuffle_salt``: when set, the stream order is sha2(id||salt)
    (id tie-break) instead of id order — the deterministic pre-pack
    SHUFFLE a training pipeline wants so documents that are adjacent
    in the source (same crawl host, same shard) don't land in the
    same packs. Same salt -> same packing on any engine/partitioning;
    different salts -> independent orders per epoch. The per-document
    slices are identical either way — only adjacency changes.

    NULL-text documents contribute nothing to the token stream and
    emit no pack rows (deliberate: this is a PACK PLAN, not a
    per-document report — run the filter/dedup reports first for
    row-accounting semantics).
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    counts = (
        spread(docs, keys=(id_col,))
        .filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            F.size(tokens(F.col(text_col))).cast("bigint").alias("__n"),
        )
    )
    if shuffle_salt is not None:
        # 32-byte BINARY order key instead of the 64-char sha2 hex
        # string: unsigned byte order of the digest equals the hex
        # string's lexicographic order (the nibble -> hex-char map is
        # monotone), so the induced stream order — and the packing —
        # is identical, while the range exchange, the checkpoint
        # blocks, and the window sort carry half the key bytes.
        counts = counts.withColumn(
            "__ord",
            F.unhex(
                F.sha2(
                    F.concat_ws("\x1f", F.col(id_col).cast("string"),
                                F.lit(shuffle_salt)),
                    256,
                )
            ),
        )
        order_cols = [F.col("__ord"), F.col(id_col)]
    else:
        order_cols = [F.col(id_col)]
    staged = (
        counts.repartitionByRange(*order_cols)
        .withColumn("__part", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    totals = staged.groupBy("__part").agg(F.sum("__n").alias("__tot"))
    prefix = 0
    prefix_rows = []
    for r in sorted(totals.collect(), key=lambda r: r["__part"]):
        prefix_rows.append((r["__part"], prefix))
        prefix += r["__tot"]
    prefixes = docs.sparkSession.createDataFrame(
        prefix_rows or [(0, 0)], "__part int, __prefix bigint"
    )
    local = Window.partitionBy("__part").orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, -1
    )
    off = F.coalesce(F.sum("__n").over(local), F.lit(0)) + F.col("__prefix")
    offsets = (
        staged.join(F.broadcast(prefixes), "__part")
        .select(F.col(id_col), F.col("__n"), off.alias("__off"))
    )
    b = F.lit(budget).cast("bigint")
    pack = F.col("pack_id")
    start_in_doc = F.greatest(pack * b - F.col("__off") + 1, F.lit(1))
    end_in_doc = F.least((pack + 1) * b - F.col("__off"), F.col("__n"))
    return (
        offsets.filter(F.col("__n") > 0)
        .select(
            F.col(id_col),
            F.col("__n"),
            F.col("__off"),
            F.explode(
                F.sequence(
                    F.floor(F.col("__off") / b),
                    F.floor((F.col("__off") + F.col("__n") - 1) / b),
                )
            ).alias("pack_id"),
        )
        .select(
            F.col(id_col),
            pack.cast("bigint").alias("pack_id"),
            start_in_doc.cast("bigint").alias("tok_start"),
            end_in_doc.cast("bigint").alias("tok_end"),
            F.greatest(F.col("__off") - pack * b, F.lit(0))
            .cast("bigint")
            .alias("pos_in_pack"),
            (end_in_doc - start_in_doc + 1).cast("bigint").alias("n_toks"),
        )
    )


def assemble_packs(
    docs: DataFrame,
    packs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Materialize ``sequence_pack`` output into actual token arrays:
    one row per pack — (pack_id, tokens, n_toks).

    Joins the pack plan back to the documents, slices each document's
    token array to its in-pack span, and stitches slices in
    ``pos_in_pack`` order. Per-pack state is bounded by the token
    budget (a pack IS a budget's worth of tokens), so the final
    groupBy's collect is safe at any corpus size; the join is an
    equi-join on the doc id — broadcast-eligible when the pack plan is
    small, shuffle otherwise.
    """
    toked = spread(docs, keys=(id_col,)).select(
        F.col(id_col), tokens(F.col(text_col)).alias("__toks")
    )
    slices = packs.join(toked, id_col).select(
        "pack_id",
        "pos_in_pack",
        F.slice(F.col("__toks"), F.col("tok_start"), F.col("n_toks")).alias(
            "__slice"
        ),
    )
    return slices.groupBy("pack_id").agg(
        F.flatten(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos_in_pack", "__slice"))),
                lambda s: s["__slice"],
            )
        ).alias("tokens"),
        F.sum(F.size(F.col("__slice"))).cast("bigint").alias("n_toks"),
    )


def passage_dedup(
    docs: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """C4-style corpus-wide passage dedup: drop every repeated passage
    except its first occurrence, then reassemble each document from
    its surviving passages.

    Passages are consecutive non-overlapping ``k``-token windows (the
    corpus is flat token text; for prose, swap the splitter for a
    sentence regex — the dedup mechanics are identical). "First" is
    the corpus-wide minimum (doc_id, position) for that exact passage
    content, so output is deterministic and append-biased toward old
    data, matching the batch-dedup convention.

    Output: (id, text, n_windows, n_kept) — a document that keeps
    EVERY window keeps its ORIGINAL text byte-for-byte (inter-token
    whitespace survives); a document that loses windows is the
    surviving windows rejoined with single spaces, in order (empty
    string when everything was boilerplate; the row is retained so
    callers see the drop). NULL-text documents are retained too, with
    n_windows = 0 — every input row gets a verdict.

    Scale shape: explode to one row per window, then first-occurrence
    selection via a MAP-SIDE COMBINABLE min(struct(doc, pos)) per
    passage — deliberately an agg + join back rather than a
    row_number window over the passage key, because a boilerplate
    passage with 10M occurrences would make the window form sort one
    hot partition; the agg collapses it map-side and AQE's skew-join
    handles the join probe. Reassembly is one groupBy on the doc id.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    toked = spread(docs, keys=(id_col,)).select(
        F.col(id_col),
        F.col(text_col).alias("__text"),
        tokens(F.col(text_col)).alias("__toks"),
    )
    n = F.size(F.col("__toks"))
    starts = F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(k))
    # two consumers (the firsts agg and the join probe) and no exchange
    # between them would re-run the scan+tokenize+explode per consumer;
    # lazy-checkpoint the shared window relation once (same convention
    # as the LSH signature projection — see SCALE.md dedup notes)
    windows = toked.select(
        F.col(id_col), F.explode(starts).alias("start"),
        F.col("__toks"),
    ).select(
        F.col(id_col),
        F.col("start"),
        F.array_join(
            F.slice(F.col("__toks"), F.col("start"), F.lit(k)), " "
        ).alias("passage"),
    ).localCheckpoint(eager=False)
    firsts = windows.groupBy("passage").agg(
        F.min(F.struct(F.col(id_col), F.col("start"))).alias("__first")
    )
    kept = windows.join(firsts, "passage").withColumn(
        "__keep",
        F.struct(F.col(id_col), F.col("start")) == F.col("__first"),
    )
    assembled = kept.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_windows"),
        F.sum(F.col("__keep").cast("bigint")).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("__keep"),
                            F.struct(F.col("start"), F.col("passage")),
                        )
                    )
                ),
                lambda s: s["passage"],
            ),
            " ",
        ).alias("__joined"),
    )
    # every window kept -> original text byte-for-byte; only documents
    # that lost a passage pay the single-space rejoin (same fidelity
    # contract as exact_substring_dedup). LEFT join from the docs side:
    # NULL-text docs emit no windows, hence no assembled row — they
    # must still get a verdict (n_windows 0), not vanish.
    return toked.select(F.col(id_col), F.col("__text")).join(
        assembled, id_col, "left"
    ).select(
        id_col,
        F.when(
            F.coalesce(F.col("n_kept"), F.lit(0))
            == F.coalesce(F.col("n_windows"), F.lit(0)),
            F.col("__text"),
        )
        .otherwise(F.col("__joined"))
        .alias(text_col),
        F.coalesce(F.col("n_windows"), F.lit(0).cast("bigint")).alias("n_windows"),
        F.coalesce(F.col("n_kept"), F.lit(0).cast("bigint")).alias("n_kept"),
    )


def _bigrams(tk) -> F.Column:
    """Non-distinct token bigram array, row-local (see dedup._gram_col
    for why try_element_at + a guarded position range are required)."""
    positions = F.when(
        F.size(tk) >= 2, F.sequence(F.lit(0), F.size(tk) - 2)
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        positions,
        lambda i: F.concat_ws(
            " ", F.try_element_at(tk, i + 1), F.try_element_at(tk, i + 2)
        ),
    )


def _max_run(sorted_arr) -> F.Column:
    """Length of the longest run of equal adjacent elements in a
    SORTED array == count of the most frequent element. In-row fold
    (interpreted HOF, but row-local: no shuffle, no Python)."""
    zero = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )

    def step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    return F.aggregate(sorted_arr, zero, step, lambda acc: acc["best"])


def repetition_metrics(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signals, one zero-shuffle projection:
    duplicate-token fraction, most-frequent-token fraction, duplicate-
    bigram fraction. (The corpus is single-line text, so the line-level
    variants of these rules degenerate; token/bigram level carries the
    same semantics.)"""
    toked = spread(docs, keys=(id_col,)).select(
        F.col(id_col), tokens(F.col(text_col)).alias("__toks")
    )
    tk = F.col("__toks")
    n = F.size(tk)
    bg = _bigrams(tk)
    nb = F.size(bg)
    return toked.select(
        F.col(id_col),
        n.cast("bigint").alias("n_tokens"),
        ((n - F.size(F.array_distinct(tk))) / n).alias("dup_token_frac"),
        (_max_run(F.sort_array(tk)) / n).alias("top_token_frac"),
        F.when(nb > 0, (nb - F.size(F.array_distinct(bg))) / nb)
        .otherwise(F.lit(0.0))
        .alias("dup_bigram_frac"),
    )


def pii_metrics(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """PII match counts + post-redaction length. Counting and
    replacement are JVM regex built-ins; the redacted text itself is
    cheap to materialize but only its length is emitted here (the
    redaction op is `redact`)."""
    t = F.col(text_col)
    return docs.select(
        F.col(id_col),
        # regexp_count: count matches without materializing match arrays
        F.regexp_count(t, F.lit(EMAIL_RE)).cast("bigint").alias("n_emails"),
        F.regexp_count(t, F.lit(PHONE_RE)).cast("bigint").alias("n_phones"),
        F.regexp_count(t, F.lit(IP_RE)).cast("bigint").alias("n_ips"),
        F.length(redact(t)).cast("bigint").alias("redacted_len"),
    )


def redact(text) -> F.Column:
    """Replace emails, then phones, then IPs with typed placeholders.
    Order matters (an email can contain digits); fixed here so the
    oracle can mirror it exactly."""
    out = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, PHONE_RE, "<PHONE>")
    return F.regexp_replace(out, IP_RE, "<IP>")


def decontamination_hits(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    doc_shingles: DataFrame | None = None,
    eval_shingles: DataFrame | None = None,
) -> DataFrame:
    """Per-document count of distinct n-gram shingles shared with a
    held-out benchmark set: (id, n_eval_hits).

    The eval side is collapsed to a DISTINCT shingle set and BROADCAST
    — benchmark suites are tiny next to a 100 TB corpus, so the corpus
    side never shuffles: scan → row-local shingle explode → broadcast
    hash join → partial-agg count. Docs with no hit are absent (join
    is inner); callers left-join and coalesce to 0.

    ``doc_shingles`` / ``eval_shingles``: prebuilt ``(id, shingle)`` /
    ``(shingle,)``-compatible relations for the same inputs — callers
    that already hold a shared tokenized base (filter_report with
    ``toked``) pass both so the tokenize+gram pipeline is not
    re-derived per side.
    """
    eval_sh = (
        eval_shingles
        if eval_shingles is not None
        else shingles(eval_docs, n=n, text_col=text_col, id_col=id_col)
    ).select("shingle").distinct()
    doc_sh = (
        doc_shingles
        if doc_shingles is not None
        else shingles(docs, n=n, text_col=text_col, id_col=id_col)
    )
    return (
        doc_sh.join(F.broadcast(eval_sh), "shingle")
        .groupBy(id_col)
        .agg(F.count("*").cast("bigint").alias("n_eval_hits"))
    )


def calibrate_threshold(
    df: DataFrame,
    score_col: str,
    keep_frac: float,
    exact: bool = False,
    relative_error: float = 0.001,
) -> float:
    """The score cutoff that keeps the top ``keep_frac`` of rows:
    rows with ``score >= cutoff`` are kept.

    Real pipelines don't hand-pick quality thresholds — they pick a
    keep RATE ("keep the best 60%") and calibrate the cutoff from the
    score distribution. The cutoff is the (1 - keep_frac) quantile.

    ``exact=False`` (the 100 TB path) uses ``approxQuantile`` —
    Greenwald-Khanna, one pass, bounded memory at any scale, off by at
    most ``relative_error`` in RANK (so the kept fraction, not the
    kept rows' quality, is what wobbles). ``exact=True`` computes the
    true interpolated percentile — a full sort-based aggregate, for
    bounded data and oracle checks (matches DuckDB ``quantile_cont``).
    """
    if not 0.0 < keep_frac <= 1.0:
        raise ValueError("keep_frac must be in (0, 1]")
    q = 1.0 - keep_frac
    if exact:
        row = df.select(
            F.expr(f"percentile({score_col}, {q!r})").alias("cut")
        ).collect()[0]
        return float(row["cut"])
    return float(df.approxQuantile(score_col, [q], relative_error)[0])


def gopher_keep(
    n_tokens, avg_token_len, top_token_frac, contaminated
) -> F.Column:
    """Composite keep/drop decision over the metric columns."""
    return (
        (n_tokens >= KEEP_MIN_TOKENS)
        & (n_tokens <= KEEP_MAX_TOKENS)
        & (avg_token_len >= KEEP_MIN_AVG_TOKEN_LEN)
        & (avg_token_len <= KEEP_MAX_AVG_TOKEN_LEN)
        & (top_token_frac <= KEEP_MAX_TOP_TOKEN_FRAC)
        & ~contaminated
    )


@lru_cache(maxsize=None)
def _report_metric_cols(text_col: str, id_col: str) -> tuple:
    """The filter_report metrics projection, memoized per column-name
    pair: unresolved Columns are immutable expression trees safely
    shared across plans, and this fragment alone is several hundred
    py4j round-trips per construction (the round-2 "memoize fixed-name
    Column fragments" discipline — corpus_filters pays plan
    construction on every bench run because its checkpointed base
    keeps it out of the registry's plan memo)."""
    t = F.col(text_col)
    tk = F.col("__toks")
    n = F.size(tk)
    bg = _bigrams(tk)
    nb = F.size(bg)
    # codegen string arithmetic, not an interpreted transform+aggregate
    # fold (see functions/text.py::token_len_sum)
    tok_len_sum = F.length(F.regexp_replace(t, "\\s+", ""))
    return (
        F.col(id_col),
        n.cast("bigint").alias("n_tokens"),
        ((n - F.size(F.array_distinct(tk))) / n).alias("dup_token_frac"),
        (_max_run(F.sort_array(tk)) / n).alias("top_token_frac"),
        F.when(nb > 0, (nb - F.size(F.array_distinct(bg))) / nb)
        .otherwise(F.lit(0.0))
        .alias("dup_bigram_frac"),
        # regexp_count: count matches without materializing match arrays
        F.regexp_count(t, F.lit(EMAIL_RE)).cast("bigint").alias("n_emails"),
        F.regexp_count(t, F.lit(PHONE_RE)).cast("bigint").alias("n_phones"),
        F.regexp_count(t, F.lit(IP_RE)).cast("bigint").alias("n_ips"),
        F.length(redact(t)).cast("bigint").alias("redacted_len"),
        (tok_len_sum / n).alias("avg_token_len"),
    )


def filter_report(
    docs: DataFrame,
    eval_docs: DataFrame,
    is_eval_col,
    shingle_n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    toked: DataFrame | None = None,
) -> DataFrame:
    """The full corpus-filter report: repetition + PII + avg-token-len
    metrics in ONE zero-shuffle projection over the documents scan,
    decontamination hit counts attached by a single doc_id-keyed left
    join (the only shuffle; its build side is the output of the
    broadcast shingle join in `decontamination_hits`).

    ``is_eval_col`` is the membership predicate Column that defines
    ``eval_docs`` (evaluated per-row, so no join is needed for the
    flag itself).

    ``toked``: a prebuilt — ideally checkpointed — ``(id, text,
    __toks)`` tokenization of ``docs``. When given, EVERY branch
    (metrics projection, corpus-side shingles, eval-side shingles)
    derives from it instead of re-scanning + re-splitting the corpus;
    the eval shingle set is then ``is_eval_col``-filtered from the
    corpus-side shingles, which is exactly the membership relation
    ``eval_docs`` encodes (same rows, one gram pipeline instead of
    two).
    """
    shared = toked is not None
    if not shared:
        t = F.col(text_col)
        toked = spread(docs, keys=(id_col,)).select(
            F.col(id_col), t, tokens(t).alias("__toks")
        )
    metrics = toked.select(*_report_metric_cols(text_col, id_col))
    if shared:
        doc_sh = shingles(
            docs, n=shingle_n, text_col=text_col, id_col=id_col, toked=toked
        )
        hits = decontamination_hits(
            docs, eval_docs, n=shingle_n, text_col=text_col, id_col=id_col,
            doc_shingles=doc_sh, eval_shingles=doc_sh.filter(is_eval_col),
        ).withColumnRenamed(id_col, "__hit_id")
    else:
        hits = decontamination_hits(
            docs, eval_docs, n=shingle_n, text_col=text_col, id_col=id_col
        ).withColumnRenamed(id_col, "__hit_id")
    out = metrics.join(
        hits, F.col(id_col) == F.col("__hit_id"), "left"
    ).drop("__hit_id")
    n_hits = F.coalesce(F.col("n_eval_hits"), F.lit(0).cast("bigint"))
    contaminated = (~is_eval_col) & (n_hits >= CONTAM_MIN_HITS)
    return out.select(
        id_col, "n_tokens", "dup_token_frac", "top_token_frac",
        "dup_bigram_frac", "n_emails", "n_phones", "n_ips", "redacted_len",
        "avg_token_len",
        n_hits.alias("n_eval_hits"),
        is_eval_col.alias("is_eval"),
        contaminated.alias("contaminated"),
        gopher_keep(
            F.col("n_tokens"), F.col("avg_token_len"),
            F.col("top_token_frac"), contaminated,
        ).alias("keep"),
    )


def token_df_counts(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    toked: DataFrame | None = None,
) -> DataFrame:
    """Corpus document frequency per token: (tok, df) where df = the
    number of documents containing the token at least once.

    Counted as one row per (doc, distinct token) — ``array_distinct``
    row-locally before the explode, so the agg never sees duplicate
    (doc, tok) pairs and ``count(*)`` IS the document frequency (no
    count-distinct shuffle). One map-side-combinable groupBy keyed by
    token; the result is vocabulary-scale (millions of rows at 100 TB,
    metadata next to the corpus).
    """
    src = (
        toked.select(
            F.col(id_col),
            F.explode(F.array_distinct(F.col("__toks"))).alias("tok"),
        )
        if toked is not None
        else spread(docs, keys=(id_col,)).select(
            F.col(id_col),
            F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("tok"),
        )
    )
    return src.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )


def rarity_metrics(
    docs: DataFrame,
    df_counts: DataFrame | None = None,
    rare_df_threshold: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    toked: DataFrame | None = None,
) -> DataFrame:
    """CCNet-style per-document rarity signals from corpus document
    frequencies: over the document's token OCCURRENCES,

    - ``mean_token_df``  average df of the tokens (low = unusual text);
    - ``n_rare_tokens`` / ``rare_frac``  occurrences whose token
      appears in <= ``rare_df_threshold`` documents (OOV/gibberish
      signal — the integer-rational stand-in for LM-perplexity
      bucketing, chosen because counts and ratios of counts are
      EXACTLY cross-engine reproducible where a sum of ``log`` terms
      is not).

    ``df_counts`` defaults to ``token_df_counts(docs)`` — pass a
    precomputed/persisted frequency table to amortize it across
    queries (the production shape: frequencies are a corpus artifact,
    not per-query work). Plan: explode occurrences, one keyed join to
    the vocabulary table (AQE broadcasts it while it fits; hot tokens
    are harmless — the build side has one row per token), one groupBy
    back to doc grain.
    """
    if df_counts is None:
        df_counts = token_df_counts(
            docs, text_col=text_col, id_col=id_col, toked=toked
        )
    # explode_OUTER keeps a NULL-token row for token-less (NULL-text)
    # docs, so every document reaches the aggregation in ONE scan —
    # no second docs scan, no extra doc-keyed join (review finding)
    occ = (
        toked.select(
            F.col(id_col), F.explode_outer(F.col("__toks")).alias("tok")
        )
        if toked is not None
        else spread(docs, keys=(id_col,)).select(
            F.col(id_col),
            F.explode_outer(tokens(F.col(text_col))).alias("tok"),
        )
    )
    # LEFT join with missing df -> 0: with a PRECOMPUTED frequency
    # table, tokens the index has never seen are exactly the maximally
    # rare signal this metric exists for — an inner join would silently
    # exclude them and drop an all-OOV document from the output
    # entirely (and from any report inner-joined on the doc id
    # downstream). No-op when df_counts is derived from `docs` itself.
    joined = occ.join(df_counts, "tok", "left").withColumn(
        "df", F.coalesce(F.col("df"), F.lit(0).cast("bigint"))
    )
    return joined.groupBy(id_col).agg(*_rarity_agg_cols(rare_df_threshold))


@lru_cache(maxsize=None)
def _rarity_agg_cols(rare_df_threshold: int) -> tuple:
    """rarity_metrics' aggregate fragments over the fixed tok/df
    columns, memoized per threshold (plan-construction cost only).

    All aggregates guard on the REAL occurrences (tok non-null):
    identical operands to the plain-explode form on non-null docs,
    null means / zero counts for token-less docs (ANSI-safe via
    try_divide)."""
    is_occ = F.col("tok").isNotNull()
    n_occ = F.sum(is_occ.cast("bigint"))
    n_rare = F.sum(
        (is_occ & (F.col("df") <= rare_df_threshold)).cast("bigint")
    )
    return (
        F.try_divide(
            F.sum(F.when(is_occ, F.col("df"))).cast("double"), n_occ
        ).alias("mean_token_df"),
        n_rare.alias("n_rare_tokens"),
        F.try_divide(n_rare, n_occ).alias("rare_frac"),
    )


def top_ngrams(
    docs: DataFrame,
    n: int = 2,
    k: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-wide most frequent token n-grams: (ngram, n_docs,
    n_occurrences), top ``k`` by occurrence count (ties broken on the
    gram text for determinism).

    The boilerplate-discovery / tokenizer-seeding primitive: the same
    counts that drive `max_df` stop-shingle choices and BPE merge
    candidates. One explode + one map-side-combined groupBy; the final
    top-k lowers to TakeOrderedAndProject (distributed heap, no global
    sort).

    ``n_occurrences`` counts every window; ``n_docs`` counts distinct
    documents via the per-doc-distinct trick (no count-distinct
    shuffle — same design as ``token_df_counts``).
    """
    toked = spread(docs, keys=(id_col,)).select(
        F.col(id_col), tokens(F.col(text_col)).alias("__toks")
    )
    tk = F.col("__toks")
    starts = F.when(
        F.size(tk) >= n, F.sequence(F.lit(1), F.size(tk) - n + 1)
    ).otherwise(F.array().cast("array<int>"))
    occ = toked.select(
        F.col(id_col),
        F.explode(starts).alias("__s"),
        tk,
    ).select(
        F.col(id_col),
        F.array_join(F.slice(tk, F.col("__s"), F.lit(n)), " ").alias("ngram"),
    )
    counts = occ.groupBy("ngram").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
        # countDistinct is exact here but adds an expand+second shuffle;
        # approx would break oracles. Instead: distinct (doc, gram)
        # first is ANOTHER shuffle. The cheap exact form: count distinct
        # ids per gram via a size(collect_set) would hold a per-gram id
        # set in one heap — wrong at scale. Keep the expand-based exact
        # count_distinct: it is Spark's standard two-phase distinct agg
        # (partial dedup map-side), skew-safe on a 256-bit-ish key
        # space, and the gram key's hot entries dedup map-side first.
        F.countDistinct(F.col(id_col)).cast("bigint").alias("n_docs"),
    )
    return (
        counts.orderBy(
            F.col("n_occurrences").desc(), F.col("ngram")
        ).limit(k)
    )


def compression_metrics(
    docs: DataFrame,
    text_col: str = "text",
    level: int = 6,
    out_col: str = "compression_ratio",
) -> DataFrame:
    """``docs`` + the zlib compression ratio of the text
    (compressed bytes / utf-8 bytes) — the classic cheap quality
    signal: highly repetitive/boilerplate text compresses far below
    ~0.4, while natural prose sits higher and random noise near (or
    above) 1.0. Used alongside the repetition fractions as a
    keep/drop feature (quality_model can take it as an extra input).

    NULL/empty text yields NULL (total over crawl data). This is the
    one text metric that genuinely needs Python — there is no zlib in
    Spark SQL — so it runs as an Arrow-batched ``pandas_udf``
    (one vectorized batch per Arrow block, never per-row Python
    round-trips). Deterministic for a fixed zlib build; NOT
    cross-engine oracle-able (zlib output varies across library
    builds), hence pytest-mirror proven, not driver-row proven.
    """
    import pandas as pd  # function-scoped: the pure-SQL corpus
    # operators must stay importable on images without pandas
    from pyspark.sql.functions import pandas_udf

    def _ratio(texts):
        import zlib

        def one(t):
            if t is None:
                return None
            raw = t.encode("utf-8")
            if not raw:
                return None
            return len(zlib.compress(raw, level)) / len(raw)

        return texts.map(one)

    # real-object annotations (not __future__ strings), set after
    # definition so pyspark's type-hint inference sees pd.Series
    # without pandas being a module-level import
    _ratio.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return docs.withColumn(
        out_col, pandas_udf("double")(_ratio)(F.col(text_col))
    )
