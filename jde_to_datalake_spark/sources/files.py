"""Schema-on-read file sources (CSV / JSON lines) with reject capture.

The reference ingests semi-structured text two ways, both lossy on
error: REST JSON parsed in-process (a malformed document raises and
kills the task run), and all-TEXT Postgres staging tables
(backend/bakery_helper.py:63-75) that defer typing to downstream
``pd.to_numeric(errors="coerce")`` passes (backend/main.py:196-197).
Here both become ONE declarative pattern:

  ``read_csv_with_rejects`` / ``read_json_lines_with_rejects``
    -> (valid, rejects): rows that parse land typed; rows that don't
       surface as raw text lines. Both sides are LAZY.

Poison rows never fail the job (the reference's crash mode) and never
silently disappear (the ``DROPMALFORMED`` trap) — they are data, to
be counted/quarantined by the caller (the quality-report operator in
operators/quality.py composes directly).

Two different scans back the two sides, deliberately:

- valid      = the NATIVE typed reader in PERMISSIVE mode — column
  pruning and filter pushdown reach the file scan (asserted in tests).
- rejects    = a TEXT scan re-parsed per line with from_csv/from_json.
  Spark forbids querying a permissive file scan through only its
  corrupt-record column (QUERY_ONLY_CORRUPT_RECORD_COLUMN — any
  aggregation over the rejects prunes down to exactly that), and the
  documented cache() workaround would pin the whole table; a text
  scan has no such rule, reads only the line bytes, and keeps the raw
  line that the native reader would have to reconstruct.

Both sides re-list the same files; at 100 TB the reject side is only
ever run when triage is wanted, and it reads each line once with no
shuffle.

Scale notes: an explicit schema is REQUIRED at 100 TB — schema
inference is a second full scan of the input before the real one.
``infer_schema`` below exists for interactive use and SAMPLES the
input (samplingRatio) rather than reading it all; production paths
should pass the checked-in schema. Line-delimited text is splittable,
so inputs parallelize to block-sized partitions with no custom code;
``multiLine`` JSON forces one partition per FILE and should be
reserved for small envelope documents (the REST landing path in
sources/rest.py flattens envelopes before they get here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def _with_corrupt_field(schema: StructType) -> StructType:
    """The corrupt-record column must be part of the read schema."""
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return StructType(list(schema.fields) + [StructField(CORRUPT_COL, StringType())])


def _csv_ddl(schema: StructType) -> str:
    return ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
    )


def _pruning_guard(schema: StructType):
    """Always-true predicate that references one real column.

    Needed on the valid side: ``filter(corrupt IS NULL)`` leaves ONLY
    the corrupt column in the scan's required schema for queries that
    reference no data columns (a bare ``count()``), and Spark refuses
    such scans outright (QUERY_ONLY_CORRUPT_RECORD_COLUMN). Keeping one
    real column required is also what forces the parser to full-row
    semantics, so validity never depends on which columns a downstream
    query happens to project (the DROPMALFORMED + column-pruning trap).
    Written so constant folding cannot remove it: ``length(cast(x)) >=
    -1`` is non-foldable and ``coalesce(_, true)`` absorbs the NULL
    case. Cost: one narrow column stays in the required schema — text
    sources parse whole lines regardless, so this is conversion-only.
    """
    first = schema.fields[0].name
    return F.coalesce(F.length(F.col(first).cast("string")) >= -1, F.lit(True))


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    **options,
) -> DataFrame:
    """Typed CSV scan; unparseable rows carry their raw text in
    ``_corrupt_record`` (declared automatically — PERMISSIVE is the
    default mode, but without the column in the schema bad fields are
    silently nulled)."""
    reader = (
        spark.read.schema(_with_corrupt_field(schema))
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def read_json_lines(
    spark: SparkSession,
    path: str,
    schema: StructType,
    **options,
) -> DataFrame:
    """Typed JSON-lines scan with the same corrupt-column contract as
    ``read_csv``."""
    reader = (
        spark.read.schema(_with_corrupt_field(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)


def read_csv_with_rejects(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    **options,
) -> tuple[DataFrame, DataFrame]:
    """(valid, rejects) over a CSV input — see module docstring.

    ``rejects`` is one column ``raw``: the undecodable line verbatim.
    With ``header=True`` the header line (schema field names joined by
    the delimiter) is excluded from the reject side; a data line that
    byte-equals the header is indistinguishable and also excluded.
    """
    df = read_csv(spark, path, schema, header=header, **options)
    valid = df.filter(
        F.col(CORRUPT_COL).isNull() & _pruning_guard(schema)
    ).drop(CORRUPT_COL)

    opts = {str(k): str(v) for k, v in options.items()}
    opts["mode"] = "PERMISSIVE"
    opts["columnNameOfCorruptRecord"] = CORRUPT_COL
    lines = spark.read.text(path)
    if header:
        sep = opts.get("sep", opts.get("delimiter", ","))
        header_line = sep.join(f.name for f in schema.fields)
        lines = lines.filter(F.col("value") != header_line)
    parsed = F.from_csv(
        F.col("value"), _csv_ddl(_with_corrupt_field(schema)), opts
    )
    rejects = (
        lines.withColumn("__p", parsed)
        .filter(F.col(f"__p.{CORRUPT_COL}").isNotNull())
        .select(F.col("value").alias("raw"))
    )
    return valid, rejects


def read_json_lines_with_rejects(
    spark: SparkSession,
    path: str,
    schema: StructType,
    **options,
) -> tuple[DataFrame, DataFrame]:
    """(valid, rejects) over a JSON-lines input — see module docstring."""
    df = read_json_lines(spark, path, schema, **options)
    valid = df.filter(
        F.col(CORRUPT_COL).isNull() & _pruning_guard(schema)
    ).drop(CORRUPT_COL)

    opts = {str(k): str(v) for k, v in options.items()}
    opts["mode"] = "PERMISSIVE"
    opts["columnNameOfCorruptRecord"] = CORRUPT_COL
    parsed = F.from_json(F.col("value"), _with_corrupt_field(schema), opts)
    rejects = (
        spark.read.text(path)
        .withColumn("__p", parsed)
        .filter(F.col(f"__p.{CORRUPT_COL}").isNotNull())
        .select(F.col("value").alias("raw"))
    )
    return valid, rejects


def infer_schema(
    spark: SparkSession,
    path: str,
    fmt: str = "csv",
    sampling_ratio: float = 0.1,
    header: bool = True,
) -> StructType:
    """Sampled schema inference for interactive/dev use (the
    reference's infer_schema_from_data, backend/schema_manager.py:
    177-223, walks ONE record; this samples the real input). Returns
    the inferred StructType WITHOUT the corrupt column — pass it to
    the readers above, persist it via sources/schema_manager.py for
    versioning."""
    if fmt == "csv":
        df = (
            spark.read.option("header", str(header).lower())
            .option("inferSchema", "true")
            .option("samplingRatio", str(sampling_ratio))
            .csv(path)
        )
    elif fmt == "json":
        df = spark.read.option("samplingRatio", str(sampling_ratio)).json(path)
    else:
        raise ValueError(f"unsupported format: {fmt}")
    fields = [f for f in df.schema.fields if f.name != CORRUPT_COL]
    return StructType(fields)
