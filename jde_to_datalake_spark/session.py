"""SparkSession factory tuned for the engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32 threads,
single JVM); the conf below is chosen so the *same logical plans* scale
to a 1000-executor cluster:

- AQE on (runtime join selection, skew-join splitting, partition
  coalescing) so small-SF tests and 100 TB runs share one code path.
- Broadcast threshold raised: every dimension table in the model
  (region/nation/supplier/part, UoM conversion dim) is far below it,
  so star joins never shuffle the fact side.
- ``spark.sql.shuffle.partitions`` sized from env; at cluster scale
  AQE coalesces, locally we keep it near core count.
- Arrow enabled for the few pandas-UDF extension operators (text/vector
  ops) — everything relational stays JVM-side in whole-stage codegen.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "jde_to_datalake_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # LOCAL sizing: cores/2, floor 8. In a single JVM the scheduler
        # wakeup path is the dominant small-task cost (this microVM's
        # host delivers thread wakeups at 100-200us when sick), so
        # fewer/bigger shuffle tasks measurably win: A/B on the heavy
        # headline queries at sf0.1 showed cores/2 -16% vs cores
        # (cores/4 starves wide explode stages — action_flatten +20%).
        # AQE's coalescing cannot make this choice for us: with
        # parallelismFirst=true (the default, kept) it refuses to
        # coalesce below parallelism, and with false it serializes
        # explode-heavy stages (round-2 finding). At CLUSTER scale this
        # branch is irrelevant — deployments size shuffle.partitions
        # ~2x total executor cores (or let AQE coalesce from a high
        # initialPartitionNum); the plans themselves are unchanged.
        n = int(cpus) if cpus.isdigit() else 32
        shuffle_partitions = max(n // 2, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # allow shuffled-hash join where its size guard holds (guide
        # §3.1/§9): SMJ pays two per-partition sorts that SHJ skips;
        # the planner still requires the build side under
        # autoBroadcastJoinThreshold x shuffle.partitions per the
        # canBuildLocalHashMap guard, and AQE skew-splitting applies
        # to SHJ as it does to SMJ. A/B round 12 (3 interleaved pairs,
        # min-of-4 per run, join-heavy 8-query set at sf0.1):
        # 2.176s -> 2.067s total, every query <= baseline.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # everything the engine WRITES (lake commits, training shards,
        # exports) compresses with zstd: A/B at sf0.1 (lineitem) -20%
        # bytes vs snappy (8.64 vs 10.76 MB) for +6% warm write time,
        # warm read-back at parity or better (0.262 vs 0.291 s). At
        # lake scale the byte saving compounds across every scan of
        # every written file (guide: I/O and file layout). Inputs are
        # whatever codec they arrived in; this only picks the output.
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.sql.session.timeZone", "UTC")
        # the default 100-entry compiled-class cache thrashes when a
        # long-lived session serves a many-query registry (each big
        # query contributes several generated classes; eviction forces
        # a multi-hundred-ms Janino recompile per revisit)
        .config("spark.sql.codegen.cache.maxEntries", "2000")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # deterministic parquet reads regardless of file count
        .config("spark.sql.files.maxPartitionBytes", "128m")
        # match DuckDB/pandas naive-timestamp semantics for parity
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
        # events.parquet carries TIMESTAMP(NANOS); read as long, convert below
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # throughput collector for a batch engine: G1's low-pause
        # machinery (concurrent marking, remembered sets) taxes a
        # workload that only cares about total time; ParallelGC was
        # -7% on the heavy headline queries at sf0.1 (A/B, round 9).
        # NOTE this conf only takes effect when THIS call launches the
        # driver JVM (plain `python script.py`); under pyspark-shell,
        # spark-submit client mode, or an already-running gateway it
        # is silently ignored — set the flag in spark-submit's
        # --driver-java-options there. Merged (not overwritten) with
        # any externally supplied options so a deployment's own flags
        # survive; SPARK_GRAFT_DRIVER_JAVA_OPTS overrides/extends.
        .config(
            "spark.driver.extraJavaOptions",
            " ".join(
                p
                for p in (
                    "-XX:+UseParallelGC",
                    # env LAST: for repeated JVM flags the final one
                    # wins, so operator-supplied options can override
                    os.environ.get("SPARK_GRAFT_DRIVER_JAVA_OPTS", ""),
                )
                if p
            ),
        )
    )
    if master.startswith("local"):
        # single-JVM shuffles are memory/page-cache backed: lz4 on the
        # shuffle path is pure CPU overhead here. On a real cluster the
        # default (compressed) is correct — this branch never fires.
        builder = builder.config("spark.shuffle.compress", "false").config(
            "spark.shuffle.spill.compress", "false"
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def spread(df, min_partitions: int | None = None, keys: tuple[str, ...] = ()):
    """Widen a narrow scan to the session's parallelism.

    Small parquet files arrive as 1-2 input splits, which would
    serialize CPU-heavy per-row operators (shingling, hashing, vector
    math) onto one core — and Spark's parquet reader assigns rows at
    ROW-GROUP granularity, so for a single-row-group file the extra
    byte-range splits do no work at all. At 100 TB inputs have
    thousands of splits and this is a no-op — it only repartitions
    when the scan is narrower than the cluster, so it never adds a
    shuffle at scale. (The check is split-count-based: a LARGE
    single-row-group file that planning carves into >= parallelism
    byte-range splits is not detected — write real lakes with sane
    row-group sizes instead of leaning on this helper.)

    With ``keys``, hash-distributes on them (see ``spread_by``).
    Callers should pass the frame's PRIMARY KEY here whenever one
    exists: a keyless ``repartition(n)`` is round-robin, which first
    pays a local binary sort of every input row
    (``spark.sql.execution.sortBeforeRepartition``, required for
    deterministic retries — guide §2.5), while hash partitioning on a
    unique key is deterministic per row with no sort and spreads just
    as evenly. Measured at sf0.1 on transaction_ids: keyed 0.70 s vs
    round-robin 1.24 s for the identical result set (round 13).
    Streaming frames pass through — micro-batch width is the source's
    business (and ``df.rdd`` is illegal on them).
    """
    if df.isStreaming:
        return df
    if min_partitions is None:
        min_partitions = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < min_partitions:
        return df.repartition(min_partitions, *keys)
    return df


def spread_by(df, *keys: str, min_partitions: int | None = None):
    """``spread`` that hash-distributes on ``keys``.

    For a narrow scan feeding a keyed aggregation/join, distributing by
    the downstream key does double duty: the expensive per-row /
    partial-aggregation work runs at cluster width AND the exchange
    satisfies the downstream clustering requirement, so the
    aggregation runs in the same stage with no second shuffle.

    No-op when the scan is already at least as wide as the cluster
    (the 100 TB case: thousands of input splits, map-side partial
    aggregation already parallel — adding a raw-row shuffle there
    would be a regression, which is exactly why this is conditional).
    """
    return spread(df, min_partitions=min_partitions, keys=keys)


# Per-session cache of table DataFrames. A DataFrame here is a LAZY
# plan — caching it shares the (driver-side) parquet-footer read and
# expression construction across queries; every action still re-scans
# the data. WeakKey so stopped sessions don't pin their entries.
from weakref import WeakKeyDictionary

_TABLE_CACHE: WeakKeyDictionary = WeakKeyDictionary()


def load_table(spark: SparkSession, sf_dir: str, name: str):
    """Read one testdata table, normalizing nano-timestamps to NTZ.

    ``events.ts`` is parquet TIMESTAMP(NANOS) which Spark has no native
    type for; with ``nanosAsLong`` it arrives as bigint nanoseconds and
    is converted here (integer div — no double round-trip) to
    timestamp_ntz, matching DuckDB/pandas naive semantics.
    """
    try:
        per_session = _TABLE_CACHE.setdefault(spark, {})
    except TypeError:  # session type not weakref-able: skip caching
        per_session = {}
    key = (os.path.abspath(sf_dir), name)
    if key not in per_session:
        per_session[key] = _load_table_uncached(spark, sf_dir, name)
    return per_session[key]


def _load_table_uncached(spark: SparkSession, sf_dir: str, name: str):
    from pyspark.sql import functions as F

    try:  # driver-owned sessions may not have the conf yet
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None):
    """Register each parquet table under ``sf_dir`` as a temp view and
    return a dict of DataFrames.

    Mirrors the reference's ``read_table`` scan (SURVEY S1,
    backend/main.py:116-126) but lazily: nothing is fetched until an
    action; Catalyst pushes filters/projections into the parquet scan.
    """
    from jde_to_datalake_spark import TABLES

    out = {}
    for name in names or TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = load_table(spark, sf_dir, name)
            df.createOrReplaceTempView(name)
            out[name] = df
    return out
