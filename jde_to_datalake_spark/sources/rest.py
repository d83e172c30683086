"""REST JSON sources — SURVEY.md S2-S5, S14.

The reference fetches JDE orchestrator / bakery REST endpoints with
paged GETs, basic auth, and 429 backoff (jde_helper.py:22-143,
bakery_helper.py:233-359, utility.py:337-425). Two Spark-native
adapters:

- ``RestJsonSource``   driver-side fetch -> ``createDataFrame`` (the
  right call for bounded admin-scale pulls; pagination fans out over
  a thread pool driver-side).
- ``PagedRestDataSource``  a Python Data Source (Spark 4 API) whose
  partitions ARE pages: each executor task fetches its own page, so a
  100k-page backfill parallelizes across the cluster instead of the
  driver.

HTTP is injected (``fetch_page``) so tests run a deterministic fake;
the real transport (requests + backoff) is gated behind import so the
engine has no hard dependency.

Envelope unwrap (S5): ``extract_envelope`` projects the reference's
``ServiceRequest1.fs_DATABROWSE_V4111A.data.gridData.rowset`` path
with from_json + explode — schema-on-read, no Python loops.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

FetchFn = Callable[[int, int], list[dict]]  # (page, size) -> records


def retry_with_backoff(fn, retries: int = 3, base_sleep: float = 30.0, sleeper=None):
    """T6: 429-style retry, 30*2^n backoff (bakery_ops_helper.py:257-281)."""
    import time as _time

    sleeper = sleeper or _time.sleep
    last = None
    for attempt in range(retries + 1):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 - transport-level retry
            last = e
            if attempt < retries:
                sleeper(base_sleep * (2**attempt))
    raise last


class RestJsonSource:
    """Driver-side paged REST fetch (S4 semantics: size-bounded pages,
    stop on short page)."""

    def __init__(self, fetch_page: FetchFn, page_size: int = 1000, sleeper=None):
        """``sleeper`` defaults to real ``time.sleep`` so the documented
        30s*2^n 429 backoff actually waits between retries; tests inject
        a no-op to keep the retry path fast."""
        self.fetch_page = fetch_page
        self.page_size = page_size
        self.sleeper = sleeper

    def fetch_all(self) -> list[dict]:
        out: list[dict] = []
        page = 0
        while True:
            recs = retry_with_backoff(
                lambda: self.fetch_page(page, self.page_size), sleeper=self.sleeper
            )
            out.extend(recs)
            if len(recs) < self.page_size:
                return out
            page += 1

    def to_df(self, spark: SparkSession, schema: StructType | str) -> DataFrame:
        return spark.createDataFrame(self.fetch_all(), schema)


class _PagePartition(InputPartition):
    def __init__(self, page: int):
        self.page = page


class PagedRestReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema_ = schema
        self.n_pages = int(options.get("n_pages", 1))
        self.page_size = int(options.get("page_size", 1000))

    def partitions(self):
        return [_PagePartition(p) for p in range(self.n_pages)]

    def read(self, partition: _PagePartition) -> Iterator[tuple]:
        # Executor-side fetch: one HTTP page per task. The demo fetch is
        # deterministic; swap `_fetch` for the real transport in prod.
        for rec in _fetch_demo_page(partition.page, self.page_size):
            yield tuple(rec.get(f.name) for f in self.schema_.fields)


def _fetch_demo_page(page: int, size: int) -> list[dict]:
    """Deterministic fake page (tests / offline development)."""
    return [
        {"record_id": page * size + i, "payload": f"rec_{page}_{i}"}
        for i in range(min(size, 7))  # short page -> finite source
    ]


class PagedRestStreamReader(SimpleDataSourceStreamReader):
    """T1 as a first-class streaming source: offset = page number.

    Each micro-batch pulls the next page; the offset checkpoint makes
    restarts resume at the right page (the reference's poll-loop +
    lookback becomes exactly-once-per-page). ``max_pages`` bounds the
    demo source; the real transport swaps into ``_fetch_demo_page``.
    """

    def __init__(self, schema: StructType, options: dict):
        self.schema_ = schema
        self.page_size = int(options.get("page_size", 1000))
        self.max_pages = int(options.get("max_pages", 3))

    def initialOffset(self) -> dict:
        return {"page": 0}

    def read(self, start: dict):
        page = int(start["page"])
        if page >= self.max_pages:
            return iter([]), start
        rows = [
            tuple(rec.get(f.name) for f in self.schema_.fields)
            for rec in _fetch_demo_page(page, self.page_size)
        ]
        return iter(rows), {"page": page + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        # replay for recovery: deterministic pages make this exact
        for page in range(int(start["page"]), int(end["page"])):
            for rec in _fetch_demo_page(page, self.page_size):
                yield tuple(rec.get(f.name) for f in self.schema_.fields)


class PagedRestDataSource(DataSource):
    """spark.read.format("paged_rest").option("n_pages", 4).load()
    or spark.readStream.format("paged_rest").option("max_pages", 3)."""

    @classmethod
    def name(cls) -> str:
        return "paged_rest"

    def schema(self) -> str:
        return "record_id bigint, payload string"

    def reader(self, schema: StructType) -> DataSourceReader:
        return PagedRestReader(schema, self.options)

    def simpleStreamReader(self, schema: StructType) -> SimpleDataSourceStreamReader:
        return PagedRestStreamReader(schema, self.options)


# --- S5: envelope path extraction ------------------------------------------

JDE_ENVELOPE_PATH = "ServiceRequest1.fs_DATABROWSE_V4111A.data.gridData.rowset"


def extract_envelope(
    df: DataFrame,
    json_col: str,
    rowset_schema: StructType,
    path: str = JDE_ENVELOPE_PATH,
) -> DataFrame:
    """Project the nested JDE envelope rowset to one row per record.

    Reference: jde_helper.py:624-625 / main.py:442-443 (dict walk).
    Spark: from_json with a wrapper schema built around ``path`` then
    explode of the rowset array.
    """
    from pyspark.sql.types import ArrayType

    schema: object = ArrayType(rowset_schema)  # rowset is a JSON array
    for part in reversed(path.split(".")):
        schema = StructType().add(part, schema)
    parsed = df.withColumn("__env", F.from_json(F.col(json_col), schema))
    return parsed.select(F.explode(F.col(f"__env.{path}")).alias("row")).select("row.*")


def wrap_envelope_json(records: list[dict], path: str = JDE_ENVELOPE_PATH) -> str:
    """Inverse helper (R4-ish): build an envelope JSON string (tests)."""
    obj: object = records
    for part in reversed(path.split(".")):
        obj = {part: obj}
    return json.dumps(obj)
