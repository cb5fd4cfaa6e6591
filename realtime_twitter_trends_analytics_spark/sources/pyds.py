"""Custom Python DataSource (Spark 4 DataSource API): a deterministic
synthetic-documents generator, registered as ``format("synthdocs")``.

This is the source-extensibility surface the reference filled with a
hand-written Java producer (KafkaTwitterProducer.java:44-131): where the
reference pushed synthetic/live records through Kafka, a Spark-4-native
engine can expose any generator or external system as a first-class
``spark.read.format(...)`` source with schema, partition planning, and
parallel reads — no driver-side row materialization, no RDD plumbing.

Scale notes:
- ``partitions()`` plans N independent splits; each executor core reads its
  split through an Arrow-friendly iterator — read parallelism is the
  source's job, exactly like parquet row groups.
- The generator is pure (seeded per doc_id), so task retries reproduce
  identical rows — the same determinism contract as the parquet tables.
- A real external source (REST cursor, kafka-like log, object store
  listing) swaps the row loop; the partition-planning shape stays.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

VOCAB = (
    "the", "a", "data", "row", "table", "column", "line", "part",
    "batch", "stream", "group", "window", "join", "filter", "sort",
    "merge", "hash", "key", "value", "query",
)


def _doc_text(doc_id: int) -> str:
    """Deterministic word-salad text for doc_id (LCG over the vocab)."""
    x = (doc_id * 2654435761 + 1) % (2**32)
    words = []
    n = 8 + (x % 9)
    for _ in range(n):
        x = (x * 1103515245 + 12345) % (2**31)
        words.append(VOCAB[x % len(VOCAB)])
    return " ".join(words)


class _Range(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


class SynthDocsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n_docs = int(options.get("n_docs", 100))
        self.n_parts = int(options.get("partitions", 4))

    def partitions(self):  # noqa: D102 - API hook
        # even splits honoring the requested count exactly (a fixed step
        # plans a stray tail partition whenever n_docs % n_parts != 0)
        parts = min(max(1, self.n_parts), max(1, self.n_docs))
        bounds = [(i * self.n_docs) // parts for i in range(parts + 1)]
        return [_Range(a, b) for a, b in zip(bounds, bounds[1:])]

    def read(self, partition: _Range):  # noqa: D102 - API hook
        for doc_id in range(partition.start, partition.end):
            text = _doc_text(doc_id)
            yield doc_id, text, len(text.split(" "))


class SynthDocsStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch streaming face of the same generator: the offset is the
    next doc_id (a dict checkpointed by the engine), each trigger emits up
    to ``rows_per_batch`` docs. This is the replayable-log contract the
    reference got from Kafka (offset = position, deterministic re-read
    between offsets on recovery) expressed in ~20 lines of source API —
    ``readBetweenOffsets`` re-generates exactly the same rows, so
    checkpoint recovery is exact."""

    def __init__(self, options: dict) -> None:
        self.rows_per_batch = int(options.get("rows_per_batch", 10))
        self.max_docs = int(options.get("n_docs", 100))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict):
        lo = start["next"]
        hi = min(lo + self.rows_per_batch, self.max_docs)
        return self._rows(lo, hi), {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(start["next"], end["next"])

    def commit(self, end: dict) -> None:
        pass

    @staticmethod
    def _rows(lo: int, hi: int):
        # a LIST, not a generator: the engine pickles the prefetched rows
        # to ship them with the offset (SimpleDataSourceStreamReader runs
        # on the driver; per-partition parallel reads are the full
        # DataSourceStreamReader's job)
        rows = []
        for doc_id in range(lo, hi):
            text = _doc_text(doc_id)
            rows.append((doc_id, text, len(text.split(" "))))
        return rows


class SynthDocsDataSource(DataSource):
    """``spark.read.format("synthdocs").option("n_docs", ...)`` source —
    batch and streaming faces over one generator."""

    @classmethod
    def name(cls) -> str:
        return "synthdocs"

    def schema(self) -> str:
        return "doc_id bigint, text string, n_tokens int"

    def reader(self, schema) -> SynthDocsReader:
        return SynthDocsReader(self.options)

    def simpleStreamReader(self, schema) -> SynthDocsStreamReader:
        return SynthDocsStreamReader(self.options)


def register_synthdocs(spark) -> None:
    """Register the source on this session (idempotent)."""
    spark.dataSource.register(SynthDocsDataSource)
