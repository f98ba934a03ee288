"""Custom Python DataSource (Spark 4 DataSource API): a deterministic
synthetic-corpus generator.

Large-scale pipelines treat GENERATORS as first-class sources (TPC
dbgen, fuzz corpora, load harnesses): the data is defined by a seed +
a row index, so the "table" needs no storage at all and scales to any
size by adding input partitions. This module implements that shape
through ``pyspark.sql.datasource.DataSource`` — the V2 Python reader
API — with real partition planning: ``partitions()`` splits the id
range into ``partitions`` independent slices, each ``read()`` generates
only its slice, so a 1000-executor cluster generates in parallel with
zero coordination and no skew (ranges are equal-width).

Every generated value is a pure md5 function of the row index, which
keeps the source ORACLE-CHECKABLE: DuckDB rebuilds the identical table
from generate_series + md5 (the same portability trick the MinHash /
KMV sketches use), so the driver's hash gate certifies the custom
data-source machinery end to end.

Reference analog: the reference synthesizes fixture inputs in its test
harness (SURVEY.md §5); here synthesis is a registered, partitioned
source any query can read.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

LANGS: Sequence[str] = ("en", "de", "es", "fr", "zh")


def _md5_int28(s: str) -> int:
    """First 7 hex digits of md5 as an int — matches DuckDB's
    ('0x' || substr(md5(s), 1, 7))::BIGINT byte for byte."""
    return int(hashlib.md5(s.encode()).hexdigest()[:7], 16)


def gen_row(i: int) -> tuple[int, str, int]:
    """The pure row function: (doc_id, lang, value) from the index."""
    return (
        i,
        LANGS[_md5_int28(f"{i}L") % len(LANGS)],
        _md5_int28(str(i)),
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n = int(options.get("n", "1000"))
        self.n_parts = max(1, int(options.get("partitions", "8")))

    def partitions(self) -> list[_RangePartition]:
        step = -(-self.n // self.n_parts)  # ceil-div: equal-width ranges
        return [
            _RangePartition(s, min(s + step, self.n))
            for s in range(0, self.n, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield gen_row(i)


class SyntheticDocsStreamReader(SimpleDataSourceStreamReader):
    """Bounded synthetic STREAM: each micro-batch emits the next
    ``rate`` rows of the same pure row function, tracked by a row-index
    offset — so streaming ingest and the batch source produce the SAME
    table once the stream drains (the batch/stream parity contract the
    windows/stateful family tests). Offsets are plain dicts
    ({"index": i}); replaying any [start, end) slice regenerates
    identical rows (readBetweenOffsets), which is exactly the
    exactly-once recovery contract Structured Streaming requires of a
    source after a checkpoint restore."""

    def __init__(self, options: dict) -> None:
        self.n = int(options.get("n", "1000"))
        self.rate = max(1, int(options.get("rate", "100")))

    def initialOffset(self) -> dict:
        return {"index": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        lo = int(start["index"])
        hi = min(lo + self.rate, self.n)
        return iter([gen_row(i) for i in range(lo, hi)]), {"index": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return iter(
            [gen_row(i) for i in range(int(start["index"]), int(end["index"]))]
        )


class SyntheticDocsDataSource(DataSource):
    """spark.read.format("synthetic_docs").option("n", N) — rows are a
    pure function of the row index; `partitions` controls parallelism
    without changing content. Also readable as a stream
    (spark.readStream.format("synthetic_docs")): micro-batches of
    `rate` rows until `n` is reached."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id bigint, lang string, value bigint"

    def reader(self, schema) -> SyntheticDocsReader:
        return SyntheticDocsReader(self.options)

    def simpleStreamReader(self, schema) -> SyntheticDocsStreamReader:
        return SyntheticDocsStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration (re-registering the same name is fine —
    latest wins in the session's data-source registry).

    The data-source instance is created in a SEPARATE Python process
    (not the driver), which may not have this package on sys.path —
    e.g. a vanilla session whose driver added the repo to sys.path at
    runtime. Registering the module for by-value pickling makes the
    class ride inside the pickle instead of being looked up by module
    name on the other side."""
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(SyntheticDocsDataSource)
