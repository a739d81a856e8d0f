"""Python Data Source API (Spark 4): a custom connector with no JVM code.

The S-family's extension point for systems Spark has no built-in reader
for (internal services, bespoke file formats, synthetic feeds): subclass
``pyspark.sql.datasource.DataSource``, emit ``InputPartition``s, and each
executor pulls only its slice — the same partition-parallel scan contract
as a native connector (sources/jdbc.py's numPartitions range split), with
Python in the read path (Arrow-batched by the engine).

The demo source generates deterministic synthetic events: every value is
md5-derived from (seed, row id) — the datagen.py discipline — so the
output is identical for any partition count, which the test asserts.
At scale the same shape backs a real external system: ``partitions()``
returns shard/offset descriptors, ``read()`` pulls one shard.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


def _h60(seed: str, row: int, field: str) -> int:
    digest = hashlib.md5(f"{seed}|{row}|{field}".encode()).hexdigest()
    return int(digest[:15], 16)


class EventSynthDataSource(DataSource):
    """``spark.read.format("eventsynth").option("rows", N)`` source.

    Options: rows (total, default 1000), partitions (default 4),
    seed (default "es").
    """

    @classmethod
    def name(cls) -> str:
        return "eventsynth"

    def schema(self) -> str:
        return "event_id bigint, user_id bigint, value double"

    def reader(self, schema) -> "EventSynthReader":  # noqa: ANN001
        return EventSynthReader(self.options)


class _Slice(InputPartition):
    def __init__(self, start: int, end: int, seed: str):
        self.start, self.end, self.seed = start, end, seed


class EventSynthReader(DataSourceReader):
    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 4))
        self.seed = options.get("seed", "es")

    def partitions(self) -> list[_Slice]:
        step = -(-self.rows // self.n_parts)  # ceil-div
        return [_Slice(lo, min(lo + step, self.rows), self.seed)
                for lo in range(0, self.rows, step)]

    def read(self, part: _Slice) -> Iterator[tuple]:
        for i in range(part.start, part.end):
            yield (i,
                   _h60(part.seed, i, "u") % 1000,
                   (_h60(part.seed, i, "v") % 1_000_000) / 1000.0)


def register_python_sources(spark) -> None:
    spark.dataSource.register(EventSynthDataSource)
