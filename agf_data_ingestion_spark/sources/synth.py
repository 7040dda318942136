"""Custom Python Data Source (Spark 4 ``pyspark.sql.datasource`` API): a
deterministic synthetic events generator for scale testing.

``spark.read.format("agf_synth").option("rows", N).load()`` produces the
events-table shape (event_id, ts_us, user_id, event_type, value) with NO
input files: each of ``numPartitions`` partitions generates its own id
range executor-side, so a 10⁹-row test frame costs zero I/O and scales
with the cluster, and every value is an md5-derived function of
(seed, event_id) — the same determinism discipline as the query catalog
(identical rows on every run, every partitioning, every engine that
reimplements the formula).

This is the idiomatic replacement for ``spark.range(...).select(...)``
test-data pipelines: the generator body runs per-partition as Arrow
batches (not a driver loop), and the source reports its partitioning to
Spark like any file source would.  Public API reference:
https://spark.apache.org/docs/latest/api/python/tutorial/sql/python_data_source.html
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_EVENT_TYPES = ("click", "view", "purchase", "signup", "error")
_BASE_TS_US = 1_704_067_200_000_000  # 2024-01-01 UTC


def _h(seed: int, event_id: int, field: str) -> int:
    digest = hashlib.md5(f"{seed}:{event_id}:{field}".encode()).hexdigest()
    return int(digest[:15], 16)  # 60-bit


class _SynthPartition(InputPartition):
    def __init__(self, start: int, end: int, seed: int):
        self.start, self.end, self.seed = start, end, seed


class SynthEventsReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 10_000))
        self.parts = int(options.get("numPartitions", 8))
        self.seed = int(options.get("seed", 42))
        self.users = int(options.get("users", max(1, self.rows // 20)))

    def partitions(self):
        step = (self.rows + self.parts - 1) // self.parts
        return [
            _SynthPartition(lo, min(lo + step, self.rows), self.seed)
            for lo in range(0, self.rows, step)
        ]

    def read(self, partition: _SynthPartition):
        seed = partition.seed
        for i in range(partition.start, partition.end):
            yield (
                i,
                _BASE_TS_US + _h(seed, i, "ts") % (14 * 86_400_000_000),
                _h(seed, i, "user") % self.users,
                _EVENT_TYPES[_h(seed, i, "type") % len(_EVENT_TYPES)],
                (_h(seed, i, "value") % 10_000_000) / 1000.0,
            )


class SynthEventsStreamReader(SimpleDataSourceStreamReader):
    """Unbounded variant: each micro-batch emits the next ``batchSize`` ids.

    Offsets are plain dicts ``{"id": next_id}`` — exactly-once replay comes
    free because row content is a pure function of the id: re-reading any
    offset range (``readBetweenOffsets``, used on recovery) regenerates
    bit-identical rows, which is the replayable-source contract Structured
    Streaming's checkpointing needs (no buffering, no external cursor)."""

    def __init__(self, options):
        self.batch = int(options.get("batchSize", 100))
        self.seed = int(options.get("seed", 42))
        self.users = int(options.get("users", 100))

    def initialOffset(self) -> dict:
        return {"id": 0}

    def _rows(self, start: int, end: int):
        # a LIST, not a generator: the runtime pickles the prefetched rows
        # into the micro-batch plan, and generators cannot pickle
        return [
            (
                i,
                _BASE_TS_US + _h(self.seed, i, "ts") % (14 * 86_400_000_000),
                _h(self.seed, i, "user") % self.users,
                _EVENT_TYPES[_h(self.seed, i, "type") % len(_EVENT_TYPES)],
                (_h(self.seed, i, "value") % 10_000_000) / 1000.0,
            )
            for i in range(start, end)
        ]

    def read(self, start: dict):
        end = {"id": start["id"] + self.batch}
        return self._rows(start["id"], end["id"]), end

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(start["id"], end["id"])


class SynthEventsSource(DataSource):
    """Register with ``spark.dataSource.register(SynthEventsSource)``; then
    ``spark.read.format("agf_synth")`` (batch) or
    ``spark.readStream.format("agf_synth")`` (unbounded micro-batches)."""

    @classmethod
    def name(cls):
        return "agf_synth"

    def schema(self):
        return (
            "event_id bigint, ts_us bigint, user_id bigint,"
            " event_type string, value double"
        )

    def reader(self, schema):
        return SynthEventsReader(self.options)

    def simpleStreamReader(self, schema):
        return SynthEventsStreamReader(self.options)
