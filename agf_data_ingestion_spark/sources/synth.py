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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

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


class SynthEventsSource(DataSource):
    """Register with ``spark.dataSource.register(SynthEventsSource)``."""

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
