"""Per-group KMV distinct-count sketch as a Spark 4 ``transformWithState``
stateful processor — the arbitrary-state streaming API successor to
``applyInPandasWithState`` (SPARK-40434 → SPARK-46815 transformWithState).

Contrast with streaming/sketches.py ``kmv_sink``: the foreachBatch sink
keeps the sketch in an external parquet table it rewrites per batch; this
operator keeps it INSIDE the engine's state store (RocksDB-backed,
checkpointed, exactly-once with the query), in a typed ``ListState`` of ≤ k
hash values per group.  The state store handles recovery/replay — no
idempotency bookkeeping in user code, and state is partitioned with the
groups, so a 1000-executor cluster holds each group's 64-long list exactly
where that group's rows shuffle to (no driver collect, no global rewrite —
the piece the parquet-sink variant gives up at high group cardinality).

The hash column is computed JVM-side BEFORE grouping (same md5→60-bit
derivation as the batch twin in plans/sketches.py), so the Python processor
only merges sorted long lists — the estimate is bit-identical to the batch
KMV estimate over the same rows (test-pinned equivalence).

Runtime requirements: the RocksDB state store provider (see
:data:`ROCKSDB_PROVIDER`) and the ``protobuf`` Python package (the
transformWithState state-server protocol is protobuf-encoded; pyspark
declares it under ``pip install pyspark[connect]``).  On hosts without
protobuf the query fails at startup — the merge logic and hash derivation
are still unit-tested there (tests/test_tws_kmv.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

# constants IMPORTED from the batch sketch module: the claim 'identical
# derivation to the batch twin' must hold by construction, not by a copy
# that can silently diverge when the batch parameters change
from agf_data_ingestion_spark.streaming.sketches import (  # noqa: E402
    _HASH_HEX,
    _HASH_SPACE,
    _K,
)

#: transformWithState requires the RocksDB state store provider (the HDFS
#: default does not support the new state API); set on the session before
#: starting a query with this operator.
ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

OUTPUT_SCHEMA = "grp string, n_kept int, est double"


def hashed(df: DataFrame, *, group_col: str, key_col: str) -> DataFrame:
    """(grp, h): the 60-bit md5 hash of ``key_col`` — identical derivation
    to the batch sketch (plans/sketches.py), computed JVM-side."""
    h = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, _HASH_HEX), 16, 10
    ).cast("long")
    return df.select(F.col(group_col).cast("string").alias("grp"), h.alias("h")).filter(
        F.col("h").isNotNull()
    )


class KMVProcessor(StatefulProcessor):
    """Maintains the bottom-``k`` distinct hash set per group in ListState;
    emits (grp, n_kept, est) after every batch (Update mode)."""

    def __init__(self, k: int = _K) -> None:
        self._k = k

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._kmin = handle.getListState("kmin", "h BIGINT")

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        incoming: set[int] = set()
        for pdf in rows:
            incoming.update(int(v) for v in pdf["h"])
        stored = [int(t[0]) for t in self._kmin.get()]
        merged = sorted(set(stored) | incoming)[: self._k]
        if merged != stored:
            self._kmin.put([(h,) for h in merged])
        n_kept = len(merged)
        if n_kept < self._k:
            est = float(n_kept)
        else:
            # same IEEE ops as the batch estimator — bit-identical
            est = float(self._k - 1) * _HASH_SPACE / float(merged[-1])
        yield pd.DataFrame({"grp": [key[0]], "n_kept": [n_kept], "est": [est]})

    def close(self) -> None:
        pass


def kmv_distinct_stream(
    events: DataFrame, *, group_col: str, key_col: str, k: int = _K
) -> DataFrame:
    """Streaming per-group distinct-count estimates via transformWithState.
    Works on a streaming DataFrame (state store) — the batch twin over the
    same input is ``kmv_estimates(kmv_sketch(...))``."""
    return (
        hashed(events, group_col=group_col, key_col=key_col)
        .groupBy("grp")
        .transformWithStateInPandas(
            KMVProcessor(k),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
