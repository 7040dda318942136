"""Custom stateful streaming operator via ``applyInPandasWithState``:
a per-instrument ingest monitor that maintains running totals across
micro-batches and emits anomaly flags.

This is the §2.9 custom-operator escape hatch (c) for semantics neither
windowed aggregation nor dropDuplicates expresses: state is arbitrary
Python (here: running count/bytes + a high-water timestamp), updated one
Arrow batch at a time per key, with GroupStateTimeout-based eviction so
state stays bounded (the same discipline as watermarks).

Batch parity: ``monitor_batch`` computes the identical result over a bounded
DataFrame with a plain aggregation — the unified-model contract the rest of
the engine follows (tests assert stream-vs-batch equality).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MONITOR_SCHEMA = StructType(
    [
        StructField("instrument_id", StringType(), False),
        StructField("runs_seen", LongType(), True),
        StructField("bytes_seen", LongType(), True),
        StructField("max_sync_epoch", LongType(), True),
        StructField("mean_bytes_per_run", DoubleType(), True),
        StructField("anomaly", StringType(), True),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("runs", LongType(), True),
        StructField("bytes", LongType(), True),
        StructField("max_epoch", LongType(), True),
    ]
)

#: a run 50x the instrument's running mean is flagged
ANOMALY_FACTOR = 50.0

#: state-eviction horizon when a timeout-enabled mode is configured
_TIMEOUT_MS = 8 * 24 * 3600 * 1000


def _update(
    key: tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        # eviction path: the instrument was silent past the horizon — drop
        # its state and emit nothing.  Re-arming the timeout here instead
        # would keep dead keys forever AND emit a phantom monitor row per
        # horizon per dead instrument.
        state.remove()
        return
    runs, total, max_epoch = state.get if state.exists else (0, 0, 0)
    anomaly = None
    for pdf in pdfs:
        for _, row in pdf.iterrows():
            b = int(row["total_bytes"]) if pd.notna(row["total_bytes"]) else 0
            if runs > 0 and b > ANOMALY_FACTOR * (total / runs):
                anomaly = f"run_bytes_{b}_exceeds_{ANOMALY_FACTOR}x_mean"
            runs += 1
            total += b
            ep = int(row["sync_epoch"]) if pd.notna(row["sync_epoch"]) else 0
            max_epoch = max(max_epoch, ep)
    state.update((runs, total, max_epoch))
    # evict instruments silent for the timeout horizon (bounded state);
    # no-op when the query runs with NoTimeout (bounded replays)
    try:
        state.setTimeoutDuration(_TIMEOUT_MS)
    except Exception:
        pass
    yield pd.DataFrame(
        [
            {
                "instrument_id": key[0],
                "runs_seen": runs,
                "bytes_seen": total,
                "max_sync_epoch": max_epoch,
                "mean_bytes_per_run": total / runs if runs else 0.0,
                "anomaly": anomaly,
            }
        ]
    )


def monitor_stream(
    sync_runs_stream: DataFrame, *, timeout: str = GroupStateTimeout.NoTimeout
) -> DataFrame:
    """Streaming per-instrument monitor.  Input: a (possibly streaming)
    DataFrame with instrument_id, total_bytes, sync_timestamp.

    ``timeout``: pass ``GroupStateTimeout.ProcessingTimeTimeout`` in a
    continuously-running deployment to evict instruments silent past the
    8-day horizon.  The default is NoTimeout because a pending timeout
    keeps ``availableNow`` runs scheduling empty batches indefinitely
    (bounded replays — backfills, tests — must terminate)."""
    prepared = sync_runs_stream.select(
        "instrument_id",
        "total_bytes",
        F.unix_timestamp("sync_timestamp").alias("sync_epoch"),
    )
    return prepared.groupBy("instrument_id").applyInPandasWithState(
        _update,
        outputStructType=MONITOR_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )


def monitor_batch(sync_runs: DataFrame) -> DataFrame:
    """Bounded-input twin of :func:`monitor_stream` (final state per key)."""
    return (
        sync_runs.select(
            "instrument_id",
            "total_bytes",
            F.unix_timestamp("sync_timestamp").alias("sync_epoch"),
        )
        .groupBy("instrument_id")
        .agg(
            F.count("*").alias("runs_seen"),
            F.sum(F.coalesce("total_bytes", F.lit(0))).alias("bytes_seen"),
            F.max(F.coalesce("sync_epoch", F.lit(0))).alias("max_sync_epoch"),
        )
        .withColumn(
            "mean_bytes_per_run", F.col("bytes_seen") / F.col("runs_seen")
        )
    )
