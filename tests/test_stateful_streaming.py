"""applyInPandasWithState monitor: state persists across micro-batches and
across availableNow restarts; final state equals the batch twin."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from agf_data_ingestion_spark.streaming.stateful import monitor_batch, monitor_stream

SCHEMA = StructType(
    [
        StructField("instrument_id", StringType()),
        StructField("total_bytes", LongType()),
        StructField("sync_timestamp", StringType()),
    ]
)


def _write(dirpath, name, rows):
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, name), "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


def _round(spark, src, chk, out_dir):
    stream = (
        spark.readStream.schema(SCHEMA)
        .json(src)
        .select(
            "instrument_id",
            "total_bytes",
            F.col("sync_timestamp").cast("timestamp").alias("sync_timestamp"),
        )
    )

    def sink(batch, batch_id):
        if batch.count():
            batch.write.mode("append").parquet(out_dir)

    q = (
        monitor_stream(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.read.parquet(out_dir)


def test_state_accumulates_across_restarts(spark, tmp_path):
    src = str(tmp_path / "src")
    chk = str(tmp_path / "chk")
    out = str(tmp_path / "out")

    _write(src, "a.json", [
        {"instrument_id": "i1", "total_bytes": 100, "sync_timestamp": "2024-03-01 10:00:00"},
        {"instrument_id": "i1", "total_bytes": 300, "sync_timestamp": "2024-03-01 11:00:00"},
        {"instrument_id": "i2", "total_bytes": 50, "sync_timestamp": "2024-03-01 09:00:00"},
    ])
    _round(spark, src, chk, out)

    # second round: new file, new query instance — state must carry over
    _write(src, "b.json", [
        {"instrument_id": "i1", "total_bytes": 600, "sync_timestamp": "2024-03-02 10:00:00"},
    ])
    res = _round(spark, src, chk, out)

    # latest emission per instrument = final running totals
    latest = {
        r["instrument_id"]: r
        for r in res.orderBy("runs_seen").collect()  # later rows overwrite
    }
    assert latest["i1"]["runs_seen"] == 3
    assert latest["i1"]["bytes_seen"] == 1000
    assert latest["i2"]["runs_seen"] == 1

    # batch twin over the full input agrees with the final streaming state
    batch = spark.read.schema(SCHEMA).json(src).select(
        "instrument_id",
        "total_bytes",
        F.col("sync_timestamp").cast("timestamp").alias("sync_timestamp"),
    )
    btw = {r["instrument_id"]: r for r in monitor_batch(batch).collect()}
    assert btw["i1"]["runs_seen"] == 3 and btw["i1"]["bytes_seen"] == 1000
    assert btw["i1"]["max_sync_epoch"] == latest["i1"]["max_sync_epoch"]


def test_anomaly_flagging(spark, tmp_path):
    src = str(tmp_path / "src2")
    chk = str(tmp_path / "chk2")
    out = str(tmp_path / "out2")
    _write(src, "a.json", [
        {"instrument_id": "i1", "total_bytes": 10, "sync_timestamp": "2024-03-01 10:00:00"},
        {"instrument_id": "i1", "total_bytes": 10, "sync_timestamp": "2024-03-01 10:05:00"},
    ])
    _round(spark, src, chk, out)
    _write(src, "b.json", [
        {"instrument_id": "i1", "total_bytes": 100_000, "sync_timestamp": "2024-03-01 12:00:00"},
    ])
    res = _round(spark, src, chk, out)
    flagged = [r for r in res.collect() if r["anomaly"] is not None]
    assert flagged and "exceeds" in flagged[0]["anomaly"]
