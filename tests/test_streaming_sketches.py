"""Streaming KMV sketch sink: merge property + micro-batch ≡ batch twin.

The load-bearing claim (streaming/sketches.py): merging per-micro-batch
sketches produces EXACTLY the sketch a single batch pass over all the data
would build — so a stream can serve distinct-count estimates forever with
O(k × groups) state and no replay.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from agf_data_ingestion_spark.streaming.sketches import (
    kmv_estimates,
    kmv_sink,
    kmv_sketch,
    merge_kmv,
)

SCHEMA = StructType(
    [StructField("event_type", StringType()), StructField("user_id", StringType())]
)


def _rows(lo: int, hi: int) -> list[dict]:
    return [
        {"event_type": t, "user_id": str(u)}
        for u in range(lo, hi)
        for t in (["click"] if u % 2 else ["click", "view"])
    ]


def _write(dirpath: str, name: str, rows: list[dict]) -> None:
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, name), "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


def test_split_sketches_merge_to_global_sketch(spark):
    df = spark.createDataFrame(_rows(0, 900), SCHEMA)
    parts = [df.filter(F.col("user_id").cast("long") % 3 == i) for i in range(3)]
    merged = kmv_sketch(parts[0], group_col="event_type", key_col="user_id")
    for p in parts[1:]:
        merged = merge_kmv(merged, kmv_sketch(p, group_col="event_type", key_col="user_id"))
    direct = kmv_sketch(df, group_col="event_type", key_col="user_id")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


def test_streaming_sink_equals_batch_sketch(spark, tmp_path):
    src = str(tmp_path / "src")
    chk = str(tmp_path / "chk")
    table = str(tmp_path / "sketch")
    # three files → three micro-batches (maxFilesPerTrigger=1)
    _write(src, "a.json", _rows(0, 300))
    _write(src, "b.json", _rows(300, 600))
    _write(src, "c.json", _rows(600, 900))

    stream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(src)
    q = (
        stream.writeStream.foreachBatch(
            kmv_sink(spark, table, group_col="event_type", key_col="user_id")
        )
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    batch_df = spark.read.schema(SCHEMA).json(src)
    direct = kmv_sketch(batch_df, group_col="event_type", key_col="user_id")
    from agf_data_ingestion_spark.streaming.sketches import kmv_read

    stored = kmv_read(spark, table)
    assert sorted(map(tuple, stored.collect())) == sorted(map(tuple, direct.collect()))

    # estimates from the streamed sketch are within the KMV error bound
    exact = {
        r.event_type: r.n
        for r in batch_df.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    for r in kmv_estimates(stored).collect():
        assert abs(r.est - exact[r.grp]) / exact[r.grp] < 0.5, (r, exact[r.grp])
