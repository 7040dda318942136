"""Streaming SCD2 maintenance (streaming/scd2.py): incremental batches —
including out-of-order and re-delivered events — must yield the exact
dimension a full batch recompute produces (the run-collapse-is-lossy trap
the raw change log exists to avoid)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from agf_data_ingestion_spark.operators.scd2 import scd2_intervals
from agf_data_ingestion_spark.streaming.scd2 import as_of, read_dimension, scd2_batch_fn

SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts_us", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
    ]
)


def _write(dirpath, name, rows):
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, name), "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


def _run_round(spark, src, chk, warehouse):
    stream = spark.readStream.schema(SCHEMA).json(src)
    q = (
        stream.writeStream.foreachBatch(scd2_batch_fn(warehouse))
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _dim_rows(spark, warehouse):
    df = read_dimension(spark, warehouse).toPandas()
    return sorted(
        (int(r.user_id), r.event_type, int(r.valid_from),
         None if r.valid_to != r.valid_to or r.valid_to is None else int(r.valid_to),
         int(r.version), bool(r.is_current))
        for r in df.itertuples()
    )


def test_incremental_equals_batch_with_out_of_order(spark, tmp_path):
    src = str(tmp_path / "src")
    chk = str(tmp_path / "chk")
    wh = str(tmp_path / "wh")

    # batch 1: user 1 goes A -> B; user 2 stays A
    _write(src, "b1.json", [
        {"event_id": 1, "ts_us": 100, "user_id": 1, "event_type": "A"},
        {"event_id": 3, "ts_us": 300, "user_id": 1, "event_type": "B"},
        {"event_id": 4, "ts_us": 100, "user_id": 2, "event_type": "A"},
    ])
    _run_round(spark, src, chk, wh)

    # batch 2: an OUT-OF-ORDER event lands between user 1's change points
    # with the SAME value as a later run — the case incremental run-collapse
    # gets wrong (A@100, B@300 + late B@200 => A,[B@200 merged],B stays one
    # run starting at 200, NOT a resurrected third version)
    _write(src, "b2.json", [
        {"event_id": 2, "ts_us": 200, "user_id": 1, "event_type": "B"},
        {"event_id": 5, "ts_us": 400, "user_id": 3, "event_type": "C"},
    ])
    _run_round(spark, src, chk, wh)

    # the full-batch truth over every event seen
    full = spark.createDataFrame(
        [(1, 100, 1, "A"), (3, 300, 1, "B"), (4, 100, 2, "A"),
         (2, 200, 1, "B"), (5, 400, 3, "C")],
        "event_id long, ts_us long, user_id long, event_type string",
    )
    expect = scd2_intervals(full).toPandas()
    expect_rows = sorted(
        (int(r.user_id), r.event_type, int(r.valid_from),
         None if r.valid_to != r.valid_to or r.valid_to is None else int(r.valid_to),
         int(r.version), bool(r.is_current))
        for r in expect.itertuples()
    )
    assert _dim_rows(spark, wh) == expect_rows
    # the tricky user: exactly 2 versions, B starting at the LATE event's ts
    u1 = [r for r in _dim_rows(spark, wh) if r[0] == 1]
    assert [(r[1], r[2]) for r in u1] == [("A", 100), ("B", 200)]


def test_redelivery_is_idempotent_and_as_of_reads(spark, tmp_path):
    src = str(tmp_path / "src")
    wh = str(tmp_path / "wh")

    _write(src, "b1.json", [
        {"event_id": 1, "ts_us": 100, "user_id": 7, "event_type": "A"},
        {"event_id": 2, "ts_us": 200, "user_id": 7, "event_type": "B"},
    ])
    # two checkpoints replaying the SAME files = re-delivered micro-batch
    _run_round(spark, src, str(tmp_path / "chk1"), wh)
    before = _dim_rows(spark, wh)
    _run_round(spark, src, str(tmp_path / "chk2"), wh)
    assert _dim_rows(spark, wh) == before

    dim = read_dimension(spark, wh)
    assert [r["event_type"] for r in as_of(dim, 150).collect()] == ["A"]
    assert [r["event_type"] for r in as_of(dim, 250).collect()] == ["B"]
    assert as_of(dim, 50).count() == 0


def test_read_dimension_empty_safe_for_fresh_warehouse(spark, tmp_path):
    # no batch has ever run: must return an empty, schema-correct frame,
    # not raise PATH_NOT_FOUND
    dim = read_dimension(spark, str(tmp_path / "never_written"))
    assert dim.count() == 0
    assert set(dim.columns) == {
        "user_id", "event_type", "valid_from", "valid_to", "version", "is_current"
    }
    assert as_of(dim, 123).count() == 0
