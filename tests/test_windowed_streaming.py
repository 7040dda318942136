"""Watermark semantics tests: late-data dropping, bounded-state dedup, and
observe() metrics (OP-STRM-LATE / OP-STRM-STATE / OP-SINK-METRICS)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from agf_data_ingestion_spark.streaming.windowed import (
    dedup_within_watermark,
    observed,
    windowed_counts,
)

SCHEMA = StructType(
    [StructField("ts", StringType()), StructField("event_type", StringType()),
     StructField("k", StringType())]
)


def _write(dirpath, name, rows):
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, name), "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


def _run_stream(spark, src, chk, out_fn, mode="append"):
    """availableNow round writing finalized rows to parquet via foreachBatch
    (memory sink cannot resume from a checkpoint; parquet-through-
    foreachBatch is also the production shape)."""
    out_dir = chk + "_out"

    stream = (
        spark.readStream.schema(SCHEMA).json(src)
        .select(F.col("ts").cast("timestamp").alias("ts"), "event_type", "k")
    )

    def sink(batch, batch_id):
        if batch.count():
            batch.write.mode("append").parquet(out_dir)

    q = (
        out_fn(stream)
        .writeStream.foreachBatch(sink)
        .outputMode(mode)
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    try:
        return spark.read.parquet(out_dir)
    except Exception:
        return spark.createDataFrame([], "window_start timestamp")


def test_windowed_counts_batch_and_late_drop(spark, tmp_path):
    src, chk = str(tmp_path / "src"), str(tmp_path / "chk_win")
    # round 1: two events in the 10:00 window
    _write(src, "a.json", [
        {"ts": "2024-01-01 10:01:00", "event_type": "click", "k": "a"},
        {"ts": "2024-01-01 10:04:00", "event_type": "click", "k": "b"},
    ])
    out1 = _run_stream(
        spark, src, chk,
        lambda s: windowed_counts(s, window="10 minutes", watermark="10 minutes"),
    )
    # nothing finalized yet (watermark has not passed the window end)
    assert out1.count() == 0

    # round 2: an event far in the future advances the watermark past the
    # 10:00 window -> it finalizes with BOTH round-1 rows
    _write(src, "b.json", [
        {"ts": "2024-01-01 12:00:00", "event_type": "click", "k": "c"},
    ])
    out2 = _run_stream(
        spark, src, chk,
        lambda s: windowed_counts(s, window="10 minutes", watermark="10 minutes"),
    )
    rows = {str(r["window_start"]): r["n_events"] for r in out2.collect()}
    assert rows.get("2024-01-01 10:00:00") == 2

    # round 3: a straggler far behind the watermark arrives -> dropped; the
    # already-emitted window is not re-emitted or double-counted
    _write(src, "c.json", [
        {"ts": "2024-01-01 10:02:00", "event_type": "click", "k": "late"},
    ])
    out3 = _run_stream(
        spark, src, chk,
        lambda s: windowed_counts(s, window="10 minutes", watermark="10 minutes"),
    )
    rows3 = [
        r for r in out3.collect() if str(r["window_start"]) == "2024-01-01 10:00:00"
    ]
    assert len(rows3) == 1 and rows3[0]["n_events"] == 2  # late row NOT added

    # unified model: the same function over a batch DataFrame
    batch = spark.read.schema(SCHEMA).json(src).select(
        F.col("ts").cast("timestamp").alias("ts"), "event_type", "k"
    )
    brows = {
        str(r["window_start"]): r["n_events"]
        for r in windowed_counts(batch, window="10 minutes").collect()
    }
    # batch sees everything, including what streaming classified as late
    assert brows["2024-01-01 10:00:00"] == 3


def test_dedup_within_watermark(spark, tmp_path):
    src, chk = str(tmp_path / "src2"), str(tmp_path / "chk_dd")
    _write(src, "a.json", [
        {"ts": "2024-01-01 10:00:00", "event_type": "x", "k": "dup"},
        {"ts": "2024-01-01 10:00:30", "event_type": "x", "k": "dup"},
        {"ts": "2024-01-01 10:01:00", "event_type": "x", "k": "uniq"},
    ])
    out = _run_stream(
        spark, src, chk,
        lambda s: dedup_within_watermark(s, keys=["k"], watermark="1 hour"),
    )
    ks = [r["k"] for r in out.collect()]
    assert sorted(ks) == ["dup", "uniq"]


def test_interval_join_stream_matches_batch(spark, tmp_path):
    """Stream-stream interval join (view→click within 15 min per key):
    matches emit from the availableNow run, and the identical function on
    batch inputs returns the same pairs (unified model)."""
    from agf_data_ingestion_spark.streaming.windowed import interval_join

    vsrc, csrc = str(tmp_path / "views"), str(tmp_path / "clicks")
    chk, out_dir = str(tmp_path / "chk_ij"), str(tmp_path / "out_ij")
    _write(vsrc, "v.json", [
        {"ts": "2024-01-01 10:00:00", "event_type": "view", "k": "u1"},
        {"ts": "2024-01-01 12:00:00", "event_type": "view", "k": "u2"},
    ])
    _write(csrc, "c.json", [
        {"ts": "2024-01-01 10:05:00", "event_type": "click", "k": "u1"},  # match
        {"ts": "2024-01-01 10:20:00", "event_type": "click", "k": "u1"},  # too late
        {"ts": "2024-01-01 12:10:00", "event_type": "click", "k": "u2"},  # match
        {"ts": "2024-01-01 12:05:00", "event_type": "click", "k": "u9"},  # wrong key
    ])

    def read(src):
        return (
            spark.readStream.schema(SCHEMA).json(src)
            .select(F.col("ts").cast("timestamp").alias("ts"), "k")
        )

    joined = interval_join(
        read(vsrc), read(csrc), key="k", max_delay="15 minutes", watermark="1 hour"
    ).select(
        F.col("l.k").alias("k"),
        F.col("l.ts").alias("view_ts"),
        F.col("r.ts").alias("click_ts"),
    )

    def sink(batch, batch_id):
        if batch.count():
            batch.write.mode("append").parquet(out_dir)

    q = (
        joined.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["k"], str(r["view_ts"]), str(r["click_ts"]))
        for r in spark.read.parquet(out_dir).collect()
    )
    expect = [
        ("u1", "2024-01-01 10:00:00", "2024-01-01 10:05:00"),
        ("u2", "2024-01-01 12:00:00", "2024-01-01 12:10:00"),
    ]
    assert got == expect

    # unified model: the same operator over batch inputs gives the same pairs
    def read_batch(src):
        return (
            spark.read.schema(SCHEMA).json(src)
            .select(F.col("ts").cast("timestamp").alias("ts"), "k")
        )

    batch = interval_join(
        read_batch(vsrc), read_batch(csrc), key="k", max_delay="15 minutes", watermark="1 hour"
    ).select(
        F.col("l.k").alias("k"),
        F.col("l.ts").alias("view_ts"),
        F.col("r.ts").alias("click_ts"),
    )
    assert sorted((r["k"], str(r["view_ts"]), str(r["click_ts"])) for r in batch.collect()) == expect


def test_observe_metrics(spark):
    df = spark.range(10).withColumn("_valid", F.col("id") % 3 != 0)
    out, obs = observed(df)
    out.count()
    m = obs.get
    assert m["processed"] == 10
    assert m["errors"] == 4  # ids 0,3,6,9


def test_session_window_stream_matches_batch(spark, tmp_path):
    """Streaming F.session_window twin (OP-STRM-LATE + OP-X-SESSION): late
    merge before finalization, exactly-once emit after, and batch
    equivalence through the same function (unified model)."""
    from agf_data_ingestion_spark.streaming.windowed import session_counts

    src, chk = str(tmp_path / "src_sw"), str(tmp_path / "chk_sw")
    fn = lambda s: session_counts(  # noqa: E731
        s, gap="10 minutes", watermark="10 minutes", group_cols=("k",)
    )
    # round 1: two overlapping events for k=a (one session), nothing emits
    # (watermark has not passed the session end)
    _write(src, "a.json", [
        {"ts": "2024-01-01 10:00:00", "event_type": "x", "k": "a"},
        {"ts": "2024-01-01 10:05:00", "event_type": "x", "k": "a"},
    ])
    assert _run_stream(spark, src, chk, fn).count() == 0

    # round 2: a MERGING event extends the still-open session; a far-future
    # event advances the watermark past its end -> one merged session emits
    _write(src, "b.json", [
        {"ts": "2024-01-01 10:12:00", "event_type": "x", "k": "a"},
        {"ts": "2024-01-01 13:00:00", "event_type": "x", "k": "z"},
    ])
    out2 = _run_stream(spark, src, chk, fn)
    rows = {
        (r["k"], str(r["session_start"])): (str(r["session_end"]), r["n_events"])
        for r in out2.collect()
    }
    assert rows[("a", "2024-01-01 10:00:00")] == ("2024-01-01 10:22:00", 3)

    # round 3: a straggler behind the watermark is dropped — the emitted
    # session is not re-emitted or extended
    _write(src, "c.json", [
        {"ts": "2024-01-01 10:06:00", "event_type": "x", "k": "a"},
    ])
    out3 = _run_stream(spark, src, chk, fn)
    a_rows = [r for r in out3.collect() if r["k"] == "a"]
    assert len(a_rows) == 1 and a_rows[0]["n_events"] == 3

    # unified model: the same function over the batch read sees everything,
    # with the strict-boundary merge semantics of the catalog oracle
    batch = spark.read.schema(SCHEMA).json(src).select(
        F.col("ts").cast("timestamp").alias("ts"), "k"
    )
    brows = {
        (r["k"], str(r["session_start"])): r["n_events"]
        for r in fn(batch).collect()
    }
    assert brows[("a", "2024-01-01 10:00:00")] == 4  # straggler included
    assert brows[("z", "2024-01-01 13:00:00")] == 1


def test_interval_join_left_outer_emits_unmatched_after_watermark(spark, tmp_path):
    """Outer stream-stream join contract: an unmatched left event emits
    exactly once, with null right columns, and only AFTER the global
    watermark passes its join horizon (before that the engine cannot rule
    out a future match)."""
    from agf_data_ingestion_spark.streaming.windowed import interval_join

    vsrc, csrc = str(tmp_path / "views_o"), str(tmp_path / "clicks_o")
    chk, out_dir = str(tmp_path / "chk_oj"), str(tmp_path / "out_oj")
    _write(vsrc, "v1.json", [
        {"ts": "2024-01-01 10:00:00", "event_type": "view", "k": "u1"},
        {"ts": "2024-01-01 10:00:00", "event_type": "view", "k": "u3"},  # never clicks
    ])
    _write(csrc, "c1.json", [
        {"ts": "2024-01-01 10:05:00", "event_type": "click", "k": "u1"},
    ])

    def read(src):
        return (
            spark.readStream.schema(SCHEMA).json(src)
            .select(F.col("ts").cast("timestamp").alias("ts"), "k")
        )

    def run_round():
        joined = interval_join(
            read(vsrc), read(csrc), key="k",
            max_delay="15 minutes", watermark="10 minutes", how="left_outer",
        ).select(
            F.col("l.k").alias("k"),
            F.col("l.ts").alias("view_ts"),
            F.col("r.ts").alias("click_ts"),
        )

        def sink(batch, batch_id):
            if batch.count():
                batch.write.mode("append").parquet(out_dir)

        q = (
            joined.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_round()
    got1 = sorted(
        (r["k"], str(r["click_ts"]))
        for r in spark.read.parquet(out_dir).collect()
    )
    # inner match emits; the unmatched u3 must NOT have emitted yet
    assert got1 == [("u1", "2024-01-01 10:05:00")]

    # advance the watermark on BOTH inputs (global watermark = min) far
    # past u3's join horizon -> the definitive null row emits
    _write(vsrc, "v2.json", [
        {"ts": "2024-01-01 13:00:00", "event_type": "view", "k": "zz"},
    ])
    _write(csrc, "c2.json", [
        {"ts": "2024-01-01 13:00:00", "event_type": "click", "k": "zz"},
    ])
    run_round()
    got2 = sorted(
        (r["k"], str(r["click_ts"]))
        for r in spark.read.parquet(out_dir).collect()
    )
    assert ("u3", "None") in got2
    assert got2.count(("u3", "None")) == 1  # exactly once
    assert ("u1", "2024-01-01 10:05:00") in got2
