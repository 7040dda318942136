"""Streaming drift monitor (streaming/drift_stream.py): batch≡stream on
the cumulative histogram, exact-integer TVD parity with the batch
machinery, replay suppression, and alarm thresholding."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from agf_data_ingestion_spark.streaming.drift_stream import (
    _hist,
    build_reference_histogram,
    drift_batch_fn,
    drift_report,
    start_drift_stream,
)


def _events(spark, lo, hi, *, shift=0.0):
    """Synthetic events: value is an md5-derived double; ``shift`` moves
    the whole distribution (the upstream unit-change being detected)."""
    return spark.range(lo, hi).select(
        F.col("id").alias("event_id"),
        F.concat(F.lit("t"), (F.col("id") % 3).cast("string")).alias(
            "event_type"
        ),
        (
            F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 4), 16, 10)
            .cast("bigint")
            .cast("double")
            / 655.36
            + F.lit(shift)
        ).alias("value"),
    )


def test_stream_report_equals_batch_report(spark, tmp_path):
    """After availableNow drains every micro-batch, the LAST report rows
    must bit-equal the one-shot batch drift of the full stream window —
    additive folds + replay suppression give exactly-once counting."""
    ref_p = str(tmp_path / "ref")
    build_reference_histogram(_events(spark, 0, 3000), ref_p)
    src = str(tmp_path / "src")
    _events(spark, 3000, 6000, shift=2.5).repartition(4).write.parquet(src)
    stream = (
        spark.readStream.schema("event_id long, event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = start_drift_stream(
        stream,
        ref_p,
        str(tmp_path / "state"),
        str(tmp_path / "report"),
        str(tmp_path / "ck"),
        available_now=True,
    )
    q.awaitTermination()
    reports = spark.read.parquet(str(tmp_path / "report"))
    last_id = reports.agg(F.max("_batch_id")).collect()[0][0]
    assert last_id >= 1  # several micro-batches actually ran
    got = sorted(
        (r["event_type"], r["n_ref"], r["n_cur"], r["tvd_ppm"])
        for r in reports.where(F.col("_batch_id") == last_id).collect()
    )
    want = sorted(
        (r["event_type"], r["n_ref"], r["n_cur"], r["tvd_ppm"])
        for r in drift_report(
            spark, ref_p, _hist(spark.read.parquet(src), 10.0)
        ).collect()
    )
    assert got == want


def test_replayed_batch_never_double_counts(spark, tmp_path):
    ref_p = str(tmp_path / "ref")
    build_reference_histogram(_events(spark, 0, 1000), ref_p)
    state = str(tmp_path / "state")
    report = str(tmp_path / "report")
    fn = drift_batch_fn(ref_p, state, report)
    b = _events(spark, 1000, 1500)
    fn(b, 0)
    n0 = spark.read.parquet(state).agg(F.sum("n")).collect()[0][0]
    fn(b, 0)  # replay: at-least-once delivery of the same batch id
    n1 = spark.read.parquet(state).agg(F.sum("n")).collect()[0][0]
    assert n0 == n1 == 500
    assert spark.read.parquet(report).count() == 3  # one row/type, once


def test_alarm_fires_on_shift_and_stays_quiet_without(spark, tmp_path):
    ref_p = str(tmp_path / "ref")
    build_reference_histogram(_events(spark, 0, 4000), ref_p)
    fn_same = drift_batch_fn(
        ref_p, str(tmp_path / "s1"), str(tmp_path / "r1"), threshold_ppm=200_000
    )
    # same distribution, different ids: low TVD, no alarm
    fn_same(_events(spark, 4000, 8000), 0)
    r1 = spark.read.parquet(str(tmp_path / "r1"))
    assert r1.where("alarm").count() == 0
    assert r1.agg(F.max("tvd_ppm")).collect()[0][0] < 200_000
    # shifted distribution: every type alarms
    fn_shift = drift_batch_fn(
        ref_p, str(tmp_path / "s2"), str(tmp_path / "r2"), threshold_ppm=200_000
    )
    fn_shift(_events(spark, 4000, 8000, shift=60.0), 0)
    r2 = spark.read.parquet(str(tmp_path / "r2"))
    assert r2.where("alarm").count() == 3
    assert r2.agg(F.min("tvd_ppm")).collect()[0][0] > 500_000


def test_one_sided_type_degrades_not_crashes(spark, tmp_path):
    """A type present only in the stream (or only in the reference) gets
    the GREATEST(total,1) guard — TVD ≈ 1e6/2 (one side contributes all
    its mass, the other nothing), never a divide-by-zero."""
    ref_p = str(tmp_path / "ref")
    build_reference_histogram(_events(spark, 0, 300), ref_p)
    new_type = spark.range(100).select(
        F.col("id").alias("event_id"),
        F.lit("brand_new").alias("event_type"),
        (F.col("id") % 50).cast("double").alias("value"),
    )
    fn = drift_batch_fn(ref_p, str(tmp_path / "s"), str(tmp_path / "r"))
    fn(new_type, 0)
    rows = {
        r["event_type"]: r
        for r in spark.read.parquet(str(tmp_path / "r")).collect()
    }
    assert rows["brand_new"]["n_ref"] == 0
    assert rows["brand_new"]["tvd_ppm"] >= 490_000
    for t in ("t0", "t1", "t2"):  # reference-only types also report
        assert rows[t]["n_cur"] == 0
