"""Streaming CDC source over the snapshot format: per-commit batches,
insert/delete tagging identical to snapshot_diff, replay determinism, and
compaction netting to zero."""

from __future__ import annotations

import os

import pytest

from agf_data_ingestion_spark.sources.snapshot_stream import SnapshotCDCSource
from agf_data_ingestion_spark.sources.snapshots import (
    snapshot_compact,
    snapshot_delete,
    snapshot_write,
)


@pytest.fixture()
def registered(spark):
    spark.dataSource.register(SnapshotCDCSource)
    return spark


def _run(spark, tbl, out, ck):
    q = (
        spark.readStream.format("agf_snapshot_cdc")
        .option("table", tbl)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        sorted(
            (r["_commit_version"], r["_change"], r["k"], r["v"])
            for r in spark.read.parquet(out).collect()
        )
        if os.path.exists(out)
        else []
    )


def test_cdc_stream_tails_commits(registered, tmp_path):
    spark = registered
    tbl = str(tmp_path / "tbl")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    snapshot_write(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"), tbl)
    got = _run(spark, tbl, out, ck)
    assert got == [(1, "insert", 1, "a"), (1, "insert", 2, "b")]

    # append + delete land as two further per-commit batches on the SAME
    # checkpoint — only the delta is emitted
    snapshot_write(spark.createDataFrame([(3, "c")], "k long, v string"), tbl)
    snapshot_delete(spark, tbl, [("k", "==", 1)])
    got = _run(spark, tbl, out, ck)
    assert got == [
        (1, "insert", 1, "a"),
        (1, "insert", 2, "b"),
        (2, "insert", 3, "c"),
        (3, "delete", 1, "a"),
    ]


def test_cdc_compaction_nets_to_zero(registered, tmp_path):
    spark = registered
    tbl = str(tmp_path / "tbl")
    for k in (1, 2, 3):
        snapshot_write(
            spark.createDataFrame([(k, "x")], "k long, v string").coalesce(1), tbl
        )
    snapshot_compact(spark, tbl, small_bytes=8 << 20)
    got = _run(spark, tbl, str(tmp_path / "out"), str(tmp_path / "ck"))
    # three insert batches; the compaction commit rewrites files but nets
    # to ZERO row changes
    assert [g for g in got if g[0] == 4] == []
    assert len([g for g in got if g[1] == "insert"]) == 3


def test_cdc_replay_is_deterministic(registered, tmp_path):
    spark = registered
    tbl = str(tmp_path / "tbl")
    snapshot_write(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"), tbl)
    snapshot_write(spark.createDataFrame([(3, "c")], "k long, v string"), tbl)
    a = _run(spark, tbl, str(tmp_path / "o1"), str(tmp_path / "c1"))
    b = _run(spark, tbl, str(tmp_path / "o2"), str(tmp_path / "c2"))
    assert a == b and len(a) == 3


def test_cdc_starting_version_skips_history(registered, tmp_path):
    spark = registered
    tbl = str(tmp_path / "tbl")
    snapshot_write(spark.createDataFrame([(1, "a")], "k long, v string"), tbl)
    snapshot_write(spark.createDataFrame([(2, "b")], "k long, v string"), tbl)
    q = (
        spark.readStream.format("agf_snapshot_cdc")
        .option("table", tbl)
        .option("startingVersion", 1)
        .load()
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r["_commit_version"], r["_change"], r["k"])
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    )
    assert got == [(2, "insert", 2)]


def test_cdc_stream_drives_incremental_mv_maintenance(registered, tmp_path):
    """Composition: the CDC stream as the TRIGGER for incremental MV
    refresh — each micro-batch of commits folds exactly its delta into
    the view (mv_refresh's bookmark makes the foreachBatch idempotent
    under replay), and the view equals a from-scratch recompute after
    every run."""
    from pyspark.sql import functions as F

    from agf_data_ingestion_spark.operators.mv import mv_read, mv_refresh
    from agf_data_ingestion_spark.sources.snapshots import snapshot_read

    spark = registered
    fact = str(tmp_path / "fact")
    mv = str(tmp_path / "mv")
    snapshot_write(
        spark.createDataFrame([("a", 1.0), ("a", 2.0), ("b", 5.0)], "g string, v double"),
        fact,
    )

    def refresh(batch, batch_id):
        mv_refresh(spark, fact, mv, group_cols=["g"], measures={"val_sum": "v"})

    def run(ck):
        q = (
            spark.readStream.format("agf_snapshot_cdc")
            .option("table", fact)
            .load()
            .writeStream.foreachBatch(refresh)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def recompute():
        return sorted(
            (r["g"], r["val_sum"])
            for r in snapshot_read(spark, fact)
            .groupBy("g")
            .agg(F.sum(F.col("v").cast("decimal(25,6)")).cast("double").alias("val_sum"))
            .collect()
        )

    ck = str(tmp_path / "ck")
    run(ck)
    assert sorted((r["g"], r["val_sum"]) for r in mv_read(spark, mv).collect()) == recompute()

    snapshot_write(spark.createDataFrame([("b", 7.0), ("c", 1.5)], "g string, v double"), fact)
    snapshot_delete(spark, fact, [("g", "==", "a")])
    run(ck)
    got = sorted((r["g"], r["val_sum"]) for r in mv_read(spark, mv).collect())
    assert got == recompute() == [("b", 12.0), ("c", 1.5)]
