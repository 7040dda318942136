"""Continuous CDC upsert through equality deletes
(streaming/upsert_stream.py): each micro-batch nets its changes and
commits O(batch) with ZERO target reads; exactly-once via the op-label
bookmark + durable HWM (the ann_stream pattern); deletes and upserts of
one batch land in ONE atomic commit."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from agf_data_ingestion_spark.sources import snapshots as S
from agf_data_ingestion_spark.sources.snapshots import (
    current_version,
    snapshot_merge,
    snapshot_read,
    snapshot_write,
)
from agf_data_ingestion_spark.streaming.upsert_stream import (
    cdc_upsert_batch,
    start_cdc_upsert_stream,
    upsert_batch_hwm,
)


def _rows(df):
    return sorted((r["k"], r["v"]) for r in df.select("k", "v").collect())


def _mk(spark, tmp_path, name="tbl", n=30, files=3):
    tbl = str(tmp_path / name)
    df = spark.range(n).select(
        F.col("id").alias("k"), F.concat(F.lit("v"), F.col("id")).alias("v")
    )
    snapshot_write(df, tbl, cluster_by=["k"], cluster_files=files)
    return tbl


def test_micro_batches_equal_one_shot_with_zero_target_reads(
    spark, tmp_path, monkeypatch
):
    one = _mk(spark, tmp_path, "oneshot")
    chop = _mk(spark, tmp_path, "chopped")
    updates = [(k, f"u{k}") for k in range(0, 30, 2)] + [(100, "n0"), (101, "n1")]
    snapshot_merge(
        spark.createDataFrame(updates, "k long, v string"), one, keys=["k"]
    )
    calls = []
    monkeypatch.setattr(
        S, "_read_entries", lambda *a, **kw: calls.append(1) or 1 / 0
    )
    for i, lo in enumerate(range(0, len(updates), 6)):
        v = cdc_upsert_batch(
            spark.createDataFrame(updates[lo : lo + 6], "k long, v string"),
            i,
            chop,
            ["k"],
        )
        assert v is not None
    assert not calls  # every micro-batch committed without scanning chop
    monkeypatch.undo()
    assert _rows(snapshot_read(spark, one)) == _rows(snapshot_read(spark, chop))


def test_replayed_batch_is_a_noop(spark, tmp_path):
    tbl = _mk(spark, tmp_path, n=10, files=1)
    b = spark.createDataFrame([(3, "B3")], "k long, v string")
    assert cdc_upsert_batch(b, 0, tbl, ["k"]) is not None
    v = current_version(tbl)
    assert cdc_upsert_batch(b, 0, tbl, ["k"]) is None  # replay: no commit
    assert current_version(tbl) == v
    assert upsert_batch_hwm(tbl) == 0
    # rows did not double: the merge-eq shadowed exactly one old copy
    got = _rows(snapshot_read(spark, tbl))
    assert got.count((3, "B3")) == 1 and len(got) == 10


def test_order_col_last_change_wins_within_batch(spark, tmp_path):
    tbl = _mk(spark, tmp_path, n=5, files=1)
    b = spark.createDataFrame(
        [(2, "first", 1), (2, "second", 2), (4, "only", 7)],
        "k long, v string, seq long",
    )
    cdc_upsert_batch(b, 0, tbl, ["k"], order_col="seq")
    got = dict(_rows(snapshot_read(spark, tbl)))
    assert got[2] == "second" and got[4] == "only" and len(got) == 5


def test_delete_col_one_atomic_commit_and_cdc_nets(spark, tmp_path):
    from agf_data_ingestion_spark.sources.snapshots import snapshot_diff

    tbl = _mk(spark, tmp_path, n=10, files=1)
    v0 = current_version(tbl)
    b = spark.createDataFrame(
        [(2, "UP2", False), (7, None, True), (50, "NEW", False)],
        "k long, v string, _deleted boolean",
    )
    v1 = cdc_upsert_batch(b, 0, tbl, ["k"], delete_col="_deleted")
    assert v1 == v0 + 1  # upsert + delete in ONE commit
    got = dict(_rows(snapshot_read(spark, tbl)))
    assert got[2] == "UP2" and got[50] == "NEW" and 7 not in got
    d = snapshot_diff(spark, tbl, v_from=v0, v_to=v1)
    changes = sorted((r["_change"], r["k"]) for r in d.collect())
    assert changes == [
        ("delete", 2),
        ("delete", 7),
        ("insert", 2),
        ("insert", 50),
    ]
    # a later batch may re-insert the deleted key (sequence scoping)
    cdc_upsert_batch(
        spark.createDataFrame([(7, "BACK", False)], "k long, v string, _deleted boolean"),
        1,
        tbl,
        ["k"],
        delete_col="_deleted",
    )
    assert dict(_rows(snapshot_read(spark, tbl)))[7] == "BACK"


def test_overlapping_update_and_delete_refused(spark, tmp_path):
    tbl = _mk(spark, tmp_path, n=5, files=1)
    b = spark.createDataFrame(
        [(2, "UP", False), (2, None, True)], "k long, v string, _deleted boolean"
    )
    with pytest.raises(ValueError, match="net the micro-batch|not unique"):
        cdc_upsert_batch(b, 0, tbl, ["k"], delete_col="_deleted")


def test_streaming_query_end_to_end_and_restart_dedups(spark, tmp_path):
    tbl = _mk(spark, tmp_path, n=10, files=1)
    feed = str(tmp_path / "feed")
    chk = str(tmp_path / "chk")
    spark.createDataFrame(
        [(1, "s1"), (60, "s60")], "k long, v string"
    ).coalesce(1).write.parquet(feed)
    changes = spark.readStream.schema("k long, v string").parquet(feed)
    q = start_cdc_upsert_stream(changes, tbl, chk, ["k"], available_now=True)
    q.awaitTermination(120)
    got = dict(_rows(snapshot_read(spark, tbl)))
    assert got[1] == "s1" and got[60] == "s60" and len(got) == 11
    v = current_version(tbl)
    # restart on the SAME checkpoint: nothing new to read, nothing replayed
    q2 = start_cdc_upsert_stream(
        spark.readStream.schema("k long, v string").parquet(feed),
        tbl,
        chk,
        ["k"],
        available_now=True,
    )
    q2.awaitTermination(120)
    assert current_version(tbl) == v
    assert snapshot_read(spark, tbl).count() == 11


def test_replay_scan_bounded_by_hwm_commit_version(spark, tmp_path, monkeypatch):
    """ADVICE r7: the op-label replay scan must stop at the durable HWM's
    commit version — O(versions since last HWM write) per micro-batch, not
    O(all retained versions) — while still covering the crash window
    between a commit and its HWM write."""
    import json as _json

    from agf_data_ingestion_spark.streaming import upsert_stream as U

    tbl = _mk(spark, tmp_path, n=10, files=1)
    for i in range(5):
        assert (
            cdc_upsert_batch(
                spark.createDataFrame([(i, f"b{i}")], "k long, v string"),
                i,
                tbl,
                ["k"],
            )
            is not None
        )
    hwm_batch, hwm_version = U._hwm_entry(tbl, "")
    assert hwm_batch == 4 and hwm_version == current_version(tbl)
    # replay of an old batch: HWM check catches it with ZERO op-label reads
    calls = []
    real_op = U._manifest_op
    monkeypatch.setattr(
        U, "_manifest_op", lambda *a: calls.append(a) or real_op(*a)
    )
    assert cdc_upsert_batch(
        spark.createDataFrame([(2, "old")], "k long, v string"), 2, tbl, ["k"]
    ) is None
    assert calls == []
    # crash window: batch 5 commits, then the HWM write is lost — the
    # bounded scan (versions > hwm_version only) must still dedup it
    assert cdc_upsert_batch(
        spark.createDataFrame([(5, "b5")], "k long, v string"), 5, tbl, ["k"]
    ) is not None
    with open(U._hwm_path(tbl), "w") as fh:
        _json.dump({"": [hwm_batch, hwm_version]}, fh)  # simulate lost write
    calls.clear()
    assert cdc_upsert_batch(
        spark.createDataFrame([(5, "dup")], "k long, v string"), 5, tbl, ["k"]
    ) is None
    assert 0 < len(calls) <= current_version(tbl) - hwm_version
    assert dict(_rows(snapshot_read(spark, tbl)))[5] == "b5"


def test_hwm_pre_r8_bare_int_format_reads_back(spark, tmp_path):
    """A pre-r8 HWM file stored the bare batch id; it must read back with
    version 0 (scan bound disabled, full history still consulted)."""
    import json as _json

    from agf_data_ingestion_spark.streaming import upsert_stream as U

    tbl = _mk(spark, tmp_path, n=5, files=1)
    cdc_upsert_batch(
        spark.createDataFrame([(0, "b0")], "k long, v string"), 0, tbl, ["k"]
    )
    with open(U._hwm_path(tbl), "w") as fh:
        _json.dump({"": 0}, fh)  # old format
    assert U._hwm_entry(tbl, "") == (0, 0)
    assert upsert_batch_hwm(tbl) == 0
    assert cdc_upsert_batch(
        spark.createDataFrame([(0, "dup")], "k long, v string"), 0, tbl, ["k"]
    ) is None
