"""Idempotent-sink property tests (SURVEY.md §5: ingest twice ⇒ identical
table state — the reference's conditional-write guarantee)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from agf_data_ingestion_spark.operators.ingest import split_valid, sync_runs_from_run_manifests
from agf_data_ingestion_spark.operators.upsert import latest_versions, upsert_append
from agf_data_ingestion_spark.sources.manifests import read_run_manifests

NOW = dt.datetime(2024, 6, 1)


def _table_state(spark, path):
    rows = spark.read.parquet(path).collect()
    return sorted(tuple(r) for r in rows)


def test_ingest_twice_identical_state(spark, lake, tmp_path):
    target = str(tmp_path / "sync_runs")
    runs, _ = split_valid(
        read_run_manifests(spark, lake["root"]), required=["computer_name", "files_in_batch"]
    )
    df = sync_runs_from_run_manifests(runs, now=NOW)

    upsert_append(df, target, ["run_id", "instrument_id"])
    first = _table_state(spark, target)
    assert len(first) == lake["n_runs"]

    # replay: same batch again — no new rows, identical bytes-level state
    upsert_append(df, target, ["run_id", "instrument_id"])
    assert _table_state(spark, target) == first


def test_within_batch_dedup(spark, tmp_path):
    target = str(tmp_path / "t")
    df = spark.createDataFrame(
        [("r1", "i1", 1), ("r1", "i1", 2), ("r2", "i1", 3)], ["run_id", "instrument_id", "v"]
    )
    upsert_append(df, target, ["run_id", "instrument_id"])
    assert spark.read.parquet(target).count() == 2


def test_new_keys_append_existing_skip(spark, tmp_path):
    target = str(tmp_path / "t")
    df1 = spark.createDataFrame([("a", 1), ("b", 2)], ["k", "v"])
    df2 = spark.createDataFrame([("b", 99), ("c", 3)], ["k", "v"])
    upsert_append(df1, target, ["k"])
    upsert_append(df2, target, ["k"])
    got = {r["k"]: r["v"] for r in spark.read.parquet(target).collect()}
    assert got == {"a": 1, "b": 2, "c": 3}  # first writer wins for b


def test_aborted_first_write_dir_treated_as_missing(spark, tmp_path):
    """A target directory holding only _temporary debris (aborted first
    write) must count as not-exists: the next upsert recovers by writing
    fresh instead of failing on an unreadable existing side (ADVICE r1)."""
    import os

    table = str(tmp_path / "t")
    os.makedirs(os.path.join(table, "_temporary", "0"))
    df = spark.createDataFrame([("e1", "a.csv", 1)], ["experiment_id", "file_path", "n"])
    upsert_append(df, table, ["experiment_id", "file_path"])
    assert spark.read.parquet(table).count() == 1
    # and stays idempotent afterwards
    upsert_append(df, table, ["experiment_id", "file_path"])
    assert spark.read.parquet(table).count() == 1


def test_latest_versions_window(spark):
    df = spark.createDataFrame(
        [("e1", 10, "old"), ("e1", 20, "new"), ("e2", 5, "only")],
        ["experiment_id", "last_updated", "tag"],
    )
    got = {
        r["experiment_id"]: r["tag"]
        for r in latest_versions(df, ["experiment_id"], "last_updated").collect()
    }
    assert got == {"e1": "new", "e2": "only"}


def test_versioned_experiments_accumulate(spark, tmp_path):
    """Same experiment_id with a newer last_updated is a NEW version row
    (reference key (experiment_id, last_updated) — :300-304)."""
    target = str(tmp_path / "exps")
    v1 = spark.createDataFrame([("e1", 10, 1)], ["experiment_id", "last_updated", "update_count"])
    v2 = spark.createDataFrame([("e1", 20, 2)], ["experiment_id", "last_updated", "update_count"])
    upsert_append(v1, target, ["experiment_id", "last_updated"])
    upsert_append(v2, target, ["experiment_id", "last_updated"])
    upsert_append(v2, target, ["experiment_id", "last_updated"])  # replay
    assert spark.read.parquet(target).count() == 2
