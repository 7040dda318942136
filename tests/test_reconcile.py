"""Reconciliation invariants (SURVEY.md §5: after a clean ingest both
anti-joins are empty; injected discrepancies surface both ways)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from agf_data_ingestion_spark.operators.reconcile import (
    format_report,
    list_storage_keys,
    reconcile,
    tracked_keys,
)


def _tables(spark, file_keys, run_keys, exp_keys, ts):
    mk = lambda keys, kcol, tcol: spark.createDataFrame(
        [(k, ts) for k in keys], f"{kcol} string, {tcol} timestamp"
    )
    return {
        "file_inventory": mk(file_keys, "s3_key", "uploaded_at"),
        "sync_runs": mk(run_keys, "s3_key", "processed_at"),
        "experiments": mk(exp_keys, "s3_experiment_json_key", "last_updated"),
    }


def test_clean_state_in_sync(spark):
    storage = spark.createDataFrame(
        [("raw/a/f1", dt.datetime(2024, 1, 2)), ("raw/a/run.json", dt.datetime(2024, 1, 2))],
        ["key", "modified_at"],
    )
    tables = _tables(spark, ["raw/a/f1"], ["raw/a/run.json"], [], dt.datetime(2024, 1, 2))
    res = reconcile(storage, tracked_keys(tables))
    assert res.status == "in_sync"
    assert res.orphaned_in_storage == 0 and res.orphaned_in_db == 0


def test_discrepancies_both_ways_and_report(spark):
    storage = spark.createDataFrame(
        [("raw/a/f1", dt.datetime(2024, 1, 2)), ("raw/a/untracked", dt.datetime(2024, 1, 2))],
        ["key", "modified_at"],
    )
    tables = _tables(
        spark, ["raw/a/f1", "raw/a/deleted"], [], [], dt.datetime(2024, 1, 2)
    )
    res = reconcile(storage, tracked_keys(tables))
    assert res.status == "discrepancies_found"
    assert res.orphaned_in_storage == 1 and res.sample_storage == ["raw/a/untracked"]
    assert res.orphaned_in_db == 1 and res.sample_db == ["raw/a/deleted"]
    rep = format_report(res, "2024-01-02T00:00:00")
    assert "raw/a/untracked" in rep and "raw/a/deleted" in rep


def test_time_window_excludes_old_records(spark):
    """Records older than the incremental window are out of scope
    (reference :38-40, :113-124)."""
    cutoff = dt.datetime(2024, 1, 10)
    storage = spark.createDataFrame(
        [("raw/a/new", dt.datetime(2024, 1, 12)), ("raw/a/old", dt.datetime(2024, 1, 1))],
        ["key", "modified_at"],
    ).filter(F.col("modified_at") >= F.lit(cutoff))
    tables = _tables(spark, ["raw/a/old-rec"], [], [], dt.datetime(2024, 1, 1))
    res = reconcile(storage, tracked_keys(tables, cutoff=cutoff))
    # the old record on each side is excluded entirely
    assert res.storage_count == 1 and res.tracked_count == 0
    assert res.orphaned_in_storage == 1  # new file is untracked within window


def test_listing_source_filters_junk(spark, tmp_path):
    root = tmp_path
    d = root / "raw" / "inst" / "2024" / "01" / "01" / "r1"
    d.mkdir(parents=True)
    (d / "run.json").write_text("{}")
    (d / ".DS_Store").write_text("junk")
    keys = [r["key"] for r in list_storage_keys(spark, str(root)).collect()]
    assert keys == ["raw/inst/2024/01/01/r1/run.json"]


def test_end_to_end_against_ingested_lake(spark, lake, tmp_path):
    """Ingest the fixture lake, then reconciliation over manifest keys
    finds: tracked manifests in sync; data files (never uploaded in the
    fixture) orphaned in DB exactly as expected."""
    import datetime as dt

    from agf_data_ingestion_spark.operators.ingest import (
        split_valid,
        sync_runs_from_run_manifests,
    )
    from agf_data_ingestion_spark.sources.manifests import read_run_manifests

    now = dt.datetime(2024, 6, 1)
    runs, _ = split_valid(
        read_run_manifests(spark, lake["root"]), required=["computer_name", "files_in_batch"]
    )
    sync_runs = sync_runs_from_run_manifests(runs, now=now)
    storage = list_storage_keys(spark, lake["root"])
    tracked = tracked_keys({"sync_runs": sync_runs})
    res = reconcile(storage, tracked)
    # every tracked run.json exists in storage
    assert res.orphaned_in_db == 0
    # storage also holds experiment.json files → orphans on storage side
    assert res.orphaned_in_storage == lake["n_exps"]
