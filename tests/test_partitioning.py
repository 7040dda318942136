"""Physical-layout evidence tests: Hive-partitioned writes actually prune,
and the upsert `prune` predicate narrows the anti-join's scan (SURVEY.md §4
"partition pruning analog" row — the engine gets it from layout choice)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from agf_data_ingestion_spark.operators.upsert import upsert_append


def _inventory(spark, days):
    rows = [
        (f"exp_{d}_{i}", f"f_{d}_{i}.csv", f"inst{i % 3:02d}", dt.date(2024, 3, d))
        for d in days
        for i in range(10)
    ]
    return spark.createDataFrame(rows, ["experiment_id", "file_path", "instrument_id", "date"])


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    path = str(tmp_path / "inv")
    _inventory(spark, [1, 2, 3, 4]).write.partitionBy("instrument_id", "date").parquet(path)

    pruned = spark.read.parquet(path).filter(
        (F.col("instrument_id") == "inst00") & (F.col("date") == dt.date(2024, 3, 2))
    )
    # the physical scan must carry partition filters (directory pruning),
    # and the result must be exactly the one partition's rows
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "instrument_id" in pf[0] and "date" in pf[0], plan
    rows = pruned.collect()
    assert len(rows) == 4  # i % 3 == 0 for i in 0..9
    assert all(
        r["instrument_id"] == "inst00" and r["date"] == dt.date(2024, 3, 2) for r in rows
    )


def test_upsert_prune_narrows_existing_side(spark, tmp_path):
    path = str(tmp_path / "inv2")
    first = _inventory(spark, [1, 2])
    upsert_append(first, path, ["experiment_id", "file_path"], partition_by=["date"])

    # second batch: day-2 duplicates + new day-3 rows; prune to the batch's
    # date range so the anti-join only scans those partitions
    second = _inventory(spark, [2, 3])
    upsert_append(
        second,
        path,
        ["experiment_id", "file_path"],
        partition_by=["date"],
        prune=F.col("date") >= dt.date(2024, 3, 2),
    )
    out = spark.read.parquet(path)
    assert out.count() == 30  # days 1,2,3 × 10, duplicates skipped
    assert out.groupBy().agg(F.count_distinct("experiment_id")).collect()[0][0] == 30


def test_upsert_idempotent_across_partitions(spark, tmp_path):
    path = str(tmp_path / "inv3")
    df = _inventory(spark, [5])
    for _ in range(3):
        upsert_append(df, path, ["experiment_id", "file_path"], partition_by=["date"])
    assert spark.read.parquet(path).count() == 10
