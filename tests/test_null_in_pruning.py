"""Null-count and IN-list data skipping (r8): per-file null counts from
the parquet footer prune ``is_null``/``not_null`` predicates, IN lists
prune per value through the same range+bloom rule as equality — at the
file level AND the segment level — with the residual filter keeping
results exact, and the conservative-keep rules for stats-less and
pre-evolution files."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from agf_data_ingestion_spark.sources import snapshots as S
from agf_data_ingestion_spark.sources.snapshots import (
    plan_files,
    read_manifest,
    snapshot_delete,
    snapshot_read,
    snapshot_rowcount,
    snapshot_write,
)


def _mk(spark, tmp_path):
    """Three appends: all-null v, no-null v, mixed v — each with a
    disjoint k range."""
    tbl = str(tmp_path / "tbl")
    allnull = spark.range(0, 100).select(
        F.col("id").alias("k"), F.lit(None).cast("bigint").alias("v")
    )
    nonull = spark.range(100, 200).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    mixed = spark.range(200, 300).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 3 == 0, F.col("id")).alias("v"),
    )
    for df in (allnull, nonull, mixed):
        snapshot_write(df.coalesce(1), tbl)
    return tbl


def test_null_count_pruning_and_exact_results(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    m = read_manifest(tbl)
    assert all("nulls" in f for f in m["files"])  # footer counts recorded
    total = len(m["files"])
    assert total == 3
    # IS NULL: the no-null file is pruned
    hit = plan_files(tbl, where=[("v", "is_null", None)])
    assert len(hit) == 2
    rows = snapshot_read(spark, tbl, where=[("v", "is_null", None)])
    # all-null file + mixed file's 67 non-multiples of 3 (33 of 201..299
    # are multiples)
    assert rows.count() == 100 + 67
    # IS NOT NULL: the all-null file is pruned
    hit2 = plan_files(tbl, where=[("v", "not_null", None)])
    assert len(hit2) == 2
    rows2 = snapshot_read(spark, tbl, where=[("v", "not_null", None)])
    assert rows2.count() == 100 + 33


def test_in_list_pruning_per_value(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    # values from two of the three k ranges
    hit = plan_files(tbl, where=[("k", "in", [5, 250])])
    assert len(hit) == 2
    got = sorted(
        r["k"]
        for r in snapshot_read(
            spark, tbl, where=[("k", "in", [5, 250])]
        ).collect()
    )
    assert got == [5, 250]
    # empty IN list: no files planned, empty exact result
    assert plan_files(tbl, where=[("k", "in", [])]) == []
    assert (
        snapshot_read(spark, tbl, where=[("k", "in", [])]).count() == 0
    )
    # values matching nothing anywhere: ranges disprove every file
    assert plan_files(tbl, where=[("k", "in", [9999])]) == []


def test_segment_level_null_and_in_pruning(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    m = read_manifest(tbl)
    segs = m["segments"]
    assert len(segs) == 3
    S._SEG_CACHE.clear()
    r0 = S._SEG_READS
    plan_files(tbl, where=[("v", "not_null", None), ("k", ">=", 0)])
    # the all-null file's segment is disproved WITHOUT being resolved
    assert S._SEG_READS - r0 == 2
    S._SEG_CACHE.clear()
    r1 = S._SEG_READS
    plan_files(tbl, where=[("k", "in", [150])])
    assert S._SEG_READS - r1 == 1


def test_pre_evolution_file_conservatively_kept_for_is_null(spark, tmp_path):
    """A file written before a column existed reads that column as NULL —
    it records no null count for it and must be KEPT for is_null."""
    tbl = str(tmp_path / "tbl")
    snapshot_write(
        spark.range(0, 50).select(F.col("id").alias("k")).coalesce(1), tbl
    )
    snapshot_write(
        spark.range(50, 100)
        .select(F.col("id").alias("k"), (F.col("id") * 3).alias("w"))
        .coalesce(1),
        tbl,
    )
    hit = plan_files(tbl, where=[("w", "is_null", None)])
    # the old file records no null count for w → conservatively KEPT;
    # the new file (w fully populated) is correctly pruned
    assert len(hit) == 1
    assert "w" not in hit[0].get("nulls", {})
    assert (
        snapshot_read(spark, tbl, where=[("w", "is_null", None)]).count()
        == 50
    )


def test_cow_delete_with_in_predicate(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    v = snapshot_delete(spark, tbl, where=[("k", "in", [5, 6, 250])])
    assert v > 3
    assert snapshot_rowcount(tbl) == 297
    left = snapshot_read(spark, tbl)
    assert left.where(F.col("k").isin([5, 6, 250])).count() == 0
    assert left.count() == 297
