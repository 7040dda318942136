"""Idempotent first-writer-wins sink (OP-SINK-UPSERT).

The reference gets exactly-once-effect on at-least-once delivery from
DynamoDB conditional writes (``attribute_not_exists(pk) AND
attribute_not_exists(sk)`` — ``lambda/agf_ingestion_lambda.py:226-236,
300-310, 329-343``): re-delivered events are skipped per key.

Spark translation on plain Parquet:
    1. within-batch dedup: ``dropDuplicates(keys)`` (first writer wins),
    2. cross-batch dedup: left-anti join against the *keys projection* of
       the existing table, then append.

Scale notes (100 TB posture):
* Only the key columns of the existing table are scanned (column pruning
  reaches the Parquet footer), and when the target is partitioned the
  caller can pass ``prune`` to partition-prune the existing side — the
  anti-join's build side is then tiny.
* The anti-join is the single shuffle of the whole ingest path; with a
  small incoming batch AQE converts it to a broadcast join automatically.
* Single-writer assumption, documented: plain Parquet append is not
  transactional across concurrent writers (the reference is likewise
  last/first-writer-wins). On a cluster with concurrent writers you would
  swap this helper's write for a Delta/Iceberg MERGE; every caller goes
  through this one function so the swap is one line.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _table_exists(spark: SparkSession, path: str) -> bool:
    # probe READABILITY, not directory existence: an aborted first write can
    # leave a directory holding only _temporary — treating that as "exists"
    # would make every later upsert fail at the existing-side read until
    # manual cleanup.  The schema probe is a driver-side footer read (cheap)
    # and works the same on local FS, HDFS, and object stores — which is
    # WHY there is no os.path.exists fast-path: that is a driver-LOCAL
    # check that returns False for every hdfs://-s3a:// URI, silently
    # disabling the anti-join (and therefore idempotency) off-box.
    try:
        spark.read.parquet(path).schema
        return True
    except Exception:
        return False


def upsert_append(
    df: DataFrame,
    path: str,
    keys: list[str],
    *,
    partition_by: list[str] | None = None,
    prune: Column | None = None,
    lock: bool = False,
    lock_wait_s: float = 30.0,
) -> None:
    """Append only key-combinations not already present (idempotent).

    ``prune``: optional predicate over the existing table used to narrow
    the anti-join's right side (e.g. ``col('date') >= lit(batch_min_date)``
    on a date-partitioned table → partition pruning).

    ``lock=True`` serializes the read-keys → anti-join → append cycle
    against other lock-honoring writers via operators/locking.table_lock,
    closing the concurrent-duplicate window the plain-Parquet sink
    otherwise has (see locking.py).  foreachBatch serializes batches
    *within* one streaming query, but any table written by MORE than one
    query (file_inventory: run + experiment streams) needs the lock.
    """
    if lock:
        from agf_data_ingestion_spark.operators.locking import table_lock

        with table_lock(path, wait_s=lock_wait_s):
            upsert_append(
                df, path, keys, partition_by=partition_by, prune=prune, lock=False
            )
        return
    spark = df.sparkSession
    batch = df.dropDuplicates(keys)
    if _table_exists(spark, path):
        existing = spark.read.parquet(path)
        if prune is not None:
            existing = existing.filter(prune)
        existing_keys = existing.select(*keys).dropDuplicates(keys)
        batch = batch.join(existing_keys, keys, "left_anti")
    writer = batch.write.mode("append")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def latest_versions(df: DataFrame, id_cols: list[str], version_col: str) -> DataFrame:
    """Canonical latest-version query over an append-only versioned table
    (the experiments table's ``(experiment_id, last_updated)`` SCD-2-ish
    history — SURVEY.md §2.7): ``row_number() over (partition by id order
    by version desc) = 1``.  Ties on (id, version) — e.g. a changed
    re-sync within timestamp granularity — break on a content hash so the
    winner is deterministic on any cluster (CLAUDE.md: every windowed
    pick needs a unique total order)."""
    from pyspark.sql.window import Window

    content = F.md5(
        F.to_json(F.struct(*[F.col(c) for c in df.columns if c not in id_cols]))
    )
    w = Window.partitionBy(*id_cols).orderBy(
        F.col(version_col).desc(), content.desc()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    )
