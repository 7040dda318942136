"""Bucketed-table helpers: pre-shuffled layouts for repeated co-located
joins (the "co-locate joins via bucketing" scale lever).

A fact table joined on the same key by many downstream queries pays one
shuffle per query; bucketing pays the shuffle ONCE at write time — both
sides bucketed by the join key into the same bucket count join with zero
exchange (verified in tests: no ``Exchange`` above the scan in the
executed plan).  At 100 TB the write-side sort/bucket cost amortizes over
every subsequent join, and bucket pruning serves point lookups.

Spark requires the session catalog (``saveAsTable``) for bucket metadata —
plain ``.parquet(path)`` writes lose it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_by: list[str],
    n_buckets: int = 16,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sort-merged-ready)
    catalog table."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
    *,
    force_sort_merge: bool = False,
) -> DataFrame:
    """Join two identically-bucketed tables — plans with no shuffle on
    either side when bucket specs match.

    ``force_sort_merge`` pins the merge strategy (useful when one side is
    under the broadcast threshold but you specifically want the
    exchange-free bucketed SMJ, e.g. to benchmark it)."""
    left = spark.table(left_table)
    if force_sort_merge:
        left = left.hint("merge")
    return left.join(spark.table(right_table), on, how)
