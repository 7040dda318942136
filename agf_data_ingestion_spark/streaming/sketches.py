"""Streaming distinct-count sketching: per-micro-batch KMV sketches merged
into a persistent sketch table via ``foreachBatch``.

A KMV sketch is mergeable — the bottom-k of a union equals the bottom-k of
per-part bottom-k sets — so streaming distinct-count needs NO stateful
operator, NO watermark, and no replay: each micro-batch contributes its
bottom-k hash set, the sink merges it with the persisted sketch and
re-truncates.  State is O(k × groups) *forever*, regardless of stream
length — the metric-table shape the reference pushes to CloudWatch
(OP-SINK-METRICS, `agf_reconciliation_lambda.py:275-289`), and the same
tree-merge a 1000-executor cluster uses to roll distinct counts up without
rescanning history.  Batch/streaming unification: the identical
``kmv_sketch`` function is the batch twin, so the oracle-checked catalog
query (plans/sketches.py) pins the semantics.

The persisted sketch is ≤ k rows per group BY CONSTRUCTION, so the sink
may safely collect it to the driver for the atomic rewrite — this is the
one place "collect" is not a scale smell, because boundedness is the data
structure's contract, not an assumption about the data.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_K = 64
_HASH_HEX = 15  # 60-bit hash space
_HASH_SPACE = float(1 << 60)


def kmv_sketch(df: DataFrame, *, group_col: str, key_col: str, k: int = _K) -> DataFrame:
    """Bottom-``k`` md5 hashes of ``key_col`` per ``group_col`` — the sketch
    itself, as a (group, h) DataFrame.  Works identically on batch input
    and inside a micro-batch."""
    h = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, _HASH_HEX), 16, 10
    ).cast("long")
    hashes = (
        df.select(F.col(group_col).alias("grp"), h.alias("h"))
        .filter(F.col("h").isNotNull())  # null keys carry no identity
        .distinct()
    )
    w = Window.partitionBy("grp").orderBy("h")
    return (
        hashes.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")
    )


def merge_kmv(a: DataFrame, b: DataFrame, *, k: int = _K) -> DataFrame:
    """Merge two sketches: union, dedup, re-truncate.  Exact by the k-min
    merge property."""
    u = a.unionByName(b).distinct()
    w = Window.partitionBy("grp").orderBy("h")
    return u.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")


def kmv_estimates(sketch: DataFrame, *, k: int = _K) -> DataFrame:
    """(grp, n_kept, est) distinct-count estimates from a sketch table."""
    agg = sketch.groupBy("grp").agg(F.count("*").alias("n_kept"), F.max("h").alias("kth"))
    est = F.when(F.col("n_kept") < k, F.col("n_kept").cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(_HASH_SPACE) / F.col("kth").cast("double")
    )
    return agg.select("grp", "n_kept", est.alias("est"))


def kmv_sink(
    spark: SparkSession,
    table_dir: str,
    *,
    group_col: str,
    key_col: str,
    k: int = _K,
):
    """``foreachBatch`` function maintaining the persistent sketch at
    ``table_dir``: sketch the batch, merge with the stored sketch,
    atomically replace.  The rewrite goes through the driver because the
    merged sketch is ≤ k rows per group by construction (see module doc)."""

    def sink(batch: DataFrame, batch_id: int) -> None:
        new = kmv_sketch(batch, group_col=group_col, key_col=key_col, k=k)
        if os.path.isdir(table_dir):
            try:
                cur = spark.read.parquet(table_dir)
            except Exception:
                cur = None
            if cur is not None:
                new = merge_kmv(cur, new, k=k)
        rows = new.collect()  # bounded: ≤ k × groups by the sketch contract
        merged = spark.createDataFrame(rows, schema="grp string, h long")
        merged.coalesce(1).write.mode("overwrite").parquet(table_dir)

    return sink
