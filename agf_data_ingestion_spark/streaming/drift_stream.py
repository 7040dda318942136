"""Continuous distribution-drift monitor: the streaming twin of
``events_drift_tvd`` (plans/behavior.py) — a reference histogram is built
once from a baseline window, each micro-batch folds its own value
histogram into a cumulative store, and a per-batch drift REPORT row is
emitted per event type (total-variation distance in ppm, exact integers)
with an alarm flag when TVD crosses the policy threshold.  This is the
observability loop a 100 TB ingest pipeline runs against upstream
unit/schema regressions: the alarm fires within one trigger of the shift
arriving, not at the next nightly batch audit.

Exactly-once accounting on an at-least-once sink: cumulative counts are
additive, so a REPLAYED micro-batch would double-count — every state
append carries ``_batch_id`` and the fold consults the already-applied id
set first (the engine's applied-batch-id bookmark pattern,
streaming/ann_stream.py).  With replays suppressed, the cumulative
histogram after N batches is bit-equal to a one-shot batch histogram of
the union, so the final report row equals the batch query on the same
data — the standing batch≡stream contract, pinned in
tests/test_drift_stream.py.

Scale: per batch ONE map-combined (type, bin) aggregate on the batch
(batch-sized, no corpus rescan); the fold + TVD run on histogram-sized
tables (K_types × bins rows).  The reference histogram is tiny and
broadcast by AQE on its own.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: drift-report alarm default: 10% total-variation distance
DEFAULT_THRESHOLD_PPM = 100_000


def _hist(df: DataFrame, bin_width: float) -> DataFrame:
    """(event_type, bin, n) histogram — the same binning as
    ``events_drift_tvd`` (IEEE divide + floor, engine-identical)."""
    return df.groupBy(
        "event_type",
        F.expr(f"CAST(floor(value / {bin_width}) AS BIGINT)").alias("bin"),
    ).agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("n"))


def build_reference_histogram(
    baseline: DataFrame, out_path: str, *, bin_width: float = 10.0
) -> None:
    """Materialize the baseline window's histogram — the fixed yardstick
    every later batch drifts against."""
    _hist(baseline, bin_width).write.mode("overwrite").parquet(out_path)


def drift_report(
    spark: SparkSession,
    ref_path: str,
    cur: DataFrame,
) -> DataFrame:
    """Per-type TVD (ppm) between the reference histogram and ``cur``
    (a (event_type, bin, n) frame) — the exact-integer arithmetic of
    ``events_drift_tvd``: truncated ppm shares, GREATEST(total, 1)
    divide-by-zero guard for one-sided types."""
    ref = spark.read.parquet(ref_path).withColumnRenamed("n", "n1")
    c = cur.withColumnRenamed("n", "n2")
    binned = ref.join(c, ["event_type", "bin"], "full_outer").select(
        "event_type",
        "bin",
        F.coalesce("n1", F.lit(0)).alias("n1"),
        F.coalesce("n2", F.lit(0)).alias("n2"),
    )
    totals = binned.groupBy("event_type").agg(
        F.expr("CAST(SUM(n1) AS BIGINT)").alias("t1"),
        F.expr("CAST(SUM(n2) AS BIGINT)").alias("t2"),
    )
    return (
        binned.join(F.broadcast(totals), "event_type")
        .groupBy("event_type")
        .agg(
            F.min("t1").alias("n_ref"),
            F.min("t2").alias("n_cur"),
            F.expr(
                "CAST(SUM(ABS((n1 * 1000000) div GREATEST(t1, 1)"
                " - (n2 * 1000000) div GREATEST(t2, 1))) div 2 AS BIGINT)"
            ).alias("tvd_ppm"),
        )
    )


def _batch_ids(spark: SparkSession, path: str) -> set:
    """Distinct ``_batch_id`` values at ``path`` — empty ONLY for a
    missing path (first batch).  Any other failure (torn part file,
    permission, schema drift) must propagate: returning an empty set
    there would tell the replay guard "nothing applied" and double-count
    the batch."""
    from pyspark.errors import AnalysisException

    try:
        return {
            r["_batch_id"]
            for r in spark.read.parquet(path)
            .select("_batch_id")
            .distinct()
            .collect()
        }
    except AnalysisException as e:
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            return set()
        raise


def drift_applied_batch_ids(spark: SparkSession, state_path: str) -> set:
    return _batch_ids(spark, state_path)


def drift_batch_fn(
    ref_path: str,
    state_path: str,
    report_path: str,
    *,
    bin_width: float = 10.0,
    threshold_ppm: int = DEFAULT_THRESHOLD_PPM,
):
    """foreachBatch function: fold the batch histogram into the
    cumulative store (replay-suppressed by ``_batch_id``), then append a
    per-type report row with the drift of the CUMULATIVE stream so far
    against the reference."""

    def fn(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        # two idempotent steps, each guarded by its OWN _batch_id set: a
        # crash between the state fold and the report append must not
        # lose the report on replay (state would say "applied" and the
        # alarm row would never be written), and never re-fold counts
        if batch_id not in _batch_ids(spark, state_path):
            h = _hist(batch, bin_width).withColumn(
                "_batch_id", F.lit(batch_id).cast("long")
            )
            h.write.mode("append").parquet(state_path)
        if batch_id in _batch_ids(spark, report_path):
            return  # fully applied replay
        cur = (
            spark.read.parquet(state_path)
            .where(F.col("_batch_id") <= batch_id)
            .groupBy("event_type", "bin")
            .agg(F.expr("CAST(SUM(n) AS BIGINT)").alias("n"))
        )
        rep = drift_report(spark, ref_path, cur).select(
            F.lit(batch_id).cast("long").alias("_batch_id"),
            "event_type",
            "n_ref",
            "n_cur",
            "tvd_ppm",
            (F.col("tvd_ppm") > threshold_ppm).alias("alarm"),
        )
        rep.write.mode("append").parquet(report_path)

    return fn


def start_drift_stream(
    stream: DataFrame,
    ref_path: str,
    state_path: str,
    report_path: str,
    checkpoint: str,
    *,
    bin_width: float = 10.0,
    threshold_ppm: int = DEFAULT_THRESHOLD_PPM,
    available_now: bool = False,
):
    """Attach the drift monitor to an event stream (needs ``event_type``
    and ``value`` columns)."""
    writer = (
        stream.writeStream.foreachBatch(
            drift_batch_fn(
                ref_path,
                state_path,
                report_path,
                bin_width=bin_width,
                threshold_ppm=threshold_ppm,
            )
        )
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
