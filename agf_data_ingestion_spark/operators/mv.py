"""Incremental materialized-view maintenance over snapshot CDC
(OP-X-MV).

An additive aggregate view (counts + sums per group) is maintained from
a snapshot-format fact table WITHOUT rescanning it: each refresh reads
only the row-level change feed between the last-applied and the current
fact version (``snapshot_diff`` — inserts and deletes), aggregates the
delta with sign (+1 insert, −1 delete), and folds it into the stored
view with one keyed full-outer merge.  Refresh cost is O(delta +
view), never O(fact) — the difference between maintaining a daily
rollup over 100 TB and recomputing it.

Exactness is what makes this safe: measures accumulate as DECIMAL
(column-declared scale) and counts as BIGINT, so a delete exactly
cancels the insert that produced it — float sums would drift under
insert/delete churn and the view would diverge from recompute.  Groups
whose count reaches zero are dropped (not left as zero-rows).

The view itself is a snapshot table (atomic commits, time travel over
VIEW history), and the last-applied fact version rides in the commit
metadata — state and bookmark move in ONE atomic pointer swap, so a
crashed refresh can never double-apply a delta (the same
idempotency-by-construction as the reference's conditional writes,
lambda/agf_ingestion_lambda.py:227-229).

Additive measures only (SUM/COUNT; AVG = sum/count at read time).
MIN/MAX are not incrementally maintainable under deletes without
keeping per-group value multisets — use a full recompute or the
sketch family for those.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from agf_data_ingestion_spark.sources.snapshots import (
    _commit,
    _write_data_files,
    current_version,
    read_manifest,
    snapshot_diff,
    snapshot_read,
)
from agf_data_ingestion_spark.operators.locking import table_lock

_DEC = "decimal(25,6)"
_OP_PREFIX = "mv_refresh@"


def mv_last_applied(mv_table: str) -> int:
    """The fact-table version the stored view reflects (0 = never run).
    The bookmark IS the view's own commit op (``mv_refresh@N``) — state
    and bookmark move in the same atomic manifest swap, so there is no
    window where one exists without the other."""
    if current_version(mv_table) == 0:
        return 0
    op = read_manifest(mv_table)["op"]
    if not op.startswith(_OP_PREFIX):
        raise ValueError(f"{mv_table}: not an mv table (last op {op!r})")
    return int(op[len(_OP_PREFIX):])


def _delta_agg(delta: DataFrame, group_cols: list[str], measures: dict[str, str]) -> DataFrame:
    sign = F.when(F.col("_change") == "insert", F.lit(1)).otherwise(F.lit(-1))
    aggs = [F.sum(sign).cast("long").alias("_cnt")]
    for name, col in measures.items():
        aggs.append(
            F.sum(sign.cast(_DEC) * F.col(col).cast(_DEC)).cast(_DEC).alias(name)
        )
    return delta.groupBy(*group_cols).agg(*aggs)


def mv_refresh(
    spark: SparkSession,
    fact_table: str,
    mv_table: str,
    *,
    group_cols: list[str],
    measures: dict[str, str],
) -> int:
    """Fold the fact table's unapplied changes into the view; returns the
    fact version now reflected.  First call builds the view from the
    full fact table (there is no cheaper first build); later calls read
    only the change feed."""
    with table_lock(mv_table):
        applied = mv_last_applied(mv_table)
        v_now = current_version(fact_table)
        if v_now == applied:
            return applied
        if applied == 0:
            # pin the read to v_now: the fact lock is NOT held here, so a
            # concurrent fact commit between current_version() and the scan
            # would otherwise be baked into the view yet re-applied as a
            # delta on the next refresh (double count)
            delta = snapshot_read(spark, fact_table, version=v_now).withColumn(
                "_change", F.lit("insert")
            )
        else:
            delta = snapshot_diff(spark, fact_table, v_from=applied, v_to=v_now)
        _fold_and_commit(spark, delta, mv_table, group_cols, measures, applied, v_now)
        return v_now


def _fold_and_commit(
    spark: SparkSession,
    delta: DataFrame,
    mv_table: str,
    group_cols: list[str],
    measures: dict[str, str],
    applied: int,
    v_bookmark: int,
) -> None:
    """Fold a tagged row-level delta (``_change`` column) into the stored
    view and commit atomically with bookmark ``v_bookmark``.  Caller must
    hold the mv table lock."""
    d = _delta_agg(delta, group_cols, measures)
    if applied == 0:
        merged = d
    else:
        cur = snapshot_read(spark, mv_table)
        cur_r = cur.select(
            *[F.col(k).alias(f"{k}_a") for k in group_cols],
            F.col("_cnt").alias("_cnt_a"),
            *[F.col(m).alias(f"{m}_a") for m in measures],
        )
        d_r = d.select(
            *[F.col(k).alias(f"{k}_b") for k in group_cols],
            F.col("_cnt").alias("_cnt_b"),
            *[F.col(m).alias(f"{m}_b") for m in measures],
        )
        # NULL group keys are legitimate group values: join null-safely
        # (a USING join never equates NULL with NULL, which would leave
        # NULL-group rows unmerged forever)
        on_cond = None
        for k in group_cols:
            clause = F.col(f"{k}_a").eqNullSafe(F.col(f"{k}_b"))
            on_cond = clause if on_cond is None else (on_cond & clause)
        zero_l = F.lit(0).cast("long")
        zero_d = F.lit(0).cast(_DEC)
        merged = (
            cur_r.join(d_r, on_cond, "full_outer")
            .select(
                *[
                    F.when(F.col("_cnt_a").isNotNull(), F.col(f"{k}_a"))
                    .otherwise(F.col(f"{k}_b"))
                    .alias(k)
                    for k in group_cols
                ],
                (
                    F.coalesce("_cnt_a", zero_l) + F.coalesce("_cnt_b", zero_l)
                ).alias("_cnt"),
                *[
                    (
                        F.coalesce(f"{m}_a", zero_d) + F.coalesce(f"{m}_b", zero_d)
                    ).cast(_DEC).alias(m)
                    for m in measures
                ],
            )
        )
    merged = merged.filter(F.col("_cnt") > 0).localCheckpoint(eager=True)
    parent = current_version(mv_table)
    files = _write_data_files(merged, mv_table)
    # the view's rows are wholly rewritten each fold: replace-shaped commit
    # (schema recorded; additive-evolution validation is for FACT tables)
    _commit(
        mv_table,
        files,
        parent,
        f"{_OP_PREFIX}{v_bookmark}",
        batch_schema=[[n, t] for n, t in merged.dtypes],
        replace=True,
    )


def mv_apply_cdc_batch(
    batch_df: DataFrame,
    mv_table: str,
    *,
    group_cols: list[str],
    measures: dict[str, str],
) -> int:
    """Fold one CDC micro-batch (rows from the ``agf_snapshot_cdc``
    streaming source, tagged ``_change`` / ``_commit_version``) into the
    view — the ``foreachBatch`` body of the continuous CDC→MV pipeline
    (streaming/mv_stream.py).

    Exactly-once without relying on the streaming checkpoint alone: the
    view's own commit bookmark is the applied fact version, so a REPLAYED
    micro-batch (crash between the sink commit and the offset commit)
    filters to rows with ``_commit_version`` greater than the bookmark —
    already-applied versions contribute nothing and a fully-replayed
    batch is a no-op.  Returns the fact version the view now reflects.
    """
    spark = batch_df.sparkSession
    batch_df = batch_df.localCheckpoint(eager=True)
    with table_lock(mv_table):
        applied = mv_last_applied(mv_table)
        vmax = batch_df.agg(F.max("_commit_version").alias("v")).collect()[0]["v"]
        if vmax is None or vmax <= applied:
            return applied  # empty batch, or a full replay of applied work
        fresh = batch_df.filter(F.col("_commit_version") > applied)
        _fold_and_commit(spark, fresh, mv_table, group_cols, measures, applied, vmax)
        return vmax


def mv_read(spark: SparkSession, mv_table: str) -> DataFrame:
    """The current view contents."""
    return snapshot_read(spark, mv_table)
