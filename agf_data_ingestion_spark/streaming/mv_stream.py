"""Continuous CDC → materialized-view pipeline (r4): one streaming query
that tails a snapshot table's change feed and incrementally maintains an
additive-aggregate view — the Delta-CDF → streaming-agg composition, built
from the repo's own pieces (sources/snapshot_stream.py ×
operators/mv.py).

Why ``foreachBatch`` and not a built-in streaming aggregation: the view
must support DELETES (retractions), which append-mode streaming aggs
cannot express, and it must stay exactly equal to a full recompute at
every micro-batch — the signed decimal fold of ``mv_apply_cdc_batch``
gives both, and the view lands in a snapshot table (atomic commit, time
travel over view history) rather than a state store.

Delivery semantics are belt-and-braces: the streaming checkpoint replays
un-committed offsets after a crash, and the view's own commit bookmark
(applied fact version, moved in the same atomic manifest swap as the view
contents) makes any replay a no-op — exactly-once for the view without
trusting either mechanism alone.

At 100 TB: each trigger reads only the files the new commits added or
removed (manifest delta — an append of one batch to a 100 TB fact table
reads one batch), the fold is O(delta + view), and the fact table is
never rescanned after the first build.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from agf_data_ingestion_spark.operators.mv import mv_apply_cdc_batch


def start_mv_stream(
    spark: SparkSession,
    fact_table: str,
    mv_table: str,
    *,
    group_cols: list[str],
    measures: dict[str, str],
    checkpoint_dir: str,
    available_now: bool = False,
    processing_time: str = "1 seconds",
) -> StreamingQuery:
    """Start the continuous CDC→MV query.  ``available_now=True`` drains
    every committed-but-unapplied fact version and stops (the batch twin —
    backfill and steady-state tailing are the same code path); otherwise
    the query keeps tailing new commits at ``processing_time`` cadence.
    """
    from agf_data_ingestion_spark.sources.snapshot_stream import SnapshotCDCSource

    spark.dataSource.register(SnapshotCDCSource)
    cdc = (
        spark.readStream.format("agf_snapshot_cdc")
        .option("table", fact_table)
        .load()
    )

    def _apply(batch_df, _batch_id):
        mv_apply_cdc_batch(
            batch_df, mv_table, group_cols=group_cols, measures=measures
        )

    writer = cdc.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
