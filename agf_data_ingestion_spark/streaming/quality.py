"""Streaming data-quality gate: the expectations rule vocabulary
(operators/expectations.py) applied per micro-batch, with violating rows
routed to a quarantine table carrying the failed-rule diagnosis — the
generalization of the ingest path's required-field DLQ (OP-SINK-DLQ,
reference agf_ingestion_lambda.py's skip-and-log) to the full row-local
rule set.

Only ROW-LOCAL rules run here (evaluable on a record with no global
state), so a batch scan and a stream over the same data produce the
identical split — the engine's standing batch≡stream contract.  Global
rules keep their streaming-native counterparts: uniqueness →
``dropDuplicatesWithinWatermark`` (streaming/windowed.py), referential →
a join against the reference table inside foreachBatch.

Scale: the split is one map-only projection per batch (no shuffle); the
tagged frame is persisted for the batch so the two sink writes evaluate
the rules once.  Delivery is at-least-once per sink (two appends cannot
be one transaction on plain parquet): both sinks record ``_batch_id``,
so a replay after a partial failure is detectable and deduplicable
downstream (``dropDuplicates`` on (_batch_id, key) or an idempotent
upsert sink); the engine's exactly-once paths (snapshot commits,
upsert_append) remain available as sinks where that matters.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from agf_data_ingestion_spark.operators.expectations import split_by_expectations


def quality_batch_fn(rules: list[dict], good_path: str, quarantine_path: str):
    """foreachBatch function: split by the row-local rules, append passing
    rows to ``good_path`` and violating rows (with the ``_violated``
    diagnosis array and batch id) to ``quarantine_path``."""

    def fn(batch: DataFrame, batch_id: int) -> None:
        good, bad = split_by_expectations(batch, rules)
        good = good.withColumn("_batch_id", F.lit(batch_id).cast("long")).persist()
        bad = (
            bad.withColumn("_batch_id", F.lit(batch_id).cast("long"))
            .withColumn("_violated", F.array_join("_violated", ","))
            .persist()
        )
        try:
            good.write.mode("append").parquet(good_path)
            if bad.count() > 0:
                bad.write.mode("append").parquet(quarantine_path)
        finally:
            good.unpersist()
            bad.unpersist()

    return fn


def start_quality_stream(
    stream: DataFrame,
    rules: list[dict],
    out_dir: str,
    checkpoint: str,
    *,
    available_now: bool = False,
):
    """Attach the quality gate to a streaming DataFrame; returns the
    StreamingQuery.  Tables land under ``out_dir`` as ``accepted/`` and
    ``quarantine/``."""
    writer = (
        stream.writeStream.foreachBatch(
            quality_batch_fn(
                rules,
                os.path.join(out_dir, "accepted"),
                os.path.join(out_dir, "quarantine"),
            )
        ).option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
