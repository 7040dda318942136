"""Streaming PII scrub: the functions/pii.py redaction applied to a
document stream at ingest time (OP-X-PII's continuous form).

The scrub is a pure row-local column projection (no state, no window,
no join), so the SAME transform function runs unchanged on a batch
frame and a streaming frame — the engine's standing batch≡stream
contract, here in its strongest form: Structured Streaming accepts the
projection natively (no foreachBatch needed for the transform itself),
and batch-chopping cannot change any output row.

Scale: per micro-batch this is one map-only whole-stage-codegen pass —
the scrub adds zero stage boundaries to an ingest stream, so a corpus
can be scrubbed at the rate it lands.  The sink records ``_batch_id``
for at-least-once replay detection (same discipline as
streaming/quality.py); exactly-once sinks (snapshot commits with the
batch id as the commit op, cf. streaming/ann_stream.py) compose where
required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from agf_data_ingestion_spark.functions.pii import pii_counts, scrub_pii


def scrub_transform(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Batch≡stream scrub projection: replaces ``text_col`` with its
    redacted form and adds per-category audit counts (the source-level
    filtering metric).  Works on any frame carrying ``text_col``."""
    c = pii_counts(text_col)
    return df.withColumns(
        {
            text_col: scrub_pii(text_col),
            "pii_emails": c["emails"].cast("long"),
            "pii_phones": c["phones"].cast("long"),
            "pii_ips": c["ips"].cast("long"),
        }
    )


def start_scrub_stream(
    stream: DataFrame,
    out_path: str,
    checkpoint: str,
    *,
    text_col: str = "text",
    available_now: bool = False,
):
    """Attach the scrub to a streaming DataFrame and append to parquet;
    returns the StreamingQuery."""
    # _batch_id is stamped in foreachBatch (the native writer has no
    # batch-id column hook); the transform itself is stream-native

    def _fn(batch: DataFrame, batch_id: int) -> None:
        scrub_transform(batch, text_col).withColumn(
            "_batch_id", F.lit(batch_id).cast("long")
        ).write.mode("append").parquet(out_path)

    writer = stream.writeStream.foreachBatch(_fn).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
