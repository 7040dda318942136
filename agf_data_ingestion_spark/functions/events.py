"""Object-store event normalization (OP-JSON-NORM).

The reference accepts two event shapes — EventBridge (``event['detail']
['bucket']['name']``/``['object']['key']``) and direct S3 notification
(``event['Records'][N]['s3']...``) — and normalizes both to (bucket, key)
with URL-decoding (reference ``lambda/agf_ingestion_lambda.py:124-144``;
synthetic Records events built by ``scripts/backfill_s3_data.py:62-82``).

Here that is a permissive schema + a single projection: both shapes parse
into one struct column and ``coalesce`` picks whichever side is present.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

_S3_REF = StructType(
    [
        StructField("bucket", StructType([StructField("name", StringType())])),
        StructField("object", StructType([StructField("key", StringType())])),
    ]
)

# Both event families in one permissive schema.
OBJECT_EVENT_SCHEMA = StructType(
    [
        StructField("detail", _S3_REF, True),
        StructField(
            "Records",
            ArrayType(StructType([StructField("s3", _S3_REF, True)])),
            True,
        ),
    ]
)




def _safe_url_decode(c):
    """Never-raising URL decode (reference unquote_plus semantics, :144):
    ``url_decode`` THROWS on malformed %-sequences — one object named
    '100% done.csv' would kill the whole batch — so invalid escapes fall
    back to the raw key via try_url_decode + coalesce."""
    return F.coalesce(F.try_url_decode(c), c)


def normalize_object_events(raw: DataFrame) -> DataFrame:
    """``raw`` has OBJECT_EVENT_SCHEMA columns; returns (s3_bucket, s3_key).

    EventBridge events carry one object; Records events may carry many, so
    the Records side explodes. Keys are URL-decoded ('+' → space included),
    matching ``unquote_plus`` at reference :144.
    """
    eb = raw.filter(F.col("detail").isNotNull()).select(
        F.col("detail.bucket.name").alias("s3_bucket"),
        _safe_url_decode(F.col("detail.object.key")).alias("s3_key"),
    )
    recs = (
        raw.filter(F.col("detail").isNull() & F.col("Records").isNotNull())
        .select(F.explode("Records").alias("r"))
        .select(
            F.col("r.s3.bucket.name").alias("s3_bucket"),
            _safe_url_decode(F.col("r.s3.object.key")).alias("s3_key"),
        )
    )
    return eb.unionByName(recs)
