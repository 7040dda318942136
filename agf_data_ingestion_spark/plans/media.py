"""Multimodal + export catalog entries (OP-X-MULTIMODAL, OP-UDF-ZIP,
OP-UDF-URL).

The documents table's text bytes stand in for media content (the container
ships no image/audio codecs — see operators/multimodal.py for the stub
policy).  The decode/featurize stubs are md5/sha256-derived, so even the
Arrow-batched ``mapInPandas`` paths are oracle-checkable: DuckDB recomputes
the same hashes in SQL.  Zip assembly is genuinely non-SQL-expressible →
rows-only check + pytest unzip round-trip (tests/test_media.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from agf_data_ingestion_spark.operators.export import export_zip_groups, presigned_url
from agf_data_ingestion_spark.operators.multimodal import (
    attach_media,
    decode_image_meta,
    extract_features,
    sample_frames,
)
from agf_data_ingestion_spark.plans.base import QuerySpec, t

_FEAT_DIM = 16


def _media_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    return attach_media(
        d.select("doc_id", "text"),
        path=F.concat(F.lit("media/doc_"), F.col("doc_id"), F.lit(".png")),
        mime=F.lit("image/png"),
        content=F.encode("text", "UTF-8"),
    ).drop("text")


def docs_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decode_image_meta(_media_docs(spark, sf_dir)).select(
        "doc_id", "path", "mime", "size_bytes", "width", "height", "n_channels"
    )


_MULTIMODAL_META_SQL = """
SELECT doc_id,
       'media/doc_' || CAST(doc_id AS VARCHAR) || '.png' AS path,
       'image/png' AS mime,
       CAST(length(text) AS BIGINT) AS size_bytes,
       1 + ('0x' || substr(md5(text), 1, 4))::BIGINT % 1024 AS width,
       1 + ('0x' || substr(md5(text), 5, 4))::BIGINT % 1024 AS height,
       CAST(3 AS BIGINT) AS n_channels
FROM documents
"""


def docs_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = extract_features(_media_docs(spark, sf_dir), dim=_FEAT_DIM)
    cols = [
        F.element_at("features", i + 1).cast("double").alias(f"f{i}") for i in range(_FEAT_DIM)
    ]
    return feats.select("doc_id", *cols)


_MEDIA_FEATURES_SQL = "SELECT doc_id, " + ", ".join(
    # (uint16 - 32768)/32768 is a dyadic rational with <= 16 significant
    # bits -> exact in FLOAT, so no cross-engine rounding gap exists.
    f"(('0x' || substr(sha256(text), {4 * i + 1}, 4))::BIGINT - 32768) / 32768.0 AS f{i}"
    for i in range(_FEAT_DIM)
) + " FROM documents"


def docs_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sample_frames(_media_docs(spark, sf_dir), every_n_bytes=64, max_frames=8)


_FRAME_SAMPLES_SQL = """
SELECT 'media/doc_' || CAST(doc_id AS VARCHAR) || '.png' AS path,
       CAST(i AS BIGINT) AS frame_index,
       CAST(i * 64 AS BIGINT) AS byte_offset
FROM documents, unnest(range(0, least(8, length(text) // 64 + 1))) AS u(i)
"""


def docs_presigned_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    key = F.concat(F.lit("exports/doc_"), F.col("doc_id"), F.lit(".txt"))
    return d.select(
        "doc_id", presigned_url(F.lit("agf-lake"), key).alias("url")
    )


_PRESIGNED_SQL = """
SELECT doc_id,
       'https://agf-lake.s3.example/exports/doc_' || CAST(doc_id AS VARCHAR)
         || '.txt?X-Amz-Expires=3600&X-Amz-Signature='
         || substr(md5('agf-lake' || '|' || 'exports/doc_' || CAST(doc_id AS VARCHAR)
                       || '.txt' || '|' || '3600'), 1, 16) AS url
FROM documents
"""


def docs_export_zip(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    return export_zip_groups(
        d,
        group=F.col("source"),
        path=F.concat(F.lit("docs/doc_"), F.col("doc_id"), F.lit(".txt")),
        content=F.encode("text", "UTF-8"),
    )


QUERIES: dict[str, QuerySpec] = {
    "docs_multimodal_meta": QuerySpec(
        docs_multimodal_meta, _MULTIMODAL_META_SQL, ("OP-X-MULTIMODAL",)
    ),
    "docs_media_features": QuerySpec(
        docs_media_features, _MEDIA_FEATURES_SQL, ("OP-X-MULTIMODAL", "OP-X-SIM-TOPK")
    ),
    "docs_frame_samples": QuerySpec(
        docs_frame_samples, _FRAME_SAMPLES_SQL, ("OP-X-MULTIMODAL",)
    ),
    "docs_presigned_urls": QuerySpec(docs_presigned_urls, _PRESIGNED_SQL, ("OP-UDF-URL",)),
    "docs_export_zip": QuerySpec(docs_export_zip, None, ("OP-UDF-ZIP", "OP-SINK-FILE", "OP-FIL-SIZE", "OP-WIN-DEDUPNAME")),
}
