"""Manifest sources — batch and streaming views of the same data.

Reference behavior being re-expressed:

* event-triggered per-file processing with suffix routing
  (``eventbridge/event-rules.json:8-19,32-43`` — OP-SRC-EVENT,
  OP-FIL-SUFFIX) → Structured Streaming file source with
  ``pathGlobFilter``; each micro-batch sees exactly the new files.
* backfill replay (``scripts/backfill_s3_data.py``) → the *batch* reader
  over the same glob; Structured Streaming's unified model makes backfill
  the identical transform with a different source (SURVEY.md §3.3).
* per-record error isolation (``agf_ingestion_lambda.py:140-168``) →
  PERMISSIVE mode + ``_corrupt_record`` column instead of failing the job.

The readers attach provenance columns ``s3_key`` (lake-relative, i.e. the
path under the data root, matching the reference's bucket-relative keys)
and ``s3_bucket``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from agf_data_ingestion_spark.schemas import (
    CORRUPT_COL,
    EXPERIMENT_JSON_SCHEMA,
    RUN_JSON_SCHEMA,
)


def _with_provenance(df: DataFrame, root: str, bucket: str) -> DataFrame:
    # input_file_name() is an absolute file:// URI; strip the data root to
    # recover the bucket-relative key scheme raw/{instrument}/{Y}/{M}/{D}/...
    # (abspath so relative roots — e.g. CLI usage — strip correctly)
    import os as _os

    # strip the root by LENGTH, not regexp — a root containing regex
    # metacharacters ('+', '(', …) would otherwise corrupt the key or
    # error the pattern (ADVICE r1)
    prefix = "/" + _os.path.abspath(root).strip("/") + "/"
    key = F.regexp_replace(F.input_file_name(), "^file:/+", "/")
    # file URIs are PERCENT-encoded (OP-STR-URLDEC); url_decode is form
    # decoding ('+' → space), so shield literal '+' as %2B first
    key = F.url_decode(F.regexp_replace(key, "\\+", "%2B"))
    key = F.when(
        key.startswith(F.lit(prefix)), F.substring(key, len(prefix) + 1, 1 << 30)
    ).otherwise(key)
    return df.withColumn("s3_key", key).withColumn("s3_bucket", F.lit(bucket))


def _read(
    spark: SparkSession, root: str, glob: str, schema: StructType, bucket: str
) -> DataFrame:
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", glob)
        .json(root)
    )
    return _with_provenance(df, root, bucket)


def _stream(
    spark: SparkSession,
    root: str,
    glob: str,
    schema: StructType,
    bucket: str,
    max_files_per_trigger: int | None,
) -> DataFrame:
    reader = (
        spark.readStream.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", glob)
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return _with_provenance(reader.json(root), root, bucket)


def read_run_manifests(spark: SparkSession, root: str, bucket: str = "lake") -> DataFrame:
    return _read(spark, root, "*run.json", RUN_JSON_SCHEMA, bucket)


def read_experiment_manifests(spark: SparkSession, root: str, bucket: str = "lake") -> DataFrame:
    return _read(spark, root, "*experiment.json", EXPERIMENT_JSON_SCHEMA, bucket)


def stream_run_manifests(
    spark: SparkSession, root: str, bucket: str = "lake", max_files_per_trigger: int | None = None
) -> DataFrame:
    return _stream(spark, root, "*run.json", RUN_JSON_SCHEMA, bucket, max_files_per_trigger)


def stream_experiment_manifests(
    spark: SparkSession, root: str, bucket: str = "lake", max_files_per_trigger: int | None = None
) -> DataFrame:
    return _stream(
        spark, root, "*experiment.json", EXPERIMENT_JSON_SCHEMA, bucket, max_files_per_trigger
    )
