"""Explicit schemas for every input document and output table.

The reference enforces schema dynamically (KeyError on required fields,
``.get()`` defaults on optional ones — reference
``lambda/agf_ingestion_lambda.py:214,287,292-293``). Here every schema is a
declared ``StructType`` so scans never infer, corrupt records are isolated
into ``_corrupt_record`` instead of failing a batch, and Parquet layouts are
stable across rounds.

Input documents:   FIXTURES.md §2-3 (run.json / experiment.json).
Output tables:     SURVEY.md §1.4 (sync_runs / experiments / file_inventory).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DateType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

CORRUPT_COL = "_corrupt_record"

# --------------------------------------------------------------------------
# Input manifest documents
# --------------------------------------------------------------------------

# run.json (reference agf_ingestion_lambda.py:202-224, 348-417)
FILE_MANIFEST_ENTRY = StructType(
    [
        StructField("path", StringType(), True),        # required at :361
        StructField("size", LongType(), True),          # required at :408
        StructField("checksum", StringType(), True),    # required at :410
        StructField("file_date", StringType(), True),   # optional :396
        StructField("staff_name", StringType(), True),  # optional :364
        StructField("is_update", BooleanType(), True),  # optional :416
    ]
)

RUN_JSON_SCHEMA = StructType(
    [
        StructField("sync_timestamp", StringType(), True),      # optional :202
        StructField("computer_name", StringType(), True),       # required :214
        StructField("files_in_batch", LongType(), True),        # required :217
        StructField("total_size_bytes", LongType(), True),      # optional :205
        StructField("files_by_staff", MapType(StringType(), LongType()), True),  # :219
        StructField("file_manifest", ArrayType(FILE_MANIFEST_ENTRY), True),      # :239
        StructField(CORRUPT_COL, StringType(), True),
    ]
)

# experiment.json (reference agf_ingestion_lambda.py:274-298, 420-454)
EXPERIMENT_FILE_ENTRY = StructType(
    [
        StructField("relative_path", StringType(), True),  # required :431
        StructField("name", StringType(), True),           # required :437
        StructField("size", LongType(), True),             # required :446
        StructField("checksum", StringType(), True),       # required :448
        StructField("modified", StringType(), True),       # optional :434
    ]
)

EXPERIMENT_JSON_SCHEMA = StructType(
    [
        StructField("experiment_id", StringType(), True),     # required :279
        StructField("created", StringType(), True),           # optional :274
        StructField("last_updated", StringType(), True),      # optional :275
        StructField("experiment_folder", StringType(), True),  # required :281
        StructField("staff_name", StringType(), True),        # required :282
        StructField("instrument", StringType(), True),        # required :283
        StructField("computer", StringType(), True),          # required :284
        StructField("update_count", LongType(), True),        # optional, default 1 :287
        StructField("file_count", LongType(), True),          # required :287
        StructField("total_size_bytes", LongType(), True),    # required :288
        StructField("s3_location", StringType(), True),       # required :289
        StructField("auto_detected", BooleanType(), True),    # optional, default true :292
        StructField("sync_version", StringType(), True),      # optional, default '1.0' :293
        StructField("parameters", MapType(StringType(), StringType()), True),  # :297
        StructField("files", ArrayType(EXPERIMENT_FILE_ENTRY), True),          # :314
        StructField(CORRUPT_COL, StringType(), True),
    ]
)

# --------------------------------------------------------------------------
# Output tables (the engine's catalog — SURVEY.md §1.4)
# --------------------------------------------------------------------------

SYNC_RUNS_SCHEMA = StructType(
    [
        StructField("run_id", StringType(), False),
        StructField("instrument_id", StringType(), False),
        StructField("computer_name", StringType(), True),
        StructField("sync_timestamp", TimestampType(), True),
        StructField("date", DateType(), True),
        StructField("files_count", LongType(), True),
        StructField("total_bytes", LongType(), True),
        StructField("staff_names", ArrayType(StringType()), True),
        StructField("s3_key", StringType(), True),
        StructField("s3_bucket", StringType(), True),
        StructField("processing_status", StringType(), True),
        StructField("processed_at", TimestampType(), True),
    ]
)
SYNC_RUNS_KEYS = ["run_id", "instrument_id"]  # reference :227-229

EXPERIMENTS_SCHEMA = StructType(
    [
        StructField("experiment_id", StringType(), False),
        StructField("last_updated", TimestampType(), False),
        StructField("experiment_folder", StringType(), True),
        StructField("staff_name", StringType(), True),
        StructField("instrument_id", StringType(), True),
        StructField("computer_name", StringType(), True),
        StructField("created_at", TimestampType(), True),
        StructField("update_count", LongType(), True),
        StructField("file_count", LongType(), True),
        StructField("total_bytes", LongType(), True),
        StructField("s3_location", StringType(), True),
        StructField("s3_experiment_json_key", StringType(), True),
        StructField("s3_bucket", StringType(), True),
        StructField("auto_detected", BooleanType(), True),
        StructField("sync_version", StringType(), True),
        StructField("parameters", MapType(StringType(), StringType()), True),
    ]
)
EXPERIMENTS_KEYS = ["experiment_id", "last_updated"]  # reference :300-304

FILE_INVENTORY_SCHEMA = StructType(
    [
        StructField("experiment_id", StringType(), False),
        StructField("file_path", StringType(), False),
        StructField("file_name", StringType(), True),
        StructField("s3_key", StringType(), True),
        StructField("s3_bucket", StringType(), True),
        StructField("file_size_bytes", LongType(), True),
        StructField("file_type", StringType(), True),
        StructField("checksum_sha256", StringType(), True),
        StructField("uploaded_at", TimestampType(), True),
        StructField("modified_at", TimestampType(), True),
        StructField("run_id", StringType(), True),
        StructField("staff_name", StringType(), True),
        StructField("instrument_id", StringType(), True),
        StructField("is_update", BooleanType(), True),
    ]
)
FILE_INVENTORY_KEYS = ["experiment_id", "file_path"]  # reference :333-341

# Columns that partition the output tables on disk. Date-based partitioning
# mirrors the reference's raw/{instrument}/{Y}/{M}/{D} key scheme and gives
# partition pruning to every time-window query (OP-FIL-TIME).
SYNC_RUNS_PARTITIONING = ["date"]
FILE_INVENTORY_PARTITIONING = ["instrument_id"]
