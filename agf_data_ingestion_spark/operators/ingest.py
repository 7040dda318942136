"""Manifest → table transforms (the heart of the ingest pipeline).

Each function is a pure DataFrame → DataFrame transform, so the same code
runs in batch (backfill — reference ``scripts/backfill_s3_data.py``) and
under Structured Streaming ``foreachBatch`` (event ingest — reference
``lambda/agf_ingestion_lambda.py``). All derivations are single-Project
column expressions (whole-stage codegen; no Python in the hot path); the
only wide operation in the whole ingest path is the idempotent-sink
anti-join (operators/upsert.py).

Reference parity:
* run.json   → sync_runs        (``agf_ingestion_lambda.py:179-236``)
* run.json   → file_inventory   (``:238-252, 348-417``) — explode
* exp.json   → experiments      (``:257-310``)
* exp.json   → file_inventory   (``:312-345, 420-454``) — explode
* record-level error isolation  (``:140-168``) → quarantine split
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from agf_data_ingestion_spark.functions.checksums import normalize_checksum
from agf_data_ingestion_spark.functions.paths import (
    basename,
    dirname,
    file_extension,
    is_valid_raw_key,
    path_segment,
    payload_s3_key,
    synth_experiment_id,
)
from agf_data_ingestion_spark.functions.timestamps import now_column, parse_iso_timestamp
from agf_data_ingestion_spark.schemas import CORRUPT_COL


def split_valid(df: DataFrame, *, required: list[str]) -> tuple[DataFrame, DataFrame]:
    """Quarantine split (OP-SINK-DLQ / OP-STRM-ERR).

    A row is quarantined when it failed JSON parsing (corrupt-record column
    set), its key fails structural validation (reference :148-153), or a
    required field is missing (the reference's ``KeyError`` sites).
    Returns (valid, quarantined); neither side fails the batch.
    """
    checks = is_valid_raw_key(F.col("s3_key"))
    if CORRUPT_COL in df.columns:
        checks = checks & F.col(CORRUPT_COL).isNull()
    for c in required:
        checks = checks & F.col(c).isNotNull()
    flagged = df.withColumn("_valid", checks)
    valid = flagged.filter("_valid").drop("_valid")
    bad = flagged.filter(~F.col("_valid")).drop("_valid")
    return valid, bad


def _run_path_fields(key: Column) -> list[Column]:
    # raw/{instrument}/{YYYY}/{MM}/{DD}/{run_id}/run.json  (reference :187-191)
    return [
        path_segment(key, 2).alias("instrument_id"),
        path_segment(key, 3).alias("_year"),
        path_segment(key, 4).alias("_month"),
        path_segment(key, 5).alias("_day"),
        path_segment(key, 6).alias("run_id"),
    ]


def sync_runs_from_run_manifests(
    runs: DataFrame, *, strict: bool = False, now: _dt.datetime | None = None
) -> DataFrame:
    """run.json documents → sync_runs rows (reference :179-236).

    ``runs`` comes from sources.manifests.read_run_manifests (or the stream
    variant): one row per manifest with provenance columns.
    """
    key = F.col("s3_key")
    manifest_sum = F.aggregate(
        F.col("file_manifest"),
        F.lit(0).cast("long"),
        lambda acc, f: acc + F.coalesce(f["size"], F.lit(0)),
    )
    return runs.select(
        *_run_path_fields(key),
        F.col("computer_name"),
        parse_iso_timestamp(F.col("sync_timestamp"), strict=strict, now=now).alias(
            "sync_timestamp"
        ),
        F.col("files_in_batch").alias("files_count"),
        # total_bytes: explicit value, else folded from the manifest, else 0
        # (reference :205-207 sums over .get('file_manifest', []))
        F.coalesce(F.col("total_size_bytes"), manifest_sum, F.lit(0).cast("long")).alias(
            "total_bytes"
        ),
        # staff list = keys of the files_by_staff map (reference :219)
        F.coalesce(F.map_keys("files_by_staff"), F.array().cast("array<string>")).alias(
            "staff_names"
        ),
        key.alias("s3_key"),
        F.col("s3_bucket"),
    ).select(
        "run_id",
        "instrument_id",
        "computer_name",
        "sync_timestamp",
        # try_to_date: segments 3-5 are validated as DIGITS, not as a real
        # calendar date — under Spark 4 ANSI, to_date on '2024-13-45'
        # would throw and kill the whole micro-batch, violating the
        # record-isolation contract (a bad key costs one null date, never
        # the batch)
        F.try_to_date(F.concat_ws("-", "_year", "_month", "_day"), "y-M-d").alias(
            "date"
        ),
        "files_count",
        "total_bytes",
        "staff_names",
        "s3_key",
        "s3_bucket",
        F.lit("completed").alias("processing_status"),
        now_column(now).alias("processed_at"),
    )


def file_inventory_from_run_manifests(
    runs: DataFrame, *, strict: bool = False, now: _dt.datetime | None = None
) -> DataFrame:
    """run.json manifests → file_inventory rows (OP-EXPLODE-RUN).

    ``explode`` unnests the ``file_manifest`` array (reference loop
    :238-252); every scalar derivation of ``build_file_record`` (:348-417)
    is a column expression. Rows with invalid checksums get NULL
    ``checksum_sha256`` — split them with ``quarantine_bad_checksums``
    (the reference raises per-file instead; quarantining is the
    record-isolation equivalent).
    """
    key = F.col("s3_key")
    exploded = runs.select(
        *_run_path_fields(key),
        key.alias("_run_json_key"),
        F.col("s3_bucket"),
        F.explode("file_manifest").alias("f"),
    )
    path = F.col("f.path")
    parts = F.split(path, "/")
    staff = F.coalesce(F.col("f.staff_name"), F.element_at(parts, 1))
    fname = basename(path)
    return exploded.select(
        synth_experiment_id(path, staff, F.col("run_id")).alias("experiment_id"),
        path.alias("file_path"),
        fname.alias("file_name"),
        payload_s3_key(F.col("_run_json_key"), path).alias("s3_key"),
        F.col("s3_bucket"),
        F.col("f.size").alias("file_size_bytes"),
        file_extension(fname).alias("file_type"),
        normalize_checksum(F.col("f.checksum")).alias("checksum_sha256"),
        now_column(now).alias("uploaded_at"),
        parse_iso_timestamp(F.col("f.file_date"), strict=strict, now=now).alias("modified_at"),
        F.col("run_id"),
        staff.alias("staff_name"),
        F.col("instrument_id"),
        F.coalesce(F.col("f.is_update"), F.lit(False)).alias("is_update"),
    )


def experiments_from_manifests(
    exps: DataFrame, *, strict: bool = False, now: _dt.datetime | None = None
) -> DataFrame:
    """experiment.json documents → experiments rows (reference :257-310).

    The ``(experiment_id, last_updated)`` composite key makes this table an
    append-only version history: re-sync with a newer ``last_updated``
    creates a new version row rather than overwriting (SURVEY.md §1.1).
    """
    return exps.select(
        F.col("experiment_id"),
        parse_iso_timestamp(F.col("last_updated"), strict=strict, now=now).alias("last_updated"),
        F.col("experiment_folder"),
        F.col("staff_name"),
        F.col("instrument").alias("instrument_id"),
        F.col("computer").alias("computer_name"),
        parse_iso_timestamp(F.col("created"), strict=strict, now=now).alias("created_at"),
        F.coalesce(F.col("update_count"), F.lit(1).cast("long")).alias("update_count"),
        F.col("file_count"),
        F.col("total_size_bytes").alias("total_bytes"),
        F.col("s3_location"),
        F.col("s3_key").alias("s3_experiment_json_key"),
        F.col("s3_bucket"),
        F.coalesce(F.col("auto_detected"), F.lit(True)).alias("auto_detected"),
        F.coalesce(F.col("sync_version"), F.lit("1.0")).alias("sync_version"),
        F.col("parameters"),
    )


def file_inventory_from_experiment_manifests(
    exps: DataFrame, *, strict: bool = False, now: _dt.datetime | None = None
) -> DataFrame:
    """experiment.json ``files`` array → file_inventory rows (OP-EXPLODE-EXP,
    reference :312-345, 420-454)."""
    key = F.col("s3_key")
    exploded = exps.select(
        F.col("experiment_id"),
        F.col("staff_name"),
        F.col("instrument").alias("instrument_id"),
        key.alias("_exp_json_key"),
        F.col("s3_bucket"),
        F.explode("files").alias("f"),
    )
    fname = F.col("f.name")
    return exploded.select(
        F.col("experiment_id"),
        F.col("f.relative_path").alias("file_path"),
        fname.alias("file_name"),
        # exp-relative files live next to experiment.json (reference
        # :429-431) — the shared dirname() helper, not an inline regex (a
        # slash-less key must yield '' like os.path.dirname, not pass
        # through unchanged)
        F.concat_ws(
            "/", dirname(F.col("_exp_json_key")), F.col("f.relative_path")
        ).alias("s3_key"),
        F.col("s3_bucket"),
        F.col("f.size").alias("file_size_bytes"),
        file_extension(fname).alias("file_type"),
        normalize_checksum(F.col("f.checksum")).alias("checksum_sha256"),
        now_column(now).alias("uploaded_at"),
        parse_iso_timestamp(F.col("f.modified"), strict=strict, now=now).alias("modified_at"),
        # placeholder run linkage, enriched later by OP-JOIN-ENRICH
        # (reference :453 'from_experiment_json')
        F.lit("from_experiment_json").alias("run_id"),
        F.col("staff_name"),
        F.col("instrument_id"),
        # the reference's experiment-file record carries no is_update
        # attribute (:440-454) — absent ⇒ NULL
        F.lit(None).cast("boolean").alias("is_update"),
    )


def quarantine_bad_checksums(inventory: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split file rows on checksum validity (reference raises at :410/:448)."""
    ok = inventory.filter(F.col("checksum_sha256").isNotNull())
    bad = inventory.filter(F.col("checksum_sha256").isNull())
    return ok, bad


def enrich_experiment_files_with_run(
    exp_files: DataFrame, run_files: DataFrame
) -> DataFrame:
    """OP-JOIN-ENRICH: resolve the 'from_experiment_json' run_id placeholder
    by joining run-manifest file rows on the physical key (reference :453
    documents the intent; the reference never implements it — here it is a
    single equi-join)."""
    # deterministic winner for a key tracked under multiple run_ids (a
    # re-synced file): min(run_id) — dropDuplicates would keep a
    # partition-order-dependent row (CLAUDE.md unique-tiebreaker rule)
    run_ids = (
        run_files.select(F.col("s3_key").alias("_k"), F.col("run_id"))
        .groupBy("_k")
        .agg(F.min("run_id").alias("_run_id"))
    )
    return (
        exp_files.join(run_ids, exp_files["s3_key"] == run_ids["_k"], "left")
        .withColumn("run_id", F.coalesce(F.col("_run_id"), F.col("run_id")))
        .drop("_k", "_run_id")
    )
