"""Ingest-domain parity queries: the reference pipeline's transforms
(manifest → sync_runs / experiments / file_inventory, quarantine, audit)
run end-to-end over the committed fixture lake (``fixtures/data/lake``) and
checked against DuckDB ``read_json`` oracles that re-derive every column
with the same semantics.

These queries ignore ``sf_dir`` — the subject under test is the manifest
pipeline itself (reference ``lambda/agf_ingestion_lambda.py``), not the
TPC-H-ish tables.  "now" is pinned (SURVEY.md §7 determinism risk) so the
lenient-timestamp fallback and processing-time stamps are reproducible.

Output formatting for cross-engine hashing: DATE → 'yyyy-MM-dd' strings,
ARRAY/MAP → sorted joined strings (pandas represents Spark and DuckDB
nested values differently; strings are representation-proof).
"""

from __future__ import annotations

import datetime as _dt
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from agf_data_ingestion_spark.operators.ingest import (
    experiments_from_manifests,
    file_inventory_from_experiment_manifests,
    file_inventory_from_run_manifests,
    quarantine_bad_checksums,
    split_valid,
    sync_runs_from_run_manifests,
)
from agf_data_ingestion_spark.plans.base import QuerySpec
from agf_data_ingestion_spark.sources.manifests import (
    read_experiment_manifests,
    read_run_manifests,
)

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
LAKE = os.path.join(_REPO_ROOT, "fixtures", "data", "lake")
NOW = _dt.datetime(2024, 6, 1)

# --- DuckDB twins of the scalar layer -------------------------------------

#: lenient ISO-8601 parse with pinned-now fallback (functions/timestamps.py)
_O_LENIENT = (
    "COALESCE(TRY_CAST(regexp_replace(trim({x}), 'Z$', '+00:00') AS TIMESTAMP),"
    " TIMESTAMP '2024-06-01')"
)
#: checksum normalize (functions/checksums.py — replace ALL 'sha256:' then validate)
_O_CHECKSUM = (
    "CASE WHEN regexp_matches(trim(replace({x}, 'sha256:', '')), '^[a-fA-F0-9]{{64}}$')"
    " THEN lower(trim(replace({x}, 'sha256:', ''))) END"
)

_RUN_COLS = (
    "{sync_timestamp: 'VARCHAR', computer_name: 'VARCHAR', files_in_batch: 'BIGINT', "
    "total_size_bytes: 'BIGINT', files_by_staff: 'MAP(VARCHAR, BIGINT)', "
    "file_manifest: 'STRUCT(path VARCHAR, size BIGINT, checksum VARCHAR, file_date VARCHAR, "
    "staff_name VARCHAR, is_update BOOLEAN)[]'}"
)
_EXP_COLS = (
    "{experiment_id: 'VARCHAR', created: 'VARCHAR', last_updated: 'VARCHAR', "
    "experiment_folder: 'VARCHAR', staff_name: 'VARCHAR', instrument: 'VARCHAR', "
    "computer: 'VARCHAR', update_count: 'BIGINT', file_count: 'BIGINT', "
    "total_size_bytes: 'BIGINT', s3_location: 'VARCHAR', auto_detected: 'BOOLEAN', "
    "sync_version: 'VARCHAR', parameters: 'MAP(VARCHAR, VARCHAR)', "
    "files: 'STRUCT(relative_path VARCHAR, name VARCHAR, size BIGINT, checksum VARCHAR, "
    "modified VARCHAR)[]'}"
)

_O_RUNS_SRC = (
    f"SELECT *, replace(filename, '{LAKE}/', '') AS s3_key, 'lake' AS s3_bucket "
    f"FROM read_json('{LAKE}/raw/**/run.json', columns = {_RUN_COLS}, filename = true)"
)
_O_EXPS_SRC = (
    f"SELECT *, replace(filename, '{LAKE}/', '') AS s3_key, 'lake' AS s3_bucket "
    f"FROM read_json('{LAKE}/raw/**/experiment.json', columns = {_EXP_COLS}, filename = true)"
)


# ---------------------------------------------------------------------------
# run.json → sync_runs (OP-SRC-JSON, OP-STR-SPLITPATH, OP-DATE-*, OP-MAP-KEYS,
#                       OP-ARR-SUM, OP-COALESCE)
# ---------------------------------------------------------------------------


def ingest_sync_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    runs = read_run_manifests(spark, LAKE)
    valid, _ = split_valid(runs, required=["computer_name", "files_in_batch"])
    out = sync_runs_from_run_manifests(valid, now=NOW)
    return out.select(
        "run_id",
        "instrument_id",
        "computer_name",
        "sync_timestamp",
        F.date_format("date", "yyyy-MM-dd").alias("date_str"),
        "files_count",
        "total_bytes",
        F.array_join(F.array_sort("staff_names"), ",").alias("staff_csv"),
        "s3_key",
        "s3_bucket",
        "processing_status",
        "processed_at",
    )



#: DuckDB twin of split_valid's structural + required-field predicate for
#: run manifests (paths.is_valid_raw_key + computer_name/files_in_batch):
#: fixtures are always valid today, but the oracle must apply the SAME
#: gate as the Spark side or a single malformed manifest in a regenerated
#: lake would pass the oracle while Spark quarantines it.  (Corrupt-JSON
#: quarantining has no read_json counterpart — DuckDB would error on a
#: truly unparseable file; documented limitation.)
_O_VALID_RUN = (
    "s3_key LIKE 'raw/%' AND len(string_split(s3_key, '/')) >= 6"
    " AND regexp_matches(string_split(s3_key, '/')[3], '^[0-9]+$')"
    " AND regexp_matches(string_split(s3_key, '/')[4], '^[0-9]+$')"
    " AND regexp_matches(string_split(s3_key, '/')[5], '^[0-9]+$')"
    " AND computer_name IS NOT NULL AND files_in_batch IS NOT NULL"
)
_O_VALID_EXP = (
    "s3_key LIKE 'raw/%' AND len(string_split(s3_key, '/')) >= 6"
    " AND regexp_matches(string_split(s3_key, '/')[3], '^[0-9]+$')"
    " AND regexp_matches(string_split(s3_key, '/')[4], '^[0-9]+$')"
    " AND regexp_matches(string_split(s3_key, '/')[5], '^[0-9]+$')"
    " AND experiment_id IS NOT NULL AND staff_name IS NOT NULL"
)

_SYNC_RUNS_SQL = f"""
WITH src AS ({_O_RUNS_SRC}),
parts AS (SELECT *, string_split(s3_key, '/') AS seg FROM src WHERE {_O_VALID_RUN})
SELECT seg[6] AS run_id,
       seg[2] AS instrument_id,
       computer_name,
       {_O_LENIENT.format(x='sync_timestamp')} AS sync_timestamp,
       strftime(try_strptime(seg[3] || '-' || seg[4] || '-' || seg[5], '%Y-%m-%d'),
                '%Y-%m-%d') AS date_str,
       files_in_batch AS files_count,
       COALESCE(total_size_bytes,
                CAST(list_sum(list_transform(COALESCE(file_manifest, []), f -> COALESCE(f.size, 0))) AS BIGINT),
                0) AS total_bytes,
       CASE WHEN files_by_staff IS NULL THEN ''
            ELSE array_to_string(list_sort(map_keys(files_by_staff)), ',') END AS staff_csv,
       s3_key,
       s3_bucket,
       'completed' AS processing_status,
       TIMESTAMP '2024-06-01' AS processed_at
FROM parts
"""


# ---------------------------------------------------------------------------
# run.json → file_inventory (OP-EXPLODE-RUN + the full scalar layer)
# ---------------------------------------------------------------------------


def ingest_file_inventory_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    runs = read_run_manifests(spark, LAKE)
    valid, _ = split_valid(runs, required=["computer_name", "files_in_batch"])
    return file_inventory_from_run_manifests(valid, now=NOW)


_FILE_INV_RUN_SQL = f"""
WITH src AS ({_O_RUNS_SRC}),
ex AS (
  SELECT s3_key AS run_json_key, s3_bucket,
         string_split(s3_key, '/') AS seg,
         unnest(file_manifest) AS f
  FROM src WHERE {_O_VALID_RUN}
),
d AS (
  SELECT *,
         string_split(f.path, '/') AS p,
         COALESCE(f.staff_name, string_split(f.path, '/')[1]) AS staff,
         string_split(f.path, '/')[-1] AS fname,
         regexp_replace(run_json_key, '/[^/]*$', '') AS run_dir
  FROM ex
)
SELECT CASE WHEN len(p) >= 2 AND p[2] != p[-1] THEN p[2] || '_' || staff
            ELSE 'standalone_' || COALESCE(staff, 'None') || '_'
                 || COALESCE(seg[6], 'None') END AS experiment_id,
       f.path AS file_path,
       fname AS file_name,
       run_dir || '/' ||
         CASE WHEN len(p) > 1 THEN p[1] || '/payload/' || array_to_string(p[2:], '/')
              ELSE p[1] || '/payload/' || fname END AS s3_key,
       s3_bucket,
       f.size AS file_size_bytes,
       CASE WHEN contains(fname, '.') THEN lower(string_split(fname, '.')[-1])
            ELSE 'unknown' END AS file_type,
       {_O_CHECKSUM.format(x='f.checksum')} AS checksum_sha256,
       TIMESTAMP '2024-06-01' AS uploaded_at,
       {_O_LENIENT.format(x='f.file_date')} AS modified_at,
       seg[6] AS run_id,
       staff AS staff_name,
       seg[2] AS instrument_id,
       COALESCE(f.is_update, false) AS is_update
FROM d
"""


# ---------------------------------------------------------------------------
# experiment.json → experiments (versioned table; OP-COALESCE defaults)
# ---------------------------------------------------------------------------


def ingest_experiments(spark: SparkSession, sf_dir: str) -> DataFrame:
    exps = read_experiment_manifests(spark, LAKE)
    valid, _ = split_valid(exps, required=["experiment_id", "staff_name"])
    out = experiments_from_manifests(valid, now=NOW)
    params_csv = F.array_join(
        F.array_sort(
            F.transform(
                F.map_entries(F.coalesce(F.col("parameters"), F.map_from_arrays(F.array(), F.array()))),
                lambda e: F.concat_ws("=", e["key"], e["value"]),
            )
        ),
        ",",
    )
    return out.select(
        "experiment_id",
        "last_updated",
        "experiment_folder",
        "staff_name",
        "instrument_id",
        "computer_name",
        "created_at",
        "update_count",
        "file_count",
        "total_bytes",
        "s3_location",
        "s3_experiment_json_key",
        "s3_bucket",
        "auto_detected",
        "sync_version",
        params_csv.alias("params_csv"),
    )


_EXPERIMENTS_SQL = f"""
WITH src AS ({_O_EXPS_SRC})
SELECT experiment_id,
       {_O_LENIENT.format(x='last_updated')} AS last_updated,
       experiment_folder,
       staff_name,
       instrument AS instrument_id,
       computer AS computer_name,
       {_O_LENIENT.format(x='created')} AS created_at,
       COALESCE(update_count, 1) AS update_count,
       file_count,
       total_size_bytes AS total_bytes,
       s3_location,
       s3_key AS s3_experiment_json_key,
       s3_bucket,
       COALESCE(auto_detected, true) AS auto_detected,
       COALESCE(sync_version, '1.0') AS sync_version,
       CASE WHEN parameters IS NULL THEN ''
            ELSE array_to_string(list_sort(list_transform(map_entries(parameters),
                     -- null values render as the bare key, mirroring
                     -- Spark's null-SKIPPING concat_ws ('||' would null
                     -- the whole entry and array_to_string would drop it)
                     e -> CASE WHEN e.value IS NULL THEN e.key
                               ELSE e.key || '=' || e.value END)), ',')
       END AS params_csv
FROM src
"""


# ---------------------------------------------------------------------------
# experiment.json → file_inventory (OP-EXPLODE-EXP)
# ---------------------------------------------------------------------------


def ingest_file_inventory_exp(spark: SparkSession, sf_dir: str) -> DataFrame:
    exps = read_experiment_manifests(spark, LAKE)
    valid, _ = split_valid(exps, required=["experiment_id", "staff_name"])
    return file_inventory_from_experiment_manifests(valid, now=NOW)


_FILE_INV_EXP_SQL = f"""
WITH src AS ({_O_EXPS_SRC}),
ex AS (
  SELECT experiment_id, staff_name, instrument, s3_key AS exp_json_key, s3_bucket,
         unnest(files) AS f
  FROM src
)
SELECT experiment_id,
       f.relative_path AS file_path,
       f.name AS file_name,
       regexp_replace(exp_json_key, '/[^/]*$', '') || '/' || f.relative_path AS s3_key,
       s3_bucket,
       f.size AS file_size_bytes,
       CASE WHEN contains(f.name, '.') THEN lower(string_split(f.name, '.')[-1])
            ELSE 'unknown' END AS file_type,
       {_O_CHECKSUM.format(x='f.checksum')} AS checksum_sha256,
       TIMESTAMP '2024-06-01' AS uploaded_at,
       {_O_LENIENT.format(x='f.modified')} AS modified_at,
       'from_experiment_json' AS run_id,
       staff_name,
       instrument AS instrument_id,
       CAST(NULL AS BOOLEAN) AS is_update
FROM ex
"""


# ---------------------------------------------------------------------------
# Run-id enrichment of experiment file rows (OP-JOIN-ENRICH — the
# reference's 'from_experiment_json' placeholder made real, :453)
# ---------------------------------------------------------------------------


def ingest_enriched_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    from agf_data_ingestion_spark.operators.ingest import enrich_experiment_files_with_run

    runs = read_run_manifests(spark, LAKE)
    rv, _ = split_valid(runs, required=["computer_name", "files_in_batch"])
    exps = read_experiment_manifests(spark, LAKE)
    ev, _ = split_valid(exps, required=["experiment_id", "staff_name"])
    run_files = file_inventory_from_run_manifests(rv, now=NOW)
    exp_files = file_inventory_from_experiment_manifests(ev, now=NOW)
    out = enrich_experiment_files_with_run(exp_files, run_files)
    return out.select("experiment_id", "file_path", "s3_key", "run_id", "staff_name")


_ENRICHED_SQL = f"""
WITH runs AS ({_O_RUNS_SRC}),
rv AS (SELECT * FROM runs WHERE {_O_VALID_RUN}
         AND s3_key LIKE 'raw/%'),
run_inv AS (
  SELECT DISTINCT
         regexp_replace(run_json_key, '/[^/]*$', '') || '/' ||
           CASE WHEN len(p) > 1 THEN p[1] || '/payload/' || array_to_string(p[2:], '/')
                ELSE p[1] || '/payload/' || p[-1] END AS key,
         seg[6] AS run_id
  FROM (SELECT s3_key AS run_json_key, string_split(s3_key, '/') AS seg,
               string_split(unnest(file_manifest).path, '/') AS p
        FROM rv)
),
exps AS ({_O_EXPS_SRC}),
ev AS (SELECT * FROM exps WHERE {_O_VALID_EXP}
         AND s3_key LIKE 'raw/%'),
exp_inv AS (
  SELECT experiment_id,
         f.relative_path AS file_path,
         regexp_replace(s3_key, '/[^/]*$', '') || '/' || f.relative_path AS key,
         staff_name
  FROM (SELECT experiment_id, staff_name, s3_key, unnest(files) AS f FROM ev)
)
SELECT experiment_id, file_path, exp_inv.key AS s3_key,
       COALESCE(run_inv.run_id, 'from_experiment_json') AS run_id,
       staff_name
FROM exp_inv LEFT JOIN run_inv ON exp_inv.key = run_inv.key
"""


# ---------------------------------------------------------------------------
# Quarantine accounting (OP-SINK-DLQ / OP-STRM-ERR / OP-SINK-METRICS)
# ---------------------------------------------------------------------------


def ingest_quarantine_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    runs = read_run_manifests(spark, LAKE)
    valid, bad = split_valid(runs, required=["computer_name", "files_in_batch"])
    inv = file_inventory_from_run_manifests(valid, now=NOW)
    ok, badsum = quarantine_bad_checksums(inv)
    return (
        valid.agg(F.count("*").alias("valid_manifests"))
        .crossJoin(bad.agg(F.count("*").alias("quarantined_manifests")))
        .crossJoin(inv.agg(F.count("*").alias("file_rows")))
        .crossJoin(badsum.agg(F.count("*").alias("bad_checksum_rows")))
    )


_QUARANTINE_SQL = f"""
WITH src AS ({_O_RUNS_SRC}),
inv AS (
  SELECT {_O_CHECKSUM.format(x='f.checksum')} AS checksum_sha256
  FROM (SELECT unnest(file_manifest) AS f FROM src
        WHERE {_O_VALID_RUN})
)
SELECT (SELECT COUNT(*) FROM src
        WHERE {_O_VALID_RUN}) AS valid_manifests,
       (SELECT COUNT(*) FROM src
        WHERE NOT ({_O_VALID_RUN})) AS quarantined_manifests,
       (SELECT COUNT(*) FROM inv) AS file_rows,
       (SELECT COUNT(*) FROM inv WHERE checksum_sha256 IS NULL) AS bad_checksum_rows
"""


# ---------------------------------------------------------------------------
# End-to-end reconciliation audit (OP-SRC-LIST, OP-SET-UNION, OP-JOIN-ANTI-*)
# ---------------------------------------------------------------------------


def ingest_reconcile_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit the fixture lake: tracked keys (from the three ingested tables)
    vs actual storage keys.  Manifests are present in storage → no
    storage-side orphans; manifest-declared payload files are tracked but
    never synced → deterministic db-side orphans (reference semantics:
    ``agf_reconciliation_lambda.py:65-66``)."""
    from agf_data_ingestion_spark.operators.reconcile import list_storage_keys, tracked_keys

    runs = read_run_manifests(spark, LAKE)
    rv, _ = split_valid(runs, required=["computer_name", "files_in_batch"])
    exps = read_experiment_manifests(spark, LAKE)
    ev, _ = split_valid(exps, required=["experiment_id", "staff_name"])
    inv_ok, _ = quarantine_bad_checksums(file_inventory_from_run_manifests(rv, now=NOW))
    tracked = tracked_keys(
        {
            "file_inventory": inv_ok,
            "sync_runs": sync_runs_from_run_manifests(rv, now=NOW),
            "experiments": experiments_from_manifests(ev, now=NOW),
        }
    )
    storage = list_storage_keys(spark, LAKE).select("key")
    orphans_storage = storage.join(tracked, "key", "left_anti").select(
        F.lit("storage").alias("side"), "key"
    )
    orphans_db = tracked.join(storage, "key", "left_anti").select(
        F.lit("db").alias("side"), "key"
    )
    return orphans_storage.unionByName(orphans_db)


_RECONCILE_SQL = f"""
WITH runs AS ({_O_RUNS_SRC}),
rv AS (SELECT * FROM runs WHERE {_O_VALID_RUN}
         AND s3_key LIKE 'raw/%'),
exps AS ({_O_EXPS_SRC}),
ev AS (SELECT * FROM exps WHERE {_O_VALID_EXP}
         AND s3_key LIKE 'raw/%'),
inv AS (
  SELECT regexp_replace(run_json_key, '/[^/]*$', '') || '/' ||
         CASE WHEN len(p) > 1 THEN p[1] || '/payload/' || array_to_string(p[2:], '/')
              ELSE p[1] || '/payload/' || p[-1] END AS key,
         {_O_CHECKSUM.format(x='f.checksum')} AS cs
  FROM (SELECT s3_key AS run_json_key, unnest(file_manifest) AS f,
               string_split(unnest(file_manifest).path, '/') AS p
        FROM rv)
),
tracked AS (
  SELECT DISTINCT key FROM (
    SELECT key FROM inv WHERE cs IS NOT NULL
    UNION ALL SELECT s3_key FROM rv
    UNION ALL SELECT s3_key FROM ev
  )
),
storage AS (
  SELECT replace(file, '{LAKE}/', '') AS key
  FROM glob('{LAKE}/raw/**')
  WHERE NOT file LIKE '%/' AND NOT contains(file, '.DS_Store')
)
SELECT 'storage' AS side, key FROM storage WHERE key NOT IN (SELECT key FROM tracked)
UNION ALL
SELECT 'db' AS side, key FROM tracked WHERE key NOT IN (SELECT key FROM storage)
"""


QUERIES: dict[str, QuerySpec] = {
    "ingest_sync_runs": QuerySpec(
        ingest_sync_runs,
        _SYNC_RUNS_SQL,
        (
            "OP-SRC-JSON",
            "OP-STR-SPLITPATH",
            "OP-DATE-PARSE",
            "OP-DATE-FMT",
            "OP-MAP-KEYS",
            "OP-ARR-SUM",
            "OP-COALESCE",
            "OP-FIL-PATH",
            "OP-DATE-NOW",
        ),
    ),
    "ingest_file_inventory_run": QuerySpec(
        ingest_file_inventory_run,
        _FILE_INV_RUN_SQL,
        (
            "OP-EXPLODE-RUN",
            "OP-STR-SYNTHKEY",
            "OP-STR-REWRITE",
            "OP-STR-BASENAME",
            "OP-STR-EXT",
            "OP-STR-CHECKNORM",
            "OP-FIL-CHECKSUM",
        ),
    ),
    "ingest_experiments": QuerySpec(
        ingest_experiments, _EXPERIMENTS_SQL, ("OP-COALESCE", "OP-DATE-PARSE", "OP-SRC-JSON")
    ),
    "ingest_file_inventory_exp": QuerySpec(
        ingest_file_inventory_exp,
        _FILE_INV_EXP_SQL,
        ("OP-EXPLODE-EXP", "OP-STR-CONCATKEY", "OP-STR-DIRNAME"),
    ),
    "ingest_enriched_inventory": QuerySpec(
        ingest_enriched_inventory, _ENRICHED_SQL, ("OP-JOIN-ENRICH",)
    ),
    "ingest_quarantine_stats": QuerySpec(
        ingest_quarantine_stats,
        _QUARANTINE_SQL,
        ("OP-SINK-DLQ", "OP-STRM-ERR", "OP-SINK-METRICS", "OP-AGG-CONDCOUNT"),
    ),
    "ingest_reconcile_orphans": QuerySpec(
        ingest_reconcile_orphans,
        _RECONCILE_SQL,
        ("OP-SRC-LIST", "OP-SET-UNION", "OP-JOIN-ANTI-S3", "OP-JOIN-ANTI-DB", "OP-FIL-JUNK", "OP-STR-URLDEC"),
    ),
}
