"""Storage ↔ table reconciliation audit (SURVEY.md §3.2).

Reference ``lambda/agf_reconciliation_lambda.py``: list object keys
modified in the last N days (:99-125), union the tracked-key projections of
the three tables filtered by their per-table timestamp (:128-166), and take
set differences both ways (:65-66); report counts plus a sorted 20-key
sample each way (:203-272).

Spark shape: two ``left_anti`` joins over union-distinct projections — the
paginated single-threaded scans the reference needed a 900 s budget for
become one parallel batch job. The time-window filters land on partition /
min-max pruned Parquet scans.
"""

from __future__ import annotations

import datetime as _dt
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RECONCILIATION_DAYS = 8  # reference :38-40, weekly cadence + 1 day buffer

#: (key column, timestamp column) per engine table — reference :145-164
TRACKED_KEY_SOURCES = {
    "file_inventory": ("s3_key", "uploaded_at"),
    "sync_runs": ("s3_key", "processed_at"),
    "experiments": ("s3_experiment_json_key", "last_updated"),
}


def list_storage_keys(
    spark: SparkSession,
    root: str,
    *,
    cutoff: _dt.datetime | None = None,
    prefix: str = "raw/",
) -> DataFrame:
    """Object listing as a DataFrame (OP-SRC-LIST).

    Uses the ``binaryFile`` source with content column pruned away — Spark's
    distributed file index replaces the reference's sequential
    ``list_objects_v2`` pagination. Junk filters per reference :122.
    """
    listing = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(os.path.join(root, prefix.strip("/")))
        .select(
            F.regexp_replace(F.col("path"), "^file:/+", "/").alias("abs_path"),
            F.col("modificationTime").alias("modified_at"),
        )
    )
    # percent-decode FIRST ('+' shielded: url_decode is form decoding), then
    # strip the root by LENGTH, not regexp — roots with regex metacharacters
    # must not corrupt keys or error the pattern (ADVICE r1)
    decoded = F.url_decode(F.regexp_replace(F.col("abs_path"), "\\+", "%2B"))
    root_prefix = "/" + os.path.abspath(root).strip("/") + "/"
    stripped = F.when(
        decoded.startswith(F.lit(root_prefix)),
        F.substring(decoded, len(root_prefix) + 1, 1 << 30),
    ).otherwise(decoded)
    listing = listing.select(stripped.alias("key"), "modified_at")
    listing = listing.filter(
        ~F.col("key").endswith("/") & ~F.col("key").contains(".DS_Store")
    )
    if cutoff is not None:
        listing = listing.filter(F.col("modified_at") >= F.lit(cutoff))
    return listing


def tracked_keys(
    tables: dict[str, DataFrame], *, cutoff: _dt.datetime | None = None
) -> DataFrame:
    """Union-distinct of tracked keys across the three tables
    (OP-SET-UNION; incremental window per table — reference :128-166)."""
    parts = []
    for name, (key_col, ts_col) in TRACKED_KEY_SOURCES.items():
        if name not in tables:
            continue
        df = tables[name]
        if cutoff is not None:
            df = df.filter(F.col(ts_col) >= F.lit(cutoff))
        parts.append(df.select(F.col(key_col).alias("key")).filter(F.col("key").isNotNull()))
    if not parts:
        raise ValueError("no tracked tables supplied")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.distinct()


@dataclass
class ReconciliationResult:
    storage_count: int
    tracked_count: int
    orphaned_in_storage: int
    orphaned_in_db: int
    sample_storage: list[str] = field(default_factory=list)
    sample_db: list[str] = field(default_factory=list)

    @property
    def status(self) -> str:
        return (
            "discrepancies_found"
            if (self.orphaned_in_storage or self.orphaned_in_db)
            else "in_sync"
        )


def _audit(
    s: DataFrame,
    t: DataFrame,
    orphan_s: DataFrame,
    orphan_t: DataFrame,
    sample: int,
) -> ReconciliationResult:
    """Counts + top-``sample`` sorted keys per side (OP-SORT-LIMIT,
    reference :229-243); one extra count only when the sample overflows."""
    cnt_s, cnt_t = s.count(), t.count()
    o_s = orphan_s.orderBy("key").limit(sample + 1).collect()
    o_t = orphan_t.orderBy("key").limit(sample + 1).collect()
    n_os = orphan_s.count() if len(o_s) > sample else len(o_s)
    n_ot = orphan_t.count() if len(o_t) > sample else len(o_t)
    return ReconciliationResult(
        storage_count=cnt_s,
        tracked_count=cnt_t,
        orphaned_in_storage=n_os,
        orphaned_in_db=n_ot,
        sample_storage=[r["key"] for r in o_s[:sample]],
        sample_db=[r["key"] for r in o_t[:sample]],
    )


def reconcile(
    storage_keys: DataFrame, tracked: DataFrame, *, sample: int = 20
) -> ReconciliationResult:
    """Anti-joins both directions (OP-JOIN-ANTI-S3 / OP-JOIN-ANTI-DB) +
    ordered samples (OP-SORT-LIMIT, reference :229-243)."""
    s = storage_keys.select("key")
    t = tracked.select("key")
    orphan_s = s.join(t, "key", "left_anti")
    orphan_t = t.join(s, "key", "left_anti")
    return _audit(s, t, orphan_s, orphan_t, sample)


def format_report(res: ReconciliationResult, generated_at: str) -> str:
    """Human-readable report (layout per reference :203-272)."""
    lines = [
        "=" * 60,
        "S3-TABLE RECONCILIATION REPORT",
        f"Generated: {generated_at}",
        "=" * 60,
        "",
        "SUMMARY",
        "-" * 40,
        f"Total files in storage:     {res.storage_count:,}",
        f"Total tracked in tables:    {res.tracked_count:,}",
        "",
        f"Orphaned in storage:        {res.orphaned_in_storage:,}",
        f"Orphaned in tables:         {res.orphaned_in_db:,}",
        "",
    ]
    if res.sample_storage:
        lines += ["UNTRACKED STORAGE FILES (sample, max 20):", "-" * 40]
        lines += [f"  - {k}" for k in res.sample_storage]
        if res.orphaned_in_storage > len(res.sample_storage):
            lines.append(f"  ... and {res.orphaned_in_storage - len(res.sample_storage)} more")
        lines.append("")
    if res.sample_db:
        lines += ["TABLE RECORDS POINTING TO MISSING FILES (sample, max 20):", "-" * 40]
        lines += [f"  - {k}" for k in res.sample_db]
        if res.orphaned_in_db > len(res.sample_db):
            lines.append(f"  ... and {res.orphaned_in_db - len(res.sample_db)} more")
        lines.append("")
    lines.append("=" * 60)
    return "\n".join(lines)


def reconcile_incremental(
    spark,
    storage_keys: DataFrame,
    snapshot_table: str,
    *,
    v_from: int,
    key_col: str = "s3_key",
    sample: int = 20,
) -> ReconciliationResult:
    """Audit only what CHANGED since snapshot version ``v_from`` of a
    snapshot-format tracked table (sources/snapshots.py) — the weekly
    full-scan audit (reference agf_reconciliation_lambda.py) becomes an
    incremental one.

    Two asymmetric anti-joins:

    * **DB side** (tracked → storage): only keys *inserted since v_from*
      are checked against storage — cost basis |changes|, not |table|.
    * **storage side** (storage → tracked): anti-joined against the FULL
      current tracked key set.  Using the delta here would flag every
      object tracked before v_from as orphaned (a false positive on a
      perfectly in-sync table); the current set is read via
      ``snapshot_read``, which plans from committed manifests — no
      storage listing, and min/max-pruned scans of the key column only.

    ``tracked_count`` reports the delta size (what this audit verified),
    ``storage_count`` the supplied storage listing.  Callers typically
    pass a cutoff-filtered listing (``list_storage_keys(cutoff=...)``)
    aligned to v_from's commit time so both sides stay |changes|-sized.
    A full audit remains `reconcile` — run it at a slower cadence.
    """
    from pyspark.sql import functions as F

    from agf_data_ingestion_spark.sources.snapshots import snapshot_diff, snapshot_read

    delta = snapshot_diff(spark, snapshot_table, v_from=v_from)
    added = (
        delta.filter(F.col("_change") == "insert")
        .select(F.col(key_col).alias("key"))
        .dropDuplicates(["key"])
    )
    current = (
        snapshot_read(spark, snapshot_table)
        .select(F.col(key_col).alias("key"))
        .filter(F.col("key").isNotNull())
        .dropDuplicates(["key"])
    )
    s = storage_keys.select("key")
    orphan_s = s.join(current, "key", "left_anti")
    orphan_t = added.join(s, "key", "left_anti")
    return _audit(s, added, orphan_s, orphan_t, sample)
