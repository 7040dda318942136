"""Streaming Type-2 SCD maintenance (OP-X-SCD2 as a live pipeline).

``scd2_batch_fn`` is a ``foreachBatch`` function that keeps a dimension
table current as change events stream in.  Two tables under the warehouse:

* ``scd2_raw`` — the append-only change log, idempotent on the event id
  (re-delivered micro-batches are no-ops, the same exactly-once contract
  as the ingest sink).
* ``scd2_dim`` — the derived Type-2 table (key, attr, valid_from,
  valid_to, version, is_current).

Correctness under out-of-order arrival: intervals are ALWAYS recomputed
from the raw log, never patched incrementally — collapsing runs is lossy
(a batch inserting an event *between* two existing change points can
resurrect a value that run-collapse already merged away), so the change
log is the source of truth and the dimension is a pure function of it.
The recompute is scoped to the keys touched by the batch: untouched keys'
dimension rows pass through by anti-join.

Scale shape: per batch, the raw append is one idempotent upsert; the
recompute reads raw rows for affected keys only (left-semi against the
batch's key set — at 100 TB the raw log is bucketed/partitioned by key
hash so the semi-join prunes file groups, and affected-key row volume is
bounded by churn, not history size for reasonable key cardinality).  The
rewritten dimension is localCheckpointed before overwrite so the read and
the overwrite of the same path never race.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from agf_data_ingestion_spark.operators.scd2 import scd2_intervals
from agf_data_ingestion_spark.operators.upsert import _table_exists, upsert_append

_DIM_COLS = ("valid_from", "valid_to", "version", "is_current")


def scd2_batch_fn(
    warehouse: str,
    *,
    key: str = "user_id",
    attr: str = "event_type",
    time_col: str = "ts_us",
    id_col: str = "event_id",
):
    raw_path = os.path.join(warehouse, "scd2_raw")
    dim_path = os.path.join(warehouse, "scd2_dim")

    def fn(batch: DataFrame, batch_id: int) -> None:
        from agf_data_ingestion_spark.operators.locking import table_lock
        from agf_data_ingestion_spark.operators.statestore import (
            state_read,
            state_write,
        )

        spark = batch.sparkSession
        rows = batch.select(key, attr, time_col, id_col)
        upsert_append(rows, raw_path, keys=[id_col], lock=True)

        # the dim read-modify-commit cycle must serialize with OTHER
        # writers (the raw append's lock=True implies a multi-writer
        # deployment) — an unlocked cycle loses the other writer's
        # recomputed keys on the last overwrite
        with table_lock(dim_path, wait_s=600.0):
            raw = spark.read.parquet(raw_path)
            affected = rows.select(key).distinct()
            scoped = raw.join(affected, key, "left_semi")
            fresh = scd2_intervals(
                scoped, key=key, attr=attr, time_col=time_col, tiebreak=id_col
            )
            cur = state_read(spark, dim_path)
            if cur is not None:
                untouched = cur.join(affected, key, "left_anti")
                result = untouched.unionByName(fresh)
            else:
                result = fresh
            # versioned atomic commit: a crash mid-rewrite can no longer
            # truncate the dimension to just this batch's keys (the
            # in-place overwrite deleted the old table before writing, and
            # the unreadable leftovers then looked like a fresh warehouse)
            state_write(result.localCheckpoint(eager=True), dim_path, batch_id)

    return fn


def read_dimension(
    spark,
    warehouse: str,
    *,
    key: str = "user_id",
    attr: str = "event_type",
) -> DataFrame:
    """The current Type-2 dimension table (empty-safe for fresh warehouses:
    before any batch has committed, returns an empty frame with the
    dimension schema instead of raising PATH_NOT_FOUND).  The empty-frame
    key/attr TYPES derive from the raw change log when one exists — a
    hardcoded bigint key would silently diverge from a string-keyed
    dimension the moment the first batch lands."""
    from agf_data_ingestion_spark.operators.statestore import state_read

    dim_path = os.path.join(warehouse, "scd2_dim")
    cur = state_read(spark, dim_path)
    if cur is not None:
        return cur
    raw_path = os.path.join(warehouse, "scd2_raw")
    if _table_exists(spark, raw_path):
        raw_types = dict(spark.read.parquet(raw_path).dtypes)
        key_t = raw_types.get(key, "bigint")
        attr_t = raw_types.get(attr, "string")
    else:
        key_t, attr_t = "bigint", "string"
    schema = (
        f"{key} {key_t}, {attr} {attr_t}, valid_from bigint, "
        "valid_to bigint, version bigint, is_current boolean"
    )
    return spark.createDataFrame([], schema)


def as_of(dim: DataFrame, ts_us: int) -> DataFrame:
    """Point-in-time lookup: the attribute value in force at ``ts_us`` per
    key — the query SCD2 exists to answer."""
    return dim.filter(
        (F.col("valid_from") <= ts_us)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > ts_us))
    )
