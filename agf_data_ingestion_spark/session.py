"""SparkSession factory with scale-oriented defaults.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32 threads);
the same configuration is what we would ship to a multi-executor cluster:
AQE on (runtime shuffle-partition coalescing + skew-join splitting),
Arrow for any Python exchange, UTC session timezone for deterministic
timestamp semantics against external oracles.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# 64 MiB broadcast threshold: the dimension tables of this workload
# (region/nation/customer/supplier/part at bench scale; instrument/staff
# dims in the ingest domain) are far below this, so star joins plan as
# broadcast-hash instead of shuffling the fact table.
_BROADCAST_BYTES = 64 * 1024 * 1024


def get_spark(
    app_name: str = "agf-data-ingestion-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``shuffle_partitions`` defaults to the local core count — with AQE's
    ``coalescePartitions`` enabled this is an upper bound, so small stages
    collapse to few tasks while wide stages still use every core. On a real
    cluster you would raise it to ~2-3x total cores; AQE makes the exact
    value non-critical.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("AGF_SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("AGF_SHUFFLE_PARTITIONS", cpus))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(_BROADCAST_BYTES))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # runtime row-group filtering for selective shuffle joins: the
        # filtered side's join keys become a bloom filter applied to the
        # unfiltered side's scan — at 100 TB this prunes most of a fact
        # scan joined against a filtered dimension when neither side
        # broadcasts (tests/test_plan_shapes.py pins the injection)
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
        .config("spark.driver.memory", os.environ.get("AGF_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
