"""Parquet table access helpers.

``testdata(spark, sf_dir)`` exposes the driver's TPC-H-ish tables
(TESTDATA.md) as a dict of DataFrames; ``load_table`` reads one engine
table from a warehouse directory.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, warehouse: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(warehouse, name))


def table_path(warehouse: str, name: str) -> str:
    return os.path.join(warehouse, name)


def testdata(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    # route through the catalog loader: events ships nanosecond parquet
    # timestamps that need the ns-aware read path (plans/base.py)
    from agf_data_ingestion_spark.plans.base import t as _t

    return {name: _t(spark, sf_dir, name) for name in TESTDATA_TABLES}
