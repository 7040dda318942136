"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query; ``queries``/``oracle_sql`` expose the
full catalog from ``agf_data_ingestion_spark.plans`` (one entry per
implemented operator family from SURVEY.md §2, each Spark plan paired with
a DuckDB oracle where the semantics are ANSI-SQL-expressible).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from agf_data_ingestion_spark.plans import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the TPC-H Q1-style pricing
    summary (scan → filter → single-pass grouped aggregation, the canonical
    shape of the engine's rollup workloads)."""
    return QUERIES["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented query/operator (SURVEY.md §2 coverage)."""
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle for every SQL-expressible catalog entry."""
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None}
