"""Bucketed-join tests: correctness plus the physical property that makes
bucketing worth it — no exchange on either side of the join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from agf_data_ingestion_spark.sources.bucketed import bucketed_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = spark.range(1000).select(
        F.col("id").alias("o_key"), (F.col("id") % 7).alias("o_flag")
    )
    items = spark.range(3000).select(
        (F.col("id") % 1000).alias("o_key"), F.col("id").alias("item_id")
    )
    write_bucketed(orders, "b_orders", bucket_by=["o_key"], n_buckets=8, sort_by=["o_key"])
    write_bucketed(items, "b_items", bucket_by=["o_key"], n_buckets=8, sort_by=["o_key"])
    yield "b_orders", "b_items"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_items")


def test_bucketed_join_correct(spark, bucketed_tables):
    lt, rt = bucketed_tables
    out = bucketed_join(spark, lt, rt, ["o_key"])
    assert out.count() == 3000  # every item matches exactly one order


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    out = bucketed_join(spark, lt, rt, ["o_key"], force_sort_merge=True)
    out.count()  # materialize with AQE final plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in plan, plan
    # the same join over non-bucketed data DOES shuffle — the baseline
    plain = spark.table(lt).repartition(8).join(spark.table(rt).repartition(8), ["o_key"])
    plain_plan = plain._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plain_plan
