"""Plan-shape evidence for the relational suite (SCALE.md "Relational
suite" claims): dimension joins broadcast, predicates reach the parquet
scan, and semi/anti shapes stay semi/anti — regression guards so a future
edit can't silently trade a broadcast for a full shuffle."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    from agf_data_ingestion_spark.plans import QUERIES

    df = QUERIES[name].fn(spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize(
    "name",
    ["q9_product_profit", "q10_returned_revenue", "q20_bulk_suppliers"],
)
def test_dimension_joins_broadcast(spark, name):
    plan = _plan(spark, name)
    assert "BroadcastHashJoin" in plan, plan
    # none of these queries may sort-merge-join a dimension table
    assert "SortMergeJoin" not in plan, plan


def test_q4_exists_is_semi_join(spark):
    plan = _plan(spark, "q4_priority_late_ship")
    assert "LeftSemi" in plan, plan


def test_q22_not_exists_is_anti_join(spark):
    plan = _plan(spark, "q22_idle_rich_customers")
    assert "LeftAnti" in plan, plan


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan(spark, "q20_bulk_suppliers")
    # the p_name LIKE 'small%' prefix filter must be pushed to the part scan
    assert "PushedFilters" in plan and "StringStartsWith(p_name,small)" in plan, plan


def test_grouping_sets_single_expand(spark):
    plan = _plan(spark, "lineitem_grouping_sets")
    # one Expand feeding hash aggregation — not one pass per grouping set
    assert plan.count("Expand") >= 1, plan
    assert plan.count("Scan parquet") == 1, plan
