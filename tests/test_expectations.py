"""Declarative expectations (operators/expectations.py): each rule type
must count exactly the violating rows on a frame with known defects, and
the row-local rules must share one aggregation pass."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from agf_data_ingestion_spark.operators.expectations import check_expectations


def _dirty(spark):
    rows = [
        (1, 10, "O", 5.0, "1-URGENT"),
        (2, 10, "F", -3.0, "9-BOGUS"),   # min + regex violations
        (2, 20, "X", 7.0, "2-HIGH"),     # duplicate key + bad status
        (None, 99, "P", 1.0, None),      # null key + orphan fk + null regex
    ]
    return spark.createDataFrame(
        rows, "k long, fk long, status string, price double, prio string"
    )


def _ref(spark):
    return spark.createDataFrame([(10,), (20,)], "ref_k long")


def _report(spark):
    df = check_expectations(
        _dirty(spark),
        [
            {"rule": "not_null", "col": "k"},
            {"rule": "unique", "col": "k"},
            {"rule": "min", "col": "price", "value": 0.0},
            {"rule": "max", "col": "price", "value": 6.0},
            {"rule": "in_set", "col": "status", "values": ["O", "F", "P"]},
            {"rule": "regex", "col": "prio", "pattern": "^[1-5]-"},
            {"rule": "foreign_key", "col": "fk", "ref": _ref(spark), "ref_col": "ref_k"},
        ],
    )
    return {r.rule_id: r for r in df.collect()}


def test_each_rule_counts_exact_violations(spark):
    got = _report(spark)
    assert len(got) == 7
    by_rule = {r.rule: r for r in got.values()}
    assert by_rule["not_null"].violations == 1
    assert by_rule["unique"].violations == 2  # both copies of k=2 count
    assert by_rule["min"].violations == 1  # -3.0
    assert by_rule["max"].violations == 1  # 7.0
    assert by_rule["in_set"].violations == 1  # 'X'
    assert by_rule["regex"].violations == 2  # '9-BOGUS' + NULL
    assert by_rule["foreign_key"].violations == 1  # fk=99
    for r in got.values():
        assert r.n_rows == 4
        assert r["pass"] == (r.violations == 0)


def test_clean_frame_passes_everything(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    rep = check_expectations(
        df,
        [
            {"rule": "not_null", "col": "k"},
            {"rule": "unique", "col": "k"},
            {"rule": "in_set", "col": "v", "values": ["a", "b"]},
        ],
    ).collect()
    assert all(r["pass"] and r.violations == 0 for r in rep)


def test_row_local_rules_share_one_scan(spark):
    df = check_expectations(
        _dirty(spark),
        [
            {"rule": "not_null", "col": "k"},
            {"rule": "min", "col": "price", "value": 0.0},
            {"rule": "in_set", "col": "status", "values": ["O", "F", "P"]},
            {"rule": "regex", "col": "prio", "pattern": "^[1-5]-"},
        ],
    )
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # four row-local rules → ONE aggregation over ONE relation, reused by
    # the per-rule projections (no Expand, no per-rule scans)
    assert plan.count("Aggregate") <= 2, plan
    assert "Expand" not in plan, plan


def test_unknown_rule_rejected(spark):
    with pytest.raises(ValueError, match="unknown rule"):
        check_expectations(_dirty(spark), [{"rule": "nope", "col": "k"}])


def test_expect_cli_gate(spark, tmp_path):
    """End-to-end: backfill a fixture lake then run the expect gate —
    exit 0, all checks pass; a corrupted warehouse fails with exit 3."""
    import argparse
    import importlib.util
    import json
    import os

    import pytest

    _spec = importlib.util.spec_from_file_location(
        "agf_pipeline_exp",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts",
            "agf_pipeline.py",
        ),
    )
    mod = importlib.util.module_from_spec(_spec)
    _spec.loader.exec_module(mod)

    from fixtures.generate import generate

    lake = str(tmp_path / "lake")
    wh = str(tmp_path / "wh")
    generate(lake)
    rc = mod.cmd_backfill(
        argparse.Namespace(
            lake=lake, warehouse=wh, file_type="all", dry_run=False,
            now="2024-06-01", checkpoint=None, sink="parquet",
        )
    )
    assert rc == 0
    assert mod.cmd_expect(argparse.Namespace(warehouse=wh)) == 0

    # corrupt: duplicate a sync_runs row with a negative byte count
    from pyspark.sql import functions as F

    sr = spark.read.parquet(os.path.join(wh, "sync_runs"))
    bad = sr.limit(1).withColumn("total_bytes", F.lit(-5).cast("long"))
    sr.unionByName(bad).write.mode("overwrite").parquet(
        os.path.join(wh, "sync_runs_bad")
    )
    import shutil

    shutil.rmtree(os.path.join(wh, "sync_runs"))
    os.rename(os.path.join(wh, "sync_runs_bad"), os.path.join(wh, "sync_runs"))
    assert mod.cmd_expect(argparse.Namespace(warehouse=wh)) == 3
