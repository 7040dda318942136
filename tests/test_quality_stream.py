"""Streaming expectations gate (streaming/quality.py): the stream split
must equal the batch split on the same data, violations must carry their
rule diagnoses, and batch-chopping must not change the outcome."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from agf_data_ingestion_spark.operators.expectations import split_by_expectations
from agf_data_ingestion_spark.streaming.quality import start_quality_stream

RULES = [
    {"rule": "not_null", "col": "k"},
    {"rule": "min", "col": "price", "value": 0.0},
    {"rule": "in_set", "col": "status", "values": ["O", "F", "P"]},
]


def _write_rows(spark, path, rows, n_files):
    df = spark.createDataFrame(rows, "k long, price double, status string")
    df.repartition(n_files).write.mode("append").parquet(path)


ROWS = [
    (1, 5.0, "O"),
    (2, -1.0, "F"),      # min violation
    (None, 2.0, "P"),    # not_null violation
    (4, 3.0, "X"),       # in_set violation
    (5, -9.0, "Z"),      # min + in_set violations
    (6, 0.0, "P"),
]


def test_stream_split_equals_batch_split(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    _write_rows(spark, src, ROWS, n_files=3)  # several files → several batches

    schema = "k long, price double, status string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = start_quality_stream(
        stream, RULES, out, str(tmp_path / "ck"), available_now=True
    )
    q.awaitTermination()

    got_good = sorted(
        tuple(r)
        for r in spark.read.parquet(os.path.join(out, "accepted"))
        .drop("_batch_id")  # replay-dedup bookkeeping, not payload
        .collect()
    )
    batch_good, batch_bad = split_by_expectations(
        spark.read.parquet(src), RULES
    )
    want_good = sorted(tuple(r) for r in batch_good.collect())
    assert got_good == want_good and len(got_good) == 2

    quar = spark.read.parquet(os.path.join(out, "quarantine"))
    got_bad = {
        (r.k, r.price, r.status): r["_violated"] for r in quar.collect()
    }
    assert len(got_bad) == 4
    # diagnosis names every failed rule
    assert got_bad[(2, -1.0, "F")] == "r01_min_price"
    assert got_bad[(None, 2.0, "P")] == "r00_not_null_k"
    assert got_bad[(4, 3.0, "X")] == "r02_in_set_status"
    assert set(got_bad[(5, -9.0, "Z")].split(",")) == {
        "r01_min_price",
        "r02_in_set_status",
    }


def test_split_rejects_global_rules(spark):
    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="not row-local"):
        split_by_expectations(df, [{"rule": "unique", "col": "k"}])


def test_split_is_map_only(spark):
    df = spark.createDataFrame(ROWS, "k long, price double, status string")
    good, bad = split_by_expectations(df, RULES)
    for frame in (good, bad):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
