"""Multi-format source/sink tests: CSV + JSONL quarantine splits and the
CSV→columnar (parquet/ORC) rewrite with partition pruning intact."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from agf_data_ingestion_spark.sources.tabular import (
    read_columnar,
    read_csv_quarantined,
    read_jsonl_quarantined,
    to_columnar,
)

SCHEMA = StructType(
    [
        StructField("id", IntegerType()),
        StructField("name", StringType()),
        StructField("qty", IntegerType()),
    ]
)


def test_csv_quarantine_split(spark, tmp_path):
    p = str(tmp_path / "in.csv")
    with open(p, "w") as fh:
        fh.write("id,name,qty\n")
        fh.write("1,alpha,10\n")
        fh.write("2,beta,not_a_number\n")  # malformed qty
        fh.write("3,gamma,30\n")
    valid, bad = read_csv_quarantined(spark, p, SCHEMA)
    assert sorted(r["id"] for r in valid.collect()) == [1, 3]
    raws = [r["raw"] for r in bad.collect()]
    assert len(raws) == 1 and "not_a_number" in raws[0]


def test_jsonl_quarantine_split(spark, tmp_path):
    p = str(tmp_path / "in.jsonl")
    with open(p, "w") as fh:
        fh.write('{"id": 1, "name": "alpha", "qty": 10}\n')
        fh.write("{broken json\n")
        fh.write('{"id": 3, "name": "gamma", "qty": 30}\n')
    valid, bad = read_jsonl_quarantined(spark, p, SCHEMA)
    assert sorted(r["id"] for r in valid.collect()) == [1, 3]
    assert bad.count() == 1


def test_csv_to_columnar_roundtrip_both_formats(spark, tmp_path):
    src = str(tmp_path / "in.csv")
    with open(src, "w") as fh:
        fh.write("id,name,qty\n")
        for i in range(20):
            fh.write(f"{i},n{i % 3},{i * 10}\n")
    valid, _ = read_csv_quarantined(spark, src, SCHEMA)
    for fmt in ("parquet", "orc"):
        out = str(tmp_path / f"lake_{fmt}")
        to_columnar(valid, out, fmt=fmt, partition_by=("name",))
        back = read_columnar(spark, out, fmt=fmt)
        assert back.count() == 20
        assert sorted(os.listdir(out))[0].startswith("name=") or any(
            e.startswith("name=") for e in os.listdir(out)
        )
        # partition pruning works on the rewritten layout
        pruned = back.filter(F.col("name") == "n1")
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "name" in plan
        assert pruned.count() == 7  # i % 3 == 1 for i in 0..19
        # values survive the roundtrip
        row = back.filter(F.col("id") == 7).collect()[0]
        assert row["qty"] == 70 and row["name"] == "n1"
