"""Cell-partitioned IVF layout: probes must prune unprobed cell
directories at the scan (PartitionFilters), not filter after reading."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from agf_data_ingestion_spark.sources.ann_layout import (
    read_probe_cells,
    write_ivf_layout,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def layout(spark, tmp_path_factory):
    from agf_data_ingestion_spark.plans.base import t

    table = str(tmp_path_factory.mktemp("ivf") / "corpus")
    e = t(spark, SF, "embeddings").select(
        F.col("label").alias("cell"), "vec_id", "embedding"
    )
    write_ivf_layout(e, table)
    return table, {r.cell for r in e.select("cell").distinct().collect()}


def test_probe_reads_only_probed_cells(spark, layout):
    table, cells = layout
    probe = sorted(cells)[:2]
    df = read_probe_cells(spark, table, probe)
    assert {r.cell for r in df.select("cell").distinct().collect()} == set(probe)

    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the executed scan's file listing covers only the probed directories
    files = [
        f
        for f in spark.read.parquet(table)
        .filter(F.col("cell").isin(probe))
        .select(F.input_file_name())
        .distinct()
        .collect()
    ]
    for (fname,) in files:
        assert any(f"cell={c}" in fname for c in probe), fname


def test_probe_rowcount_matches_unpartitioned_filter(spark, layout):
    table, cells = layout
    from agf_data_ingestion_spark.plans.base import t

    probe = sorted(cells)[:2]
    expected = (
        t(spark, SF, "embeddings").filter(F.col("label").isin(probe)).count()
    )
    assert read_probe_cells(spark, table, probe).count() == expected
