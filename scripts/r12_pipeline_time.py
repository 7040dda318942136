#!/usr/bin/env python
"""Focused end-to-end curation pipeline run (bench.py's pipeline section
verbatim): curate_full + curate_incremental + release_diff with per-stage
and per-segment walls, without the 175-query sweep.

Usage: python scripts/r12_pipeline_time.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from agf_data_ingestion_spark.operators.curation import (
        curate_full,
        curate_incremental,
        release_diff,
    )
    from agf_data_ingestion_spark.plans import QUERIES
    from agf_data_ingestion_spark.session import get_spark

    spark = get_spark("agf-r12-pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    # bench warmup
    QUERIES["q1_pricing_summary"].fn(spark, sf_dir).count()
    from pyspark.sql.functions import col, pandas_udf

    _warm = pandas_udf(lambda s: s, "long")
    spark.range(1000).select(_warm(col("id"))).localCheckpoint(eager=True).count()
    cand = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    warm_dir = cand if os.path.isdir(cand) else sf_dir
    for _w in ("docs_minhash_lsh", "emb_ivf_topk"):
        QUERIES[_w].fn(spark, warm_dir).count()

    pipe_dir = tempfile.mkdtemp(prefix="agf_r12_pipe_")
    try:
        rep = curate_full(spark, sf_dir, pipe_dir, budget_tokens=4000)
        print(json.dumps({"curate_full_wall_s": rep["wall_s"], "stages": rep["stages"]}))
        inc_batch = (
            spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .filter(F.col("doc_id") < 500)
            .withColumn("doc_id", F.col("doc_id") + F.lit(10_000_000))
        )
        inc = curate_incremental(spark, inc_batch, pipe_dir, batch_label="bench")
        print(
            json.dumps(
                {
                    "curate_incremental_wall_s": inc["wall_s"],
                    "stages": inc["stages"],
                    "segments": inc["segments"],
                }
            )
        )
        t0 = time.time()
        n = release_diff(spark, pipe_dir, rep["txn"]["id"], inc["txn"]["id"]).count()
        print(json.dumps({"release_diff_s": round(time.time() - t0, 3), "rows": n}))
    finally:
        shutil.rmtree(pipe_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
