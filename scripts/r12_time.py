#!/usr/bin/env python
"""Focused noop-sink timing for a subset of catalog queries — the bench's
exact methodology (same session config, warmups, reps, median) without
paying for the full 175-workload sweep between optimization steps.

Usage: python scripts/r12_time.py <query> [query ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
       SPARK_GRAFT_BENCH_REPS (default 3)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))

    from agf_data_ingestion_spark.plans import QUERIES
    from agf_data_ingestion_spark.session import get_spark

    spark = get_spark("agf-r12-time")
    spark.sparkContext.setLogLevel("ERROR")

    # bench.py's warmup sequence, verbatim
    QUERIES["q1_pricing_summary"].fn(spark, sf_dir).count()
    from pyspark.sql.functions import col, pandas_udf

    _warm = pandas_udf(lambda s: s, "long")
    spark.range(1000).select(_warm(col("id"))).localCheckpoint(eager=True).count()
    warm_dir = sf_dir
    for _cand in (os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001"),):
        if os.path.isdir(_cand):
            warm_dir = _cand
    for _wname in ("docs_minhash_lsh", "emb_ivf_topk"):
        QUERIES[_wname].fn(spark, warm_dir).count()

    out = {}
    for name in names:
        runs = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"r12-time: {name}")
            t0 = time.time()
            QUERIES[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = {"median": sorted(runs)[len(runs) // 2], "runs": runs}
        print(f"{name}: {out[name]}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
