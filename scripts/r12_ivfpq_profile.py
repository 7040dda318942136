#!/usr/bin/env python
"""Warm per-phase profile of emb_ivfpq_topk (VERDICT r11 ask #4): where
do the ~2-3 s go?  Phases are timed with the driver clock around each
blocking step of the query's own construction path, 5 warm reps, after
the bench's standard warmup.  Output: one JSON line per rep + a medians
summary (committed into SCALE.md's ivfpq subsection).

Usage: python scripts/r12_ivfpq_profile.py [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from agf_data_ingestion_spark.plans import QUERIES
    from agf_data_ingestion_spark.session import get_spark

    spark = get_spark("agf-r12-ivfpq-profile")
    spark.sparkContext.setLogLevel("ERROR")

    # bench warmup
    QUERIES["q1_pricing_summary"].fn(spark, sf_dir).count()
    from pyspark.sql.functions import col, pandas_udf

    _warm = pandas_udf(lambda s: s, "long")
    spark.range(1000).select(_warm(col("id"))).localCheckpoint(eager=True).count()
    warm_dir = sf_dir
    cand = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if os.path.isdir(cand):
        warm_dir = cand
    for _w in ("docs_minhash_lsh", "emb_ivf_topk"):
        QUERIES[_w].fn(spark, warm_dir).count()
    QUERIES["emb_ivfpq_topk"].fn(spark, warm_dir).count()  # warm this family too

    from agf_data_ingestion_spark.plans import similarity as S

    all_meds: dict[str, list[float]] = {}
    for rep in range(reps):
        ph: dict[str, float] = {}
        t0 = time.time()

        # phase 1: codes pass (mapInPandas + eager localCheckpoint)
        t = time.time()
        codes = S._ivfpq_codes_df(spark, sf_dir)
        ph["codes_checkpoint"] = round(time.time() - t, 3)

        # phase 2: coarse + residual training (4 sequential Arrow scans)
        t = time.time()
        cells, ccv, rcb = S._ivfpq_train(codes)
        ph["train_4scans"] = round(time.time() - t, 3)

        # phase 3: query collect
        t = time.time()
        from pyspark.sql import functions as F

        qrows = sorted(
            codes.filter(F.col("vec_id") < S._N_QUERIES).collect(),
            key=lambda r: int(r["vec_id"]),
        )
        ph["query_collect"] = round(time.time() - t, 3)
        assert qrows

        # phase 4: the full query end-to-end (includes 1-3 again)
        t = time.time()
        QUERIES["emb_ivfpq_topk"].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        ph["full_query"] = round(time.time() - t, 3)
        ph["scan_score_rank_rerank"] = round(
            ph["full_query"]
            - ph["codes_checkpoint"]
            - ph["train_4scans"]
            - ph["query_collect"],
            3,
        )  # upper bound: phases 1-3 re-run inside the full query

        ph["rep_total"] = round(time.time() - t0, 3)
        print(json.dumps({"rep": rep, **ph}))
        for k, v in ph.items():
            all_meds.setdefault(k, []).append(v)

    print(
        json.dumps(
            {
                "medians": {
                    k: sorted(v)[len(v) // 2] for k, v in all_meds.items()
                },
                "n_codes_partitions": codes.rdd.getNumPartitions(),
            }
        )
    )


if __name__ == "__main__":
    main()
