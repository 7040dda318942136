#!/usr/bin/env python
"""Phase-attributed warm profile of emb_ann_recall_curve (VERDICT r12 ask
#4): where do the ~14 s go?  The query has exactly three BLOCKING phases
before its final action — everything else (gt exact-cosine, the LSH
branch, the curve math) evaluates lazily inside the one noop action:

  A. _ivfpq_state: codes mapInPandas + eager localCheckpoint, the 4
     sequential training scans (one collect job each), the query-codes
     collect — ~6 Spark jobs of mostly fixed Python-eval latency at
     bench scale (2000 vectors).
  B. the candidate pass: mapInPandas over codes + eager localCheckpoint.
  C. the final action: gt (emb_cosine_topk, cache build on first rep),
     LSH bucketing UDFs + join, and the gt-sized curve math.

Protocol: bench warmup, then N warm reps; phase A/B are timed by
re-running the query's own construction calls, phase C = full query wall
minus A minus B (the full query re-executes A and B internally, so C is
attributed by subtraction on the SAME rep).  Output: one JSON line per
rep + medians (committed to plans/r13/ + SCALE.md).

Usage: python scripts/r13_recall_profile.py [reps]
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

    spark = get_spark("agf-r13-recall-profile")
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
    QUERIES["emb_ann_recall_curve"].fn(spark, warm_dir).count()  # family warm

    from pyspark.sql import functions as F

    from agf_data_ingestion_spark.plans import similarity as S

    all_meds: dict[str, list[float]] = {}
    for rep in range(reps):
        ph: dict[str, float] = {}

        # phase A: the IVF-PQ state build, sub-attributed
        t = time.time()
        codes = S._ivfpq_codes_df(spark, sf_dir)
        ph["A1_codes_checkpoint"] = round(time.time() - t, 3)
        t = time.time()
        cells, ccv, rcb = S._ivfpq_train(codes)
        ph["A2_train_scans"] = round(time.time() - t, 3)
        t = time.time()
        qrows = sorted(
            codes.filter(F.col("vec_id") < S._N_QUERIES).collect(),
            key=lambda r: int(r["vec_id"]),
        )
        ph["A3_query_collect"] = round(time.time() - t, 3)
        assert qrows and cells is not None and rcb is not None
        ph["A_state_total"] = round(
            ph["A1_codes_checkpoint"] + ph["A2_train_scans"] + ph["A3_query_collect"],
            3,
        )

        # phase gt alone (separate cache-carrying query; first rep builds
        # the session cache, later reps read it — report both)
        t = time.time()
        QUERIES["emb_cosine_topk"].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        ph["gt_cosine_query"] = round(time.time() - t, 3)

        # full query end-to-end (re-runs A and B internally)
        t = time.time()
        QUERIES["emb_ann_recall_curve"].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        ph["full_query"] = round(time.time() - t, 3)
        ph["BC_cands_plus_final_action"] = round(
            ph["full_query"] - ph["A_state_total"], 3
        )
        print(json.dumps({"rep": rep, **ph}), flush=True)
        for k, v in ph.items():
            all_meds.setdefault(k, []).append(v)

    print(
        json.dumps(
            {
                "medians": {k: sorted(v)[len(v) // 2] for k, v in all_meds.items()},
                "sf_dir": sf_dir,
                "load_avg": list(os.getloadavg()),
            }
        )
    )


if __name__ == "__main__":
    main()
