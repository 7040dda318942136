#!/usr/bin/env python
"""ANN-family drift isolation (r10 — VERDICT r9 ask #3): BENCH_r09 showed
emb_ivf/ivfpq/sq/pq/matryoshka 1.3-1.75x slower than r8 with ZERO plan
changes; the suspected cause was session-level pressure from the new
`emb_ann_recall_curve` (two max-setting candidate passes) running earlier
in the same bench session, vs plain box noise.

Runs the family isolated in a FRESH session, >=5 reps per query, in one
of two modes:

    python scripts/measure_ann_drift.py without [reps]   # family alone
    python scripts/measure_ann_drift.py with    [reps]   # recall curve
                                                         # runs first,
                                                         # like bench.py

Each invocation is one process = one session, so comparing the two
outputs isolates the recall curve's session-level effect from box noise
(run both, ideally interleaved, and compare medians per query).
Prints one markdown row per query."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

FAMILY = [
    "emb_ivf_topk",
    "emb_ivfpq_topk",
    "emb_sq_adc_topk",
    "emb_pq_adc_topk",
    "emb_matryoshka_topk",
    "docs_bloom_contamination",
]


def median(xs):
    xs = sorted(xs)
    return xs[len(xs) // 2]


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "without"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    from agf_data_ingestion_spark.plans import QUERIES as CATALOG
    from agf_data_ingestion_spark.session import get_spark

    spark = get_spark(f"ann-drift-{mode}")
    spark.sparkContext.setLogLevel("ERROR")
    # the bench warmup: touch codegen/Arrow once on a cheap query
    CATALOG["emb_cosine_topk"].fn(spark, BASE).count()
    if mode == "with":
        for _ in range(2):
            CATALOG["emb_ann_recall_curve"].fn(spark, BASE).count()
    print(f"| query | median of {reps} ({mode} recall curve) | samples |")
    print("|---|---|---|")
    for name in FAMILY:
        fn = CATALOG[name].fn
        fn(spark, BASE).count()  # warm this query's plan
        samples = []
        for _ in range(reps):
            t0 = time.time()
            fn(spark, BASE).count()
            samples.append(time.time() - t0)
        print(
            f"| {name} | {median(samples):.2f} s | "
            + " / ".join(f"{s:.2f}" for s in samples)
            + " |",
            flush=True,
        )


if __name__ == "__main__":
    main()
