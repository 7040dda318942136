#!/usr/bin/env python
"""Measured evidence for OP-X-TEXTIDX (SCALE.md): build the persisted
BM25 index over sf0.1 documents, then compare

1. probe metadata — files a term's plan opens vs the postings total;
2. wall — index probe (pruned scans + candidate aggregate) vs the
   per-query corpus scanner ``docs_bm25_search`` on the same terms.

Usage: python scripts/measure_text_index.py [sf_dir]
Prints markdown rows.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _median(xs):
    xs = sorted(xs)
    return xs[len(xs) // 2]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from agf_data_ingestion_spark.operators.text_index import (
        _postings_tbl,
        text_index_create,
        text_index_search,
    )
    from agf_data_ingestion_spark.plans.base import t
    from agf_data_ingestion_spark.plans.text import _BM25_TERMS, docs_bm25_search
    from agf_data_ingestion_spark.session import get_spark
    from agf_data_ingestion_spark.sources.snapshots import (
        plan_files,
        read_manifest,
    )

    spark = get_spark("measure-text-index")
    spark.sparkContext.setLogLevel("ERROR")
    root = "/tmp/agf_tidx_measure"
    shutil.rmtree(root, ignore_errors=True)
    t0 = time.time()
    text_index_create(
        t(spark, sf_dir, "documents").select("doc_id", "text"),
        root,
        cluster_files=16,
    )
    build_s = time.time() - t0
    tbl = _postings_tbl(root)
    total = len(read_manifest(tbl)["files"])
    opened = {
        term: len(plan_files(tbl, where=[("token", "==", term)]))
        for term in _BM25_TERMS
    }
    # warm both paths once, then reps of 3.  Timing action = noop-format
    # write (the bench.py invariant): .count() lets Catalyst prune the
    # decimal scoring projections and under-times both paths
    def run(df):
        df.write.format("noop").mode("overwrite").save()

    run(text_index_search(spark, root, list(_BM25_TERMS)))
    run(docs_bm25_search(spark, sf_dir))
    probe, scan = [], []
    for _ in range(3):
        s = time.time()
        run(text_index_search(spark, root, list(_BM25_TERMS)))
        probe.append(time.time() - s)
        s = time.time()
        run(docs_bm25_search(spark, sf_dir))
        scan.append(time.time() - s)
    print("| measurement | value |")
    print("|---|---|")
    print(f"| index build (one-time, sf0.1 docs) | {build_s:.2f} s |")
    print(
        f"| postings files opened per term (of {total}) | "
        + ", ".join(f"{k}: {v}" for k, v in opened.items())
        + " |"
    )
    print(f"| probe median (3 reps, warm) | {_median(probe):.3f} s |")
    print(f"| per-query corpus scan median | {_median(scan):.3f} s |")
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
