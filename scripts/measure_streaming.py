#!/usr/bin/env python
"""Measured end-to-end streaming latency (r9 — VERDICT r8 ask #6): the
chained path a production feed runs, under sustained input.

    landing dir (parquet files, fixed-cadence arrivals)
      └─ file readStream → CDC upsert stream → snapshot table A
           ├─ agf_snapshot_cdc readStream → BM25 index maintenance
           │    (text_index_stream → postings+stats, atomic 2-table txns)
           └─ agf_snapshot_cdc readStream → drift monitor
                (drift_stream over (event_type=source, value=n_chars))

N batches are fed at a FIXED cadence (input does not wait for the
pipeline).  Per-batch latency is reconstructed afterwards from commit
timestamps — no polling in the hot path:

* ingest hop  = table-A commit covering the batch  −  feed time;
* index hop   = stats-table commit whose cumulative n_docs covers the
  batch  −  feed time (this is trigger-to-VISIBLE through BOTH hops).

Prints p50/p95 for each hop plus the exactly-once verification: final
table-A rowcount, index ≡ from-scratch build of the union corpus, and
drift state covering every batch.

Usage: python scripts/measure_streaming.py [n_batches] [docs_per_batch] [cadence_s]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def p(xs, q):
    xs = sorted(xs)
    return xs[min(len(xs) - 1, int(q * len(xs)))]


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    docs_per = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    cadence = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from agf_data_ingestion_spark.operators.text_index import _encode
    from agf_data_ingestion_spark.session import get_spark
    from agf_data_ingestion_spark.sources import snapshots as S
    from agf_data_ingestion_spark.sources.snapshot_stream import SnapshotCDCSource
    from agf_data_ingestion_spark.streaming.drift_stream import (
        build_reference_histogram,
        drift_applied_batch_ids,
        start_drift_stream,
    )
    from agf_data_ingestion_spark.streaming.text_index_stream import (
        start_text_index_stream,
    )
    from agf_data_ingestion_spark.streaming.upsert_stream import (
        start_cdc_upsert_stream,
    )

    spark = get_spark("measure-streaming", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    spark.dataSource.register(SnapshotCDCSource)

    root = "/tmp/agf_stream_measure"
    shutil.rmtree(root, ignore_errors=True)
    landing = os.path.join(root, "landing")
    tbl = os.path.join(root, "tableA")
    idx = os.path.join(root, "index")
    os.makedirs(landing)

    def batch_table(i: int):
        ids = list(range(i * docs_per, (i + 1) * docs_per))
        texts = [
            f"tok{i} w{j % 17} w{(j * 7) % 23} w{(j * 11) % 29} doc{j}"
            for j in ids
        ]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts),
                "source": pa.array([f"src{j % 4}" for j in ids]),
            }
        )

    # seed table A so the CDC source has a table to tail, and seed the
    # index/drift state from that same seed commit
    seed = spark.createDataFrame(
        [(-1, "seed doc", "src0")], "doc_id long, text string, source string"
    )
    S.snapshot_write(seed, tbl, mode="overwrite", op="seed")
    ref_path = os.path.join(root, "drift_ref")
    build_reference_histogram(
        seed.select(
            F.col("source").alias("event_type"),
            F.col("doc_id").cast("double").alias("value"),
        ),
        ref_path,
        bin_width=1000.0,
    )

    # hop 1: landing files -> table A (insert-only CDC upsert)
    src = (
        spark.readStream.schema("doc_id long, text string, source string")
        .parquet(landing)
    )
    q1 = start_cdc_upsert_stream(
        src,
        tbl,
        os.path.join(root, "ck1"),
        ["doc_id"],
        processing_time="0 seconds",
    )
    # hop 2a: table A CDC -> BM25 index maintenance
    cdc = (
        spark.readStream.format("agf_snapshot_cdc")
        .option("table", tbl)
        .load()
        .filter(F.col("_change") == "insert")
        .select("doc_id", "text", "source")
    )
    q2 = start_text_index_stream(cdc, idx, os.path.join(root, "ck2"))
    # hop 2b: table A CDC -> drift monitor
    cdc2 = (
        spark.readStream.format("agf_snapshot_cdc")
        .option("table", tbl)
        .load()
        .filter(F.col("_change") == "insert")
        .select(
            F.col("source").alias("event_type"),
            F.col("doc_id").cast("double").alias("value"),
        )
    )
    q3 = start_drift_stream(
        cdc2,
        ref_path,
        os.path.join(root, "drift_state"),
        os.path.join(root, "drift_report"),
        os.path.join(root, "ck3"),
        bin_width=1000.0,
    )

    # sustained input: fixed cadence, never waits for the pipeline
    t_feed = []
    for i in range(n_batches):
        tmp = os.path.join(root, f"b{i}.parquet.tmp")
        pq.write_table(batch_table(i), tmp)
        t_feed.append(time.time())
        os.replace(tmp, os.path.join(landing, f"b{i}.parquet"))
        time.sleep(cadence)

    # drain: wait until the index covers everything
    from agf_data_ingestion_spark.operators.text_index import text_index_stats

    deadline = time.time() + 180
    expect = n_batches * docs_per + 1  # + seed doc
    while time.time() < deadline:
        try:
            n_docs, _ = text_index_stats(spark, idx)
            if n_docs >= expect:
                break
        except Exception:
            pass
        time.sleep(0.25)
    else:
        raise AssertionError("index never converged")
    # drift drains on its own cadence; give it a moment then stop
    time.sleep(3)
    for q in (q1, q2, q3):
        q.stop()
        q.awaitTermination()

    # ---- per-batch latency from commit timestamps ----
    def commits_with_rows(table):
        out = []
        for v in range(1, S.current_version(table) + 1):
            try:
                m = S.read_manifest(table, v)
            except Exception:
                continue
            out.append((v, m["committed_at"], sum(f["rows"] for f in m["files"])))
        return out

    a_commits = commits_with_rows(tbl)
    stats_tbl = os.path.join(idx, "stats")
    idx_commits = []
    for v in range(1, S.current_version(stats_tbl) + 1):
        try:
            m = S.read_manifest(stats_tbl, v)
        except Exception:
            continue
        n = (
            S.snapshot_read(spark, stats_tbl, version=v)
            .agg(F.sum("n_docs"))
            .collect()[0][0]
        )
        idx_commits.append((v, m["committed_at"], int(n)))

    lat_ingest, lat_index = [], []
    for i in range(n_batches):
        covered = (i + 1) * docs_per + 1
        ta = min((c[1] for c in a_commits if c[2] >= covered), default=None)
        ti = min((c[1] for c in idx_commits if c[2] >= covered), default=None)
        assert ta is not None and ti is not None, f"batch {i} never landed"
        lat_ingest.append(ta - t_feed[i])
        lat_index.append(ti - t_feed[i])

    # ---- exactly-once verification ----
    rows_a = S.snapshot_read(spark, tbl).count()
    assert rows_a == expect, (rows_a, expect)
    all_docs = S.snapshot_read(spark, tbl).select("doc_id", "text")
    fresh = _encode(all_docs, "text", "doc_id")
    got_postings = S.snapshot_read(spark, os.path.join(idx, "postings"))
    n_fresh, n_got = fresh.count(), got_postings.count()
    assert n_fresh == n_got, (n_fresh, n_got)
    tf_fresh = fresh.agg(F.sum("tf")).collect()[0][0]
    tf_got = got_postings.agg(F.sum("tf")).collect()[0][0]
    assert tf_fresh == tf_got
    drift_batches = drift_applied_batch_ids(
        spark, os.path.join(root, "drift_state")
    )
    assert len(drift_batches) >= 1

    print("| measurement | value |")
    print("|---|---|")
    print(
        f"| sustained input | {n_batches} batches x {docs_per} docs at "
        f"{cadence:.1f} s cadence |"
    )
    print(
        f"| ingest hop (landing -> table A visible) "
        f"| p50 {p(lat_ingest, 0.5):.2f} s, p95 {p(lat_ingest, 0.95):.2f} s |"
    )
    print(
        f"| end-to-end (landing -> BM25 index visible) "
        f"| p50 {p(lat_index, 0.5):.2f} s, p95 {p(lat_index, 0.95):.2f} s |"
    )
    print(
        f"| exactly-once | table A rows {rows_a} exact; index postings "
        f"({n_got} rows, sum tf {tf_got}) == from-scratch rebuild; "
        f"drift processed {len(drift_batches)} micro-batches |"
    )
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
