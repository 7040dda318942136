#!/usr/bin/env python
"""Per-trigger latency breakdown for the continuous-curation stream
(r11 — VERDICT r10 ask #4, the curate_stream twin of the r9
ingest-chain rung in measure_streaming.py).

    landing dir (parquet files, fixed-cadence arrivals)
      └─ file readStream → foreachBatch(curate_batch)
           → ONE ten-table txn per micro-batch into a published release

Measures, under sustained input that never waits for the pipeline:

* landing → release-visible p50/p95, reconstructed from the shards
  manifest ``committed_at`` of the commit carrying each batch's
  ``curate_inc:<stream>#<batch>`` op label (no polling in the hot path);
* per-trigger stage walls (rule gate / exact dedup / near-dup probe /
  decontam probe / quality cut / publish) from the incremental reports —
  the publish wall IS the ten-table txn commit cost;
* the fixed-floor split: run with two batch sizes and the per-stage
  intercept is the fixed cost, the slope is real work.

Usage: python scripts/measure_curate_stream.py [n_batches] [docs_per_batch] [cadence_s]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


def p(xs, q):
    xs = sorted(xs)
    return xs[min(len(xs) - 1, int(q * len(xs)))]


#: a gate-passing synthetic doc: ≥30 words, avg word length 3–10,
#: stopword ratio ≥ 0.05, unique ratio ≥ 0.4 — and globally unique
#: content words so batches are never exact/near dups of the release or
#: of each other
_STOP = ["the", "and", "for", "with", "that"]


def _doc_text(batch: int, doc: int) -> str:
    words = []
    for j in range(40):
        if j % 6 == 0:
            words.append(_STOP[j // 6 % len(_STOP)])
        else:
            words.append(f"q{batch}x{doc}w{j}")
    return " ".join(words)


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    docs_per = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    cadence = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0

    import pyarrow as pa
    import pyarrow.parquet as pq

    from agf_data_ingestion_spark.operators.curation import curate_full
    from agf_data_ingestion_spark.session import get_spark
    from agf_data_ingestion_spark.sources import snapshots as S
    from agf_data_ingestion_spark.streaming.curate_stream import (
        _parse_op,
        curate_batch,
    )

    spark = get_spark("measure-curate-stream", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    root = "/tmp/agf_curate_stream_measure"
    shutil.rmtree(root, ignore_errors=True)
    landing = os.path.join(root, "landing")
    release = os.path.join(root, "release")
    os.makedirs(landing)

    t0 = time.time()
    curate_full(spark, SF, release, budget_tokens=2000, seed="0")
    t_release = time.time() - t0

    def batch_table(i: int):
        base = 10_000_000 + i * docs_per
        ids = list(range(base, base + docs_per))
        texts = [_doc_text(i, j) for j in ids]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * docs_per),
                "source": pa.array([f"src{j % 4}" for j in ids]),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        )

    reps: list[tuple[int, dict]] = []
    sid = "measure"

    def fn(batch, batch_id):
        rep = curate_batch(
            batch, batch_id, release, stream_id=sid, budget_tokens=2000
        )
        if rep is not None:
            reps.append((batch_id, rep))

    src = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, n_chars long"
        )
        # one landed file per trigger: keeps the trigger<->arrival mapping
        # 1:1 so per-batch latency is attributable (without it the file
        # source coalesces everything available into one micro-batch)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    q = (
        src.writeStream.foreachBatch(fn)
        .option("checkpointLocation", os.path.join(root, "ck"))
        .outputMode("update")
        .trigger(processingTime="0 seconds")
        .start()
    )

    t_feed = []
    for i in range(n_batches):
        tmp = os.path.join(root, f"b{i}.parquet.tmp")
        pq.write_table(batch_table(i), tmp)
        t_feed.append(time.time())
        os.replace(tmp, os.path.join(landing, f"b{i}.parquet"))
        time.sleep(cadence)

    deadline = time.time() + 600
    while time.time() < deadline and len(reps) < n_batches:
        time.sleep(0.5)
    q.stop()
    q.awaitTermination()
    assert len(reps) >= n_batches, f"only {len(reps)} triggers committed"

    # landing -> release-visible from the shards op labels
    shards_tbl = os.path.join(release, "shards")
    commit_at = {}
    for v in range(1, S.current_version(shards_tbl) + 1):
        try:
            parsed = _parse_op(S._manifest_op(shards_tbl, v))
        except Exception:
            continue
        if parsed is not None and parsed[0] == sid:
            m = S.read_manifest(shards_tbl, v)
            commit_at[parsed[1]] = m["committed_at"]
    # batch ids are the stream's own; map in arrival order
    bids = sorted(commit_at)
    assert len(bids) >= n_batches
    lat = [commit_at[bids[i]] - t_feed[i] for i in range(n_batches)]

    stage_walls: dict[str, list[float]] = {}
    seg_walls: dict[str, list[float]] = {}
    for _bid, rep in reps:
        for s in rep["stages"]:
            stage_walls.setdefault(s["name"], []).append(s["wall_s"])
        for name, w in rep.get("segments", {}).items():
            seg_walls.setdefault(name, []).append(w)
        stage_walls.setdefault("total", []).append(rep["wall_s"])

    print(f"| release build (sf0.001) | {t_release:.1f} s |")
    print(
        f"| sustained input | {n_batches} batches x {docs_per} docs at "
        f"{cadence:.1f} s cadence |"
    )
    print(
        f"| landing -> release-visible | p50 {p(lat, 0.5):.2f} s, "
        f"p95 {p(lat, 0.95):.2f} s |"
    )
    for name in (
        "batch_input",
        "rule_gate",
        "exact_dedup",
        "neardup",
        "decontam",
        "quality_cut",
        "publish",
        "total",
    ):
        xs = stage_walls.get(name, [])
        if xs:
            print(
                f"| stage {name} | p50 {p(xs, 0.5):.2f} s, "
                f"p95 {p(xs, 0.95):.2f} s |"
            )
    for name in (
        "resolve_and_policy",
        "gates_and_probes",
        "wfq_assign",
        "publish",
        "verify_and_report",
    ):
        xs = seg_walls.get(name, [])
        if xs:
            print(
                f"| segment {name} | p50 {p(xs, 0.5):.2f} s, "
                f"p95 {p(xs, 0.95):.2f} s |"
            )
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
