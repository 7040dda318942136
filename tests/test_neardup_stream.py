"""Streaming incremental near-dup: batch-chop independence.

The sink's contract (streaming/neardup_stream.py): each doc's flagged dup
is its best match among strictly earlier docs, so the dup table is the
SAME whether the corpus arrives as one batch or as N micro-batches in
arrival order.  The reference result is computed here with plain batch
DataFrame ops (global band join with new_id > dup_of), i.e. the stream is
checked against independently-derived semantics, not against itself.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from agf_data_ingestion_spark.plans.base import t
from agf_data_ingestion_spark.plans.text import _lsh_bands, _shingles, _sigs_of
from agf_data_ingestion_spark.streaming.neardup_stream import neardup_sink, read_dups

SF_DIR = "/root/testdata/sf0.001"
SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)
_THR = 0.2


@pytest.fixture(scope="module")
def docs_rows(spark):
    return [
        (r["doc_id"], r["text"])
        for r in t(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    ]


def _expected(spark, docs_df):
    bands = _lsh_bands(_sigs_of(docs_df))
    a, b = bands.alias("n"), bands.alias("c")
    cands = (
        a.join(
            b,
            (F.col("n.band") == F.col("c.band"))
            & (F.col("n.bsig") == F.col("c.bsig"))
            & (F.col("n.doc_id") > F.col("c.doc_id")),
        )
        .select(F.col("n.doc_id").alias("new_id"), F.col("c.doc_id").alias("dup_of"))
        .distinct()
    )
    sets_ = docs_df.select("doc_id", _shingles().alias("sset")).withColumn("sz", F.size("sset"))
    sn = sets_.select(F.col("doc_id").alias("new_id"), F.col("sset").alias("set_n"), F.col("sz").alias("sz_n"))
    sc = sets_.select(F.col("doc_id").alias("dup_of"), F.col("sset").alias("set_c"), F.col("sz").alias("sz_c"))
    inter = F.size(F.array_intersect("set_n", "set_c"))
    scored = (
        cands.join(sn, "new_id")
        .join(sc, "dup_of")
        .select(
            "new_id",
            "dup_of",
            (inter.cast("double") / (F.col("sz_n") + F.col("sz_c") - inter)).alias("jaccard"),
        )
    )
    w = Window.partitionBy("new_id").orderBy(F.desc("jaccard"), F.asc("dup_of"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("jaccard") >= _THR))
        .select("new_id", "dup_of", "jaccard")
    )


def _run_stream(spark, tmp_path, slices):
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    import time

    now = time.time()
    for i, rows in enumerate(slices):
        path = os.path.join(src, f"{i:02d}.json")
        with open(path, "w") as fh:
            for doc_id, text in rows:
                fh.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
        # the contract is "best match among docs from EARLIER batches";
        # arrival order must therefore be unambiguous: the file source
        # orders by modification time, and sub-second writes can tie (and
        # then order arbitrarily), so pin strictly increasing mtimes
        os.utime(path, (now - len(slices) + i, now - len(slices) + i))
    store = str(tmp_path / "store")
    stream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(src)
    q = (
        stream.writeStream.foreachBatch(neardup_sink(spark, store, threshold=_THR))
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return {
        (r.new_id, r.dup_of): r.jaccard for r in read_dups(spark, store).collect()
    }


def test_stream_in_three_batches_equals_batch_semantics(spark, tmp_path):
    docs = t(spark, SF_DIR, "documents").select("doc_id", "text")
    expected = {
        (r.new_id, r.dup_of): r.jaccard for r in _expected(spark, docs).collect()
    }
    assert expected, "fixture must contain near-duplicates"

    rows = sorted(
        [(r["doc_id"], r["text"]) for r in docs.collect()], key=lambda x: x[0]
    )
    third = len(rows) // 3
    slices = [rows[:third], rows[third : 2 * third], rows[2 * third :]]
    got = _run_stream(spark, tmp_path, slices)
    assert got == expected


def test_single_batch_stream_matches_too(spark, tmp_path, docs_rows):
    docs = t(spark, SF_DIR, "documents").select("doc_id", "text")
    expected = {
        (r.new_id, r.dup_of): r.jaccard for r in _expected(spark, docs).collect()
    }
    got = _run_stream(spark, tmp_path, [sorted(docs_rows, key=lambda x: x[0])])
    assert got == expected


def test_redelivered_batch_adds_no_self_matches(spark, tmp_path, docs_rows):
    """At-least-once: re-running a batch whose stores were already appended
    must not flag a doc as its own duplicate (jaccard-1.0 self-match)."""
    store = str(tmp_path / "store")
    rows = sorted(docs_rows, key=lambda x: x[0])[:60]
    batch = spark.createDataFrame(rows, SCHEMA)
    sink = neardup_sink(spark, store, threshold=_THR)
    sink(batch, 0)
    once = {(r.new_id, r.dup_of): r.jaccard for r in read_dups(spark, store).collect()}
    sink(batch, 0)  # re-delivery: stores already contain this batch
    twice = {(r.new_id, r.dup_of): r.jaccard for r in read_dups(spark, store).collect()}
    assert twice == once
    assert all(n != d for (n, d) in twice)


def test_band_store_two_writer_race(spark, tmp_path):
    """r6: the stores are snapshot tables — two concurrent band-store
    appends compose through the lock-free OCC (both commit; union
    content), instead of interleaving half-written parquet files."""
    import threading

    from agf_data_ingestion_spark.sources.bucketed import write_bucketed_snapshot
    from agf_data_ingestion_spark.sources.snapshots import (
        current_version,
        snapshot_read,
    )

    tbl = str(tmp_path / "bands")
    docs = t(spark, SF_DIR, "documents").select("doc_id", "text")
    bands = _lsh_bands(_sigs_of(docs)).localCheckpoint(eager=True)
    lo = bands.filter(F.col("doc_id") < 250)
    hi = bands.filter(F.col("doc_id") >= 250)

    errs = []

    def _w(frame):
        def run():
            try:
                write_bucketed_snapshot(
                    frame, tbl, bucket_by=["band", "bsig"], n_buckets=8,
                    sort_by=["band", "bsig"],
                )
            except Exception as e:  # pragma: no cover
                errs.append(e)
        return run

    t1, t2 = threading.Thread(target=_w(lo)), threading.Thread(target=_w(hi))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs and current_version(tbl) == 2
    got = sorted(map(tuple, snapshot_read(spark, tbl).collect()))
    assert got == sorted(map(tuple, bands.collect()))


def test_bucketed_probe_is_exchange_free_on_store_side(spark, tmp_path):
    """r6 plan pin: the corpus band store scans as a BUCKETED table —
    the probe join carries exactly ONE Exchange (the micro-batch side,
    hashed to the bucket count) and none above the store scan."""
    from agf_data_ingestion_spark.sources.bucketed import (
        bucketed_snapshot_frame,
        write_bucketed_snapshot,
    )

    tbl = str(tmp_path / "bands")
    docs = t(spark, SF_DIR, "documents").select("doc_id", "text")
    bands = _lsh_bands(_sigs_of(docs)).localCheckpoint(eager=True)
    # two commits: the probe view must span multiple commit file sets
    write_bucketed_snapshot(
        bands.filter(F.col("doc_id") < 250), tbl,
        bucket_by=["band", "bsig"], n_buckets=8, sort_by=["band", "bsig"],
    )
    write_bucketed_snapshot(
        bands.filter(F.col("doc_id") >= 250), tbl,
        bucket_by=["band", "bsig"], n_buckets=8, sort_by=["band", "bsig"],
    )
    store = bucketed_snapshot_frame(
        spark, tbl, bucket_by=["band", "bsig"], n_buckets=8,
        sort_by=["band", "bsig"],
    )
    probe = bands.filter(F.col("doc_id") < 20).alias("n")
    j = probe.hint("shuffle_hash").join(
        store.alias("c"),
        (F.col("n.band") == F.col("c.band")) & (F.col("n.bsig") == F.col("c.bsig")),
    )
    n = j.count()
    assert n > 0
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in plan, plan
    assert plan.count("Exchange") == 1, plan
    # correctness of the bucketed layout: same rows as a plain join
    want = probe.join(
        bands.alias("c"),
        (F.col("n.band") == F.col("c.band")) & (F.col("n.bsig") == F.col("c.bsig")),
    ).count()
    assert n == want


def test_bucketed_frame_falls_back_under_dvs_and_prunes_dirs(spark, tmp_path):
    """A DV delete on the band store makes the probe frame fall back to
    the merge-on-read read (bucketed hardlinks can't apply DVs) — rows
    stay deleted; compaction restores the bucketed path.  prune_probe_dirs
    bounds the per-version probe dirs a continuous stream accumulates."""
    import os

    from agf_data_ingestion_spark.sources.bucketed import (
        bucketed_snapshot_frame,
        prune_probe_dirs,
        write_bucketed_snapshot,
    )
    from agf_data_ingestion_spark.sources.snapshots import snapshot_delete

    tbl = str(tmp_path / "bands")
    docs = t(spark, SF_DIR, "documents").select("doc_id", "text")
    bands = _lsh_bands(_sigs_of(docs)).localCheckpoint(eager=True)
    for lo, hi in ((0, 150), (150, 300), (300, 10**9)):
        write_bucketed_snapshot(
            bands.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)),
            tbl, bucket_by=["band", "bsig"], n_buckets=8, sort_by=["band", "bsig"],
        )
        bucketed_snapshot_frame(
            spark, tbl, bucket_by=["band", "bsig"], n_buckets=8,
            sort_by=["band", "bsig"],
        )
    probe_root = os.path.join(tbl, "_probe")
    assert len(os.listdir(probe_root)) == 3
    assert prune_probe_dirs(spark, tbl, keep_last=2) == 1
    assert len(os.listdir(probe_root)) == 2

    total = bands.count()
    snapshot_delete(spark, tbl, [("doc_id", "==", 0)], mode="dv")
    store = bucketed_snapshot_frame(
        spark, tbl, bucket_by=["band", "bsig"], n_buckets=8,
        sort_by=["band", "bsig"],
    )
    got = store.count()
    assert got == total - bands.filter(F.col("doc_id") == 0).count()
    assert store.filter(F.col("doc_id") == 0).count() == 0
