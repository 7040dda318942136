"""Streaming BM25 index maintenance (streaming/text_index_stream.py):
stream ≡ one-shot build, replay suppression via the op-label + durable-HWM
bookmark, and crash-repair of a torn HWM write."""

from __future__ import annotations

from pyspark.sql import functions as F

from agf_data_ingestion_spark.operators.text_index import (
    _postings_tbl,
    text_index_create,
    text_index_search,
    text_index_stats,
)
from agf_data_ingestion_spark.sources.snapshots import snapshot_read
from agf_data_ingestion_spark.streaming.text_index_stream import (
    _hwm_entry,
    _record_hwm,
    start_text_index_stream,
    text_index_batch,
    tidx_applied_batch_ids,
)


def _docs(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("spark merge window doc"),
            F.col("id").cast("string"),
            F.expr("repeat(' filler', CAST(id % 5 AS INT))"),
        ).alias("text"),
    )


def _postings(spark, root):
    return sorted(
        tuple(r) for r in snapshot_read(spark, _postings_tbl(root)).collect()
    )


def test_stream_equals_one_shot_build(spark, tmp_path):
    src = str(tmp_path / "src")
    _docs(spark, 0, 120).repartition(4).write.parquet(src)
    root = str(tmp_path / "inc")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = start_text_index_stream(
        stream, root, str(tmp_path / "ck"), stream_id="s1", available_now=True
    )
    q.awaitTermination()
    full = str(tmp_path / "full")
    text_index_create(spark.read.parquet(src), full)
    assert _postings(spark, root) == _postings(spark, full)
    assert text_index_stats(spark, root) == text_index_stats(spark, full)
    got = [tuple(r) for r in text_index_search(spark, root, ["spark", "merge"]).collect()]
    want = [tuple(r) for r in text_index_search(spark, full, ["spark", "merge"]).collect()]
    assert got == want


def test_replayed_batch_is_a_noop(spark, tmp_path):
    root = str(tmp_path / "idx")
    b = _docs(spark, 0, 30)
    assert text_index_batch(b, 0, root, stream_id="s") is not None
    p0 = _postings(spark, root)
    assert text_index_batch(b, 0, root, stream_id="s") is None  # replay
    assert _postings(spark, root) == p0
    assert text_index_stats(spark, root)[0] == 30


def test_torn_hwm_write_repairs_from_op_labels(spark, tmp_path):
    """Commit landed but the HWM write crashed: the op-label scan finds
    the batch id and repairs the HWM instead of double-applying."""
    root = str(tmp_path / "idx")
    text_index_batch(_docs(spark, 0, 20), 0, root, stream_id="s")
    # simulate the crash: roll the HWM back to pre-batch state
    _record_hwm(root, "s_other", 99, 1)  # unrelated stream untouched
    import json
    import os

    from agf_data_ingestion_spark.streaming.text_index_stream import _hwm_path

    with open(_hwm_path(root)) as fh:
        hwm = json.load(fh)
    del hwm["s"]
    with open(_hwm_path(root), "w") as fh:
        json.dump(hwm, fh)
    p0 = _postings(spark, root)
    assert 0 in tidx_applied_batch_ids(root, "s")
    assert text_index_batch(_docs(spark, 0, 20), 0, root, stream_id="s") is None
    assert _postings(spark, root) == p0
    assert _hwm_entry(root, "s")[0] == 0  # repaired
