"""Streaming curation (streaming/curate_stream.py): the continuous twin
of ``curate_incremental``.  Pins stream ≡ same-chop manual execution,
exactly-once under checkpoint replay, and torn-HWM repair via the
op-label trail."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from agf_data_ingestion_spark.operators.curation import (
    _DOC_COLS,
    curate_full,
    curate_incremental,
    pick_cut_tile,
    stage_decontam,
    stage_exact_dedup,
    stage_neardup,
    stage_quality_cut,
    stage_rule_gate,
)
from agf_data_ingestion_spark.sources.snapshots import (
    current_version,
    snapshot_read,
)
from agf_data_ingestion_spark.streaming.curate_stream import (
    _hwm_path,
    curate_batch,
    start_curate_stream,
)
from tests.conftest import SF_SMOKE

#: r13 suite-wall gate (conftest): the stream==manual equivalence and
#: replay-noop properties are pinned at small fixtures by
#: tests/test_curation_incremental.py (stage semantics + planted cases)
#: and tests/test_streaming.py / test_crash_recovery.py (replay
#: idempotence); this file re-verifies them through a live multi-trigger
#: stream, a multi-minute latency rung.
pytestmark = pytest.mark.heavy_rung

_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    """Two byte-identical releases + two batches of gate-surviving docs."""
    root_a = str(tmp_path_factory.mktemp("stream_rel"))
    root_b = str(tmp_path_factory.mktemp("manual_rel"))
    rel_a = curate_full(spark, SF_SMOKE, root_a, budget_tokens=2000, seed="0")
    rel_b = curate_full(spark, SF_SMOKE, root_b, budget_tokens=2000, seed="0")

    from agf_data_ingestion_spark.plans.base import t

    docs = t(spark, SF_SMOKE, "documents")
    docs = stage_rule_gate(spark, SF_SMOKE, docs)
    docs = stage_exact_dedup(docs)
    docs = stage_neardup(spark, SF_SMOKE, docs)
    docs = stage_decontam(spark, SF_SMOKE, docs)
    cut = pick_cut_tile(spark, SF_SMOKE)
    survivors, _ = stage_quality_cut(spark, SF_SMOKE, docs, cut)
    published = {
        r["doc_id"]
        for r in snapshot_read(spark, rel_a["tables"]["shards"])
        .select("doc_id")
        .collect()
    }
    spare = sorted(
        (r for r in survivors.collect() if r["doc_id"] not in published),
        key=lambda r: r["doc_id"],
    )
    assert len(spare) >= 8

    def relabel(rows, base):
        return [
            (base + i, g["text"], g["lang"], g["source"], len(g["text"]))
            for i, g in enumerate(rows)
        ]

    b0 = relabel(spare[:4], 2_000_000)
    b1 = relabel(spare[4:8], 3_000_000)
    return {"rel_a": rel_a, "rel_b": rel_b, "b0": b0, "b1": b1, "published": published}


def _shard_rows(spark, tbl):
    return sorted(
        (r["doc_id"], r["shard_id"], r["global_pos"])
        for r in snapshot_read(spark, tbl)
        .select("doc_id", "shard_id", "global_pos")
        .collect()
    )


def test_stream_matches_manual_and_replays_are_noops(spark, setup, tmp_path):
    rel_a, rel_b = setup["rel_a"], setup["rel_b"]
    root_a = os.path.dirname(rel_a["tables"]["shards"])
    landing = str(tmp_path / "landing")
    ck = str(tmp_path / "ck")
    os.makedirs(landing)

    # batch 0 through a REAL stream (availableNow drains one file)
    spark.createDataFrame(setup["b0"], _SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(landing, "f0"))
    src = spark.readStream.schema(_SCHEMA).option("maxFilesPerTrigger", 1).parquet(
        landing + "/*"
    )
    q = start_curate_stream(
        src, root_a, ck, stream_id="s1", seed="0", budget_tokens=2000,
        available_now=True,
    )
    q.awaitTermination()
    # batch 1 lands later; a NEW query from the same checkpoint continues
    spark.createDataFrame(setup["b1"], _SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(landing, "f1"))
    q = start_curate_stream(
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing + "/*"),
        root_a,
        ck,
        stream_id="s1",
        seed="0",
        budget_tokens=2000,
        available_now=True,
    )
    q.awaitTermination()

    # manual same-chop twin on the identical release B
    curate_incremental(
        spark,
        spark.createDataFrame(setup["b0"], _SCHEMA),
        os.path.dirname(rel_b["tables"]["shards"]),
        batch_label="m#0",
        seed="0",
        budget_tokens=2000,
    )
    curate_incremental(
        spark,
        spark.createDataFrame(setup["b1"], _SCHEMA),
        os.path.dirname(rel_b["tables"]["shards"]),
        batch_label="m#1",
        seed="0",
        budget_tokens=2000,
    )
    assert _shard_rows(spark, rel_a["tables"]["shards"]) == _shard_rows(
        spark, rel_b["tables"]["shards"]
    )

    # replayed batch ids are exact no-ops (the at-least-once contract)
    shards_tbl = rel_a["tables"]["shards"]
    v = current_version(shards_tbl)
    b0_df = spark.createDataFrame(setup["b0"], _SCHEMA)
    assert curate_batch(b0_df, 0, root_a, stream_id="s1") is None
    assert curate_batch(b0_df, 1, root_a, stream_id="s1") is None
    assert current_version(shards_tbl) == v

    # torn HWM: the op-label trail alone rejects the replay and repairs
    os.remove(_hwm_path(root_a))
    assert curate_batch(b0_df, 1, root_a, stream_id="s1") is None
    assert current_version(shards_tbl) == v
    assert os.path.exists(_hwm_path(root_a))

    # a fresh batch id still applies after all that
    extra = spark.createDataFrame(
        [(4_000_000, setup["b0"][0][1] + " zzq extra", "en", "src0", 40)],
        _SCHEMA,
    )
    rep = curate_batch(extra, 2, root_a, stream_id="s1")
    assert rep is not None and current_version(shards_tbl) == v + 1
