"""transformWithState KMV sketch: streaming estimates must equal the batch
KMV estimator over the same rows, across micro-batch boundaries (state
lives in the engine's RocksDB state store, not user-managed parquet).

The transformWithState state-server protocol is protobuf-encoded
(pyspark/sql/streaming/proto/StateMessage_pb2) — on hosts without the
``protobuf`` package the query cannot start, so the end-to-end test skips
there (same conditional pattern as the optional-Pillow decoder test); the
hash-derivation and estimator pieces are pinned unconditionally below."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from agf_data_ingestion_spark.streaming.sketches import kmv_estimates, kmv_sketch
from agf_data_ingestion_spark.streaming.tws_kmv import (
    ROCKSDB_PROVIDER,
    kmv_distinct_stream,
)

SCHEMA = "grp string, user string"


def _write(dirpath, name, rows):
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, name), "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


def _run_round(spark, src, chk, out_dir):
    stream = spark.readStream.schema(SCHEMA).json(src)
    est = kmv_distinct_stream(stream, group_col="grp", key_col="user")

    def sink(batch, batch_id):
        if batch.count():
            batch.withColumn("batch_id", F.lit(batch_id)).write.mode(
                "append"
            ).parquet(out_dir)

    q = (
        est.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_tws_hash_derivation_matches_batch_sketch(spark):
    """The JVM-side hash prep feeding the processor must be the SAME
    derivation the batch sketch uses — runs everywhere (no state store)."""
    from agf_data_ingestion_spark.streaming.tws_kmv import hashed

    df = spark.createDataFrame(
        [("a", f"u{i}") for i in range(40)] + [("b", "x")], SCHEMA
    )
    got = {
        (r["grp"], r["h"])
        for r in hashed(df, group_col="grp", key_col="user").collect()
    }
    want = {
        (r["grp"], r["h"])
        for r in kmv_sketch(df, group_col="grp", key_col="user").collect()
    }
    assert want <= got and len(got) == 41


def test_tws_processor_merge_logic_matches_estimator():
    """Drive KMVProcessor.handleInputRows against a stub ListState: two
    overlapping batches must yield the batch estimator's (n_kept, est) —
    covers both the exact and the saturated branch without a state store."""
    import pandas as pd

    from agf_data_ingestion_spark.streaming.tws_kmv import _HASH_SPACE, KMVProcessor

    class StubList:
        def __init__(self):
            self.rows = []

        def get(self):
            return iter(self.rows)

        def put(self, rows):
            self.rows = list(rows)

    proc = KMVProcessor(k=8)
    proc._kmin = StubList()
    h1 = sorted({(i * 37) % 1000 for i in range(12)})
    h2 = sorted({(i * 37) % 1000 for i in range(6, 20)})
    out1 = list(proc.handleInputRows(("g",), iter([pd.DataFrame({"h": h1})]), None))
    out2 = list(proc.handleInputRows(("g",), iter([pd.DataFrame({"h": h2})]), None))
    union = sorted(set(h1) | set(h2))[:8]
    assert [int(t[0]) for t in proc._kmin.rows] == union
    last = out2[-1].iloc[0]
    assert int(last["n_kept"]) == 8
    assert float(last["est"]) == 7.0 * _HASH_SPACE / float(union[-1])
    assert int(out1[-1].iloc[0]["n_kept"]) == 8


def test_tws_kmv_matches_batch_estimator(spark, tmp_path):
    pytest.importorskip("google.protobuf.descriptor")
    src, chk = str(tmp_path / "src"), str(tmp_path / "chk")
    out = str(tmp_path / "out")

    # group a: 150 distinct users (> k=64 → estimation branch);
    # group b: 20 distinct (< k → exact branch).  Spread across two chops
    # with overlap so the merge path is exercised.
    chop1 = [{"grp": "a", "user": f"u{i}"} for i in range(90)] + [
        {"grp": "b", "user": f"v{i}"} for i in range(12)
    ]
    chop2 = [{"grp": "a", "user": f"u{i}"} for i in range(60, 150)] + [
        {"grp": "b", "user": f"v{i}"} for i in range(20)
    ]

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    try:
        _write(src, "c1.json", chop1)
        _run_round(spark, src, chk, out)
        _write(src, "c2.json", chop2)
        _run_round(spark, src, chk, out)
    finally:
        if prev:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    from pyspark.sql import Window

    emitted = spark.read.parquet(out)
    last = (
        emitted.withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("grp").orderBy(F.desc("batch_id"))),
        )
        .filter(F.col("rn") == 1)
        .select("grp", "n_kept", "est")
    )
    got = {r["grp"]: (r["n_kept"], r["est"]) for r in last.collect()}

    all_rows = spark.createDataFrame(
        [(r["grp"], r["user"]) for r in chop1 + chop2], SCHEMA
    )
    want_df = kmv_estimates(kmv_sketch(all_rows, group_col="grp", key_col="user"))
    want = {r["grp"]: (r["n_kept"], r["est"]) for r in want_df.collect()}

    assert got == want  # bit-identical estimates, both branches
    assert want["b"][0] == 20 and want["b"][1] == 20.0
    assert want["a"][0] == 64  # saturated sketch → estimation branch
