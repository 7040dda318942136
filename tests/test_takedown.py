"""Shard takedown (r8): surgical GDPR/rights-holder removal from
materialized training shards — lineage-routed (snapshot table,
range-clustered + bloom'd on doc_id), O(affected shards) rewrite with
atomic file swaps, zero-read equality-delete lineage erasure, manifest
audit.  Untouched shards must stay BYTE-identical and surviving
positions must not move (a takedown leaves holes; it never re-shards).
"""

from __future__ import annotations

import hashlib
import json
import os

import pytest
from pyspark.sql import functions as F

from agf_data_ingestion_spark.operators.shards import (
    takedown_shards,
    write_training_shards,
)
from agf_data_ingestion_spark.sources.snapshots import (
    snapshot_read,
    snapshot_rowcount,
)


def _docs(spark, n=80):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("w"),
            F.col("id").cast("string"),
            F.expr("repeat(' tok', CAST(id % 17 AS INT) + 3)"),
        ).alias("text"),
    )


def _file_hashes(out_dir):
    root = os.path.join(out_dir, "shards")
    out = {}
    for dirpath, _dirs, names in os.walk(root):
        for n in names:
            if n.endswith(".parquet"):
                p = os.path.join(dirpath, n)
                with open(p, "rb") as fh:
                    out[p] = hashlib.md5(fh.read()).hexdigest()
    return out


def _shard_rows(spark, out_dir):
    df = spark.read.parquet(os.path.join(out_dir, "shards"))
    return {
        (r["doc_id"], r["global_pos"], r["shard_id"]) for r in df.collect()
    }


@pytest.fixture(scope="module")
def lake(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("shards"))
    manifest = write_training_shards(
        _docs(spark), out, budget_tokens=64, seed="s"
    )
    return {"out": out, "manifest": manifest}


def test_takedown_removes_exactly_and_leaves_others_byte_identical(
    spark, lake
):
    out = lake["out"]
    before = _shard_rows(spark, out)
    hashes0 = _file_hashes(out)
    # pick ids from exactly two shards via the lineage table
    lin = snapshot_read(spark, os.path.join(out, "lineage"))
    by_shard = {
        r["shard_id"]: r["doc_id"]
        for r in lin.orderBy("doc_id").collect()
    }
    shard_ids = sorted(by_shard)[:2]
    removed = [by_shard[s] for s in shard_ids]
    rep = takedown_shards(spark, out, removed)
    assert rep["removed_docs"] == len(removed)
    assert rep["affected_shards"] == sorted(shard_ids)
    after = _shard_rows(spark, out)
    # exactly the removed docs are gone; surviving positions unchanged
    assert {t for t in before if t[0] not in set(removed)} == after
    # untouched shard files byte-identical
    hashes1 = _file_hashes(out)
    touched_dirs = {f"shard_id={s}" for s in shard_ids}
    for p, h in hashes1.items():
        if not any(t in p for t in touched_dirs):
            assert hashes0[p] == h, p
    # lineage no longer lists the removed docs, and metadata rowcount is
    # exact again (maintenance compacted the eq debt inside takedown)
    lin2 = snapshot_read(spark, os.path.join(out, "lineage"))
    assert lin2.where(F.col("doc_id").isin(removed)).count() == 0
    assert snapshot_rowcount(os.path.join(out, "lineage")) == len(before) - len(
        removed
    )


def test_manifest_counts_and_audit_updated(spark, lake):
    out = lake["out"]
    with open(os.path.join(out, "manifest.json")) as fh:
        m = json.load(fh)
    assert m["takedowns"] and m["takedowns"][0]["removed_docs"] >= 1
    df = spark.read.parquet(os.path.join(out, "shards"))
    truth = {
        str(r["shard_id"]): (r["docs"], r["toks"])
        for r in df.groupBy("shard_id")
        .agg(F.count("*").alias("docs"), F.sum("n_tokens").alias("toks"))
        .collect()
    }
    for sid, ms in m["shards"].items():
        docs, toks = truth.get(sid, (0, 0))
        assert ms["docs"] == docs, sid
        assert ms["tokens"] == toks, sid


def test_idempotent_and_unknown_ids_are_noops(spark, lake):
    out = lake["out"]
    with open(os.path.join(out, "manifest.json")) as fh:
        m0 = json.load(fh)
    already = m0["takedowns"][0]["affected_shards"]
    hashes0 = _file_hashes(out)
    # replay the same takedown ids (already erased) + a never-existing id
    rep = takedown_shards(spark, out, [10_000_000])
    assert rep["removed_docs"] == 0 and rep.get("untouched")
    assert _file_hashes(out) == hashes0
    with open(os.path.join(out, "manifest.json")) as fh:
        m1 = json.load(fh)
    assert len(m1["takedowns"]) == len(m0["takedowns"])  # no new audit row
    assert already == m1["takedowns"][0]["affected_shards"]


def test_empty_shard_survives_as_zero_row_file(spark, tmp_path):
    out = str(tmp_path / "tiny")
    write_training_shards(_docs(spark, 12), out, budget_tokens=40, seed="z")
    lin = snapshot_read(spark, os.path.join(out, "lineage"))
    # wipe one whole shard
    sid = lin.agg(F.max("shard_id")).collect()[0][0]
    wiped = [r["doc_id"] for r in lin.where(F.col("shard_id") == sid).collect()]
    rep = takedown_shards(spark, out, wiped)
    assert rep["affected_shards"] == [sid]
    sdir = os.path.join(out, "shards", f"shard_id={sid}")
    assert spark.read.parquet(sdir).count() == 0  # empty, not missing
    with open(os.path.join(out, "manifest.json")) as fh:
        m = json.load(fh)
    assert m["shards"][str(sid)]["docs"] == 0
    assert m["shards"][str(sid)]["tokens"] == 0


def test_lineage_disabled_refuses(spark, tmp_path):
    out = str(tmp_path / "nolin")
    write_training_shards(
        _docs(spark, 10), out, budget_tokens=40, lineage=False
    )
    with pytest.raises(ValueError, match="without lineage"):
        takedown_shards(spark, out, [1])
