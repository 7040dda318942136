"""Release-level GDPR erasure (operators/curation.py `release_forget`):
the ten-table twin of takedown_shards.  Pins: the forgotten documents
vanish from every content-derived table's CURRENT state, stats repair
exactly, survivors are untouched, the audit trail lands, replays are
no-ops, and the PRE-forget txn remains time-travelable (logical erasure
is immediate; physical reclaim is maintenance + expiry, the takedown
rule)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from agf_data_ingestion_spark.operators.curation import (
    curate_full,
    release_forget,
    verify_release,
)
from agf_data_ingestion_spark.sources.snapshots import (
    current_version,
    snapshot_read,
    snapshot_read_txn,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("forget_rel"))
    rel = curate_full(spark, SF_SMOKE, out, budget_tokens=2000, seed="0")
    before = {
        r["doc_id"]: (r["shard_id"], r["global_pos"], r["n_tokens"])
        for r in snapshot_read(spark, rel["tables"]["shards"])
        .select("doc_id", "shard_id", "global_pos", "n_tokens")
        .collect()
    }
    victims = sorted(before)[:2]
    rep = release_forget(spark, out, victims)
    return {"rel": rel, "out": out, "before": before, "victims": victims, "rep": rep}


def test_forgotten_everywhere_and_survivors_untouched(spark, setup):
    rel, before, victims = setup["rel"], setup["before"], setup["victims"]
    assert setup["rep"]["found"] == len(victims)
    t = rel["tables"]
    for name, id_col in (
        ("shards", "doc_id"),
        ("lineage", "doc_id"),
        ("postings", "doc_id"),
        ("hashes", "doc_id"),
        ("bands", "doc_id"),
        ("sets", "doc_id"),
    ):
        ids = {
            r[id_col]
            for r in snapshot_read(spark, t[name]).select(id_col).distinct().collect()
        }
        assert not (ids & set(victims)), name
    # survivors byte-stable: same shard, same position, same token count
    now = {
        r["doc_id"]: (r["shard_id"], r["global_pos"], r["n_tokens"])
        for r in snapshot_read(spark, t["shards"])
        .select("doc_id", "shard_id", "global_pos", "n_tokens")
        .collect()
    }
    assert now == {k: v for k, v in before.items() if k not in victims}
    # stats repaired exactly to the survivor totals (BM25 dl fold)
    post = snapshot_read(spark, t["postings"])
    dl = post.groupBy("doc_id").agg(F.min("dl").alias("dl"))
    srow = snapshot_read(spark, t["stats"]).agg(
        F.sum("n_docs").alias("n"), F.sum("tot_dl").alias("t")
    ).collect()[0]
    assert int(srow["n"]) == len(now)
    assert int(srow["t"]) == int(dl.agg(F.sum("dl")).collect()[0][0])
    # audit trail
    audited = {
        int(r["key"])
        for r in snapshot_read(spark, t["datacard"])
        .filter(F.col("section") == "takedown")
        .collect()
    }
    assert audited == set(victims)


def test_forget_is_idempotent_and_txn_time_travels(spark, setup):
    rel, out, victims = setup["rel"], setup["out"], setup["victims"]
    shards = rel["tables"]["shards"]
    v = current_version(shards)
    assert release_forget(spark, out, victims) == {"found": 0, "erased": 0}
    assert current_version(shards) == v
    # the publish txn still time-travels with the victims present —
    # logical erasure is current-state; physical reclaim is maintenance +
    # expiry (the takedown rule), not a history rewrite
    pinned = snapshot_read_txn(spark, [shards], txn_id=rel["txn"]["id"])[shards]
    old_ids = {r["doc_id"] for r in pinned.select("doc_id").collect()}
    assert set(victims) <= old_ids


def test_verify_release_after_forget(spark, setup):
    """The audit's coverage checks hold on the post-forget CURRENT state:
    every content table erased together (verified here directly, since
    verify_release's txn-pinned view legitimately sees the old publish)."""
    rep = verify_release(spark, setup["out"], txn_id=setup["rel"]["txn"]["id"])
    # the txn-pinned audit still passes — history is coherent
    assert rep["ok"]


def test_incremental_append_after_forget(spark, setup):
    """The release keeps accepting O(batch) appends after an erasure:
    probe stores with live equality-delete debt still answer correctly
    (a batch doc duplicating a FORGOTTEN doc's text is NOT blocked — the
    text of record is gone, so re-ingesting it is legitimate), and shard
    continuation ids skip past the holes."""
    from agf_data_ingestion_spark.operators.curation import curate_incremental

    rel, out, victims = setup["rel"], setup["out"], setup["victims"]
    # the forgotten doc's text, re-arriving with a fresh id
    old = setup["before"]
    # reconstruct the victim's text from the pinned pre-forget txn
    pinned = snapshot_read_txn(
        spark, [rel["tables"]["shards"]], txn_id=rel["txn"]["id"]
    )[rel["tables"]["shards"]]
    vic = (
        pinned.filter(F.col("doc_id") == victims[0])
        .select("text", "lang", "source")
        .collect()[0]
    )
    batch = spark.createDataFrame(
        [(5_000_000, vic["text"], vic["lang"], vic["source"], len(vic["text"]))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rep = curate_incremental(
        spark, batch, out, batch_label="postforget", seed="0", budget_tokens=2000
    )
    appended = {
        r["doc_id"]
        for r in snapshot_read(spark, rel["tables"]["shards"])
        .select("doc_id")
        .collect()
        if r["doc_id"] >= 5_000_000
    }
    # the re-ingested text passes the hash probe (the published copy was
    # erased) and every other frozen gate it passed at release time
    assert appended == {5_000_000}
    assert rep["first_new_shard"] > max(s for s, _p, _t in old.values())


def test_torn_forget_detected_by_current_audit(spark, setup):
    """r10 (ADVICE r9): a forget torn mid-way (some stores erased, shards
    not yet) reads GREEN under the txn-pinned audit — eq-delete commits
    carry no txn marker, so the pin resolves the pre-forget publish — and
    must therefore fail the CURRENT-state audit until an idempotent
    re-run completes the erasure.  Runs LAST in this module: it advances
    the shared release's forget state."""
    from agf_data_ingestion_spark.sources.snapshots import snapshot_delete_keys

    out, rel = setup["out"], setup["rel"]
    victim = sorted(setup["before"])[5]
    assert victim not in setup["victims"]
    # tear: erase the hash-store row only (the crash window between
    # release_forget's per-table eq deletes)
    keys = spark.createDataFrame([(int(victim),)], "doc_id long")
    snapshot_delete_keys(keys, rel["tables"]["hashes"])

    torn = verify_release(spark, out, current=True)
    assert torn["mode"] == "current"
    assert not torn["ok"]
    assert torn["checks"]["hashes_cover"] is False
    # the txn-pinned default still reads the pre-forget publish green —
    # exactly why it cannot confirm erasure
    assert verify_release(spark, out, txn_id=rel["txn"]["id"])["ok"]

    # idempotent re-run completes the erasure; current state goes green
    rep = release_forget(spark, out, [victim])
    assert rep["found"] == 1
    healed = verify_release(spark, out, current=True)
    assert healed["ok"], healed["checks"]
    assert healed["checks"]["global_pos_dense"] is False  # holes: informational
