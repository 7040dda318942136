"""Persisted BM25 inverted index (operators/text_index.py): search parity
with the per-query batch scorer bit-for-bit, append ≡ from-scratch
rebuild (the ann_index invariant), atomic two-table commits, and the
pruned-probe contract (a term's plan opens a strict file subset)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from agf_data_ingestion_spark.operators.text_index import (
    _postings_tbl,
    _stats_tbl,
    text_index_append,
    text_index_create,
    text_index_search,
    text_index_stats,
)
from agf_data_ingestion_spark.plans.text import _BM25_TERMS, _BM25_TOPK
from agf_data_ingestion_spark.sources.snapshots import (
    plan_files,
    read_manifest,
    snapshot_read,
)

SF = "/root/testdata/sf0.001"


def _docs(spark, sf=SF):
    from agf_data_ingestion_spark.plans.base import t

    return t(spark, sf, "documents").select("doc_id", "text")


def test_search_equals_batch_bm25_bit_for_bit(spark, tmp_path):
    """The index path and the per-query scan path must produce the SAME
    top-k rows — same rational idf, same decimal accumulation chain,
    same (score desc, doc_id) order."""
    from agf_data_ingestion_spark.plans.text import docs_bm25_search

    root = str(tmp_path / "idx")
    text_index_create(_docs(spark), root)
    got = [
        (r["doc_id"], r["n_terms_matched"], r["score"])
        for r in text_index_search(
            spark, root, list(_BM25_TERMS), topk=_BM25_TOPK
        ).collect()
    ]
    want = [
        (r["doc_id"], r["n_terms_matched"], r["score"])
        for r in docs_bm25_search(spark, SF).collect()
    ]
    assert got == want
    assert len(got) > 0


def test_append_equals_from_scratch_rebuild(spark, tmp_path):
    d = _docs(spark)
    half1 = d.where("doc_id % 2 = 0")
    half2 = d.where("doc_id % 2 = 1")
    inc = str(tmp_path / "inc")
    full = str(tmp_path / "full")
    text_index_create(half1, inc)
    text_index_append(half2, inc)
    text_index_create(d, full)
    assert text_index_stats(spark, inc) == text_index_stats(spark, full)
    rows = lambda root: sorted(
        tuple(r)
        for r in snapshot_read(spark, _postings_tbl(root)).collect()
    )
    assert rows(inc) == rows(full)
    got = [tuple(r) for r in text_index_search(spark, inc, ["spark", "merge"]).collect()]
    want = [tuple(r) for r in text_index_search(spark, full, ["spark", "merge"]).collect()]
    assert got == want


def test_two_table_commit_is_atomic_and_versions_align(spark, tmp_path):
    root = str(tmp_path / "idx")
    text_index_create(_docs(spark).limit(50), root)
    text_index_append(_docs(spark).where("doc_id >= 50").limit(30), root)
    pm = read_manifest(_postings_tbl(root))
    sm = read_manifest(_stats_tbl(root))
    # both tables advanced in lockstep through the same two txns
    assert pm["version"] == sm["version"] == 2
    assert pm["op"].startswith("tidx_append")
    assert sm["op"].startswith("tidx_append")
    # stats fold equals a direct recount of the postings table
    n, t = text_index_stats(spark, root)
    direct = (
        snapshot_read(spark, _postings_tbl(root))
        .groupBy("doc_id")
        .agg(F.min("dl").alias("dl"))
        .agg(F.count("*"), F.sum("dl"))
        .collect()[0]
    )
    assert (n, t) == (direct[0], direct[1])


def test_probe_opens_strict_file_subset(spark, tmp_path):
    """Token clustering + blooms: a single term's plan must open fewer
    files than the table holds — the index's whole reason to exist.
    Range pruning cuts within each commit's token-range files; the bloom
    additionally excludes whole commits that never saw a rare term."""
    root = str(tmp_path / "idx")
    d = _docs(spark, "/root/testdata/sf0.01")
    planted = spark.createDataFrame(
        [(999_001, "zebraqx roams the zebraqx plains")], "doc_id long, text string"
    )
    text_index_create(d.where("doc_id % 3 = 0"), root, cluster_files=4)
    text_index_append(d.where("doc_id % 3 = 1"), root, cluster_files=4)
    text_index_append(
        d.where("doc_id % 3 = 2").union(planted), root, cluster_files=4
    )
    tbl = _postings_tbl(root)
    total = len(read_manifest(tbl)["files"])
    assert total >= 9
    # common term: range pruning keeps ~one token-range file per commit
    hit = plan_files(tbl, where=[("token", "==", "spark")])
    assert 1 <= len(hit) <= total // 2
    # planted rare term: the bloom disproves the first two commits even
    # where a token range would admit it
    rare = plan_files(tbl, where=[("token", "==", "zebraqx")])
    assert 1 <= len(rare) < len(hit) + 2
    # and the pruned read still finds every posting for the term
    pruned = (
        snapshot_read(spark, tbl, where=[("token", "==", "spark")])
        .where(F.col("token") == "spark")
        .count()
    )
    full = (
        snapshot_read(spark, tbl).where(F.col("token") == "spark").count()
    )
    assert pruned == full > 0
    rare_rows = (
        snapshot_read(spark, tbl, where=[("token", "==", "zebraqx")])
        .where(F.col("token") == "zebraqx")
        .count()
    )
    assert rare_rows == 1  # distinct (token, doc) posting with tf=2


def test_empty_query_and_unknown_term(spark, tmp_path):
    root = str(tmp_path / "idx")
    text_index_create(_docs(spark).limit(40), root)
    out = text_index_search(spark, root, ["qqqqzzzz"]).collect()
    assert out == []  # unknown term: no candidates, no crash
