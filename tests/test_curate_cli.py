"""The curate subcommand: quality gate → exact dedup → near-dup reps,
checked against independently-computed per-stage survivor sets."""

from __future__ import annotations

import pytest

import argparse
import importlib.util
import json
import os

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"

_spec = importlib.util.spec_from_file_location(
    "agf_pipeline",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts", "agf_pipeline.py"),
)
_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_mod)


def test_curate_funnel(spark, tmp_path, capsys):
    out = str(tmp_path / "curated")
    rc = _mod.cmd_curate(argparse.Namespace(docs=SF, out=out))
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    from agf_data_ingestion_spark.plans.base import t
    from agf_data_ingestion_spark.plans.text import docs_dup_clusters, docs_quality_gate

    docs = t(spark, SF, "documents")
    assert report["input"] == docs.count()
    gate_ids = {r.doc_id for r in docs_quality_gate(spark, SF).filter(F.col("keep")).collect()}
    assert report["after_quality_gate"] == len(gate_ids)

    # representatives are chosen among survivors, not the full corpus
    texts = {r.doc_id: r.text.lower() for r in docs.collect()}
    by_hash: dict[str, int] = {}
    for d in sorted(gate_ids):
        by_hash.setdefault(texts[d], d)
    exact_ids = set(by_hash.values())
    assert report["after_exact_dedup"] == len(exact_ids)

    cluster_of = {r.doc_id: r.cluster_id for r in docs_dup_clusters(spark, SF).collect()}
    by_cluster: dict[int, int] = {}
    for d in sorted(exact_ids):
        by_cluster.setdefault(cluster_of[d], d)
    expected_final = set(by_cluster.values())
    assert report["after_neardup"] == len(expected_final)

    written = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert written == expected_final
    # the funnel only narrows
    assert (
        report["input"]
        >= report["after_quality_gate"]
        >= report["after_exact_dedup"]
        >= report["after_neardup"]
        > 0
    )


def test_curate_decontaminate_and_split(spark, tmp_path, capsys):
    out = str(tmp_path / "curated_full")
    rc = _mod.cmd_curate(
        argparse.Namespace(docs=SF, out=out, decontaminate=True, split=True)
    )
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    from agf_data_ingestion_spark.plans.training_data import docs_contamination

    contaminated = {r.doc_id for r in docs_contamination(spark, SF).collect()}
    written = spark.read.parquet(out)
    ids = {r.doc_id for r in written.select("doc_id").collect()}
    # decontamination stage removed every flagged doc
    assert not (ids & contaminated)
    assert report["after_decontamination"] == len(ids)
    assert report["after_decontamination"] <= report["after_neardup"]
    # split column present, matches the catalog assignment, totals add up
    assert set(report["splits"]) <= {"train", "val", "test"}
    assert sum(report["splits"].values()) == len(ids)
    from agf_data_ingestion_spark.plans.training_data import split_assignment
    from pyspark.sql import functions as F

    mismatch = written.withColumn("expect", split_assignment()).filter(
        F.col("split") != F.col("expect")
    )
    assert mismatch.count() == 0


def test_curate_with_shard_export(spark, tmp_path, capsys):
    out = str(tmp_path / "curated")
    shards_dir = str(tmp_path / "shards")
    rc = _mod.cmd_curate(
        argparse.Namespace(
            docs=SF,
            out=out,
            decontaminate=False,
            split=True,
            shards=shards_dir,
            shard_tokens=1500,
            shard_seed="cli",
        )
    )
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["shards"]["n_shards"] >= 1
    with open(os.path.join(shards_dir, "manifest.json")) as fh:
        manifest = json.load(fh)
    assert manifest["seed"] == "cli" and manifest["budget_tokens"] == 1500
    back = spark.read.parquet(os.path.join(shards_dir, "shards"))
    # shard export carries exactly the curated survivor set (with split col)
    assert back.count() == report["after_neardup"]
    assert "split" in back.columns and "global_pos" in back.columns
    assert sum(m["docs"] for m in manifest["shards"].values()) == back.count()


def test_curate_release_table_and_tag(spark, tmp_path, capsys):
    from agf_data_ingestion_spark.sources.snapshots import snapshot_read, snapshot_tags

    out = str(tmp_path / "curated")
    tbl = str(tmp_path / "corpus_releases")
    rc = _mod.cmd_curate(
        argparse.Namespace(
            docs=SF, out=out, decontaminate=False, split=False,
            shards=None, release_table=tbl, release_tag="corpus-v1.0",
        )
    )
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["release"] == {"table": tbl, "version": 1, "tag": "corpus-v1.0"}
    assert snapshot_tags(tbl) == {"corpus-v1.0": 1}
    released = snapshot_read(spark, tbl, tag="corpus-v1.0")
    assert released.count() == report["after_neardup"]


@pytest.mark.heavy_rung  # r13 suite-wall gate: scale rung; property pinned by tests/test_maintenance.py + test_snapshots.py expiry/compaction
def test_maintain_cli_compacts_and_reclaims(spark, tmp_path, capsys):
    import json

    from agf_data_ingestion_spark.sources.snapshots import (
        current_version,
        snapshot_read,
        snapshot_write,
    )
    from scripts.agf_pipeline import main as pipeline_main

    tbl = str(tmp_path / "tbl")
    for k in range(4):
        snapshot_write(
            spark.createDataFrame([(k, "x")], "k long, v string").coalesce(1), tbl
        )
    import sys

    argv = sys.argv
    sys.argv = [
        "agf_pipeline.py", "maintain", "--table", tbl,
        "--keep-last", "1", "--orphan-grace-s", "0",
    ]
    try:
        rc = pipeline_main()
    finally:
        sys.argv = argv
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["compaction_committed"] is True
    assert out["paths_reclaimed"] > 0
    assert out["version_after"] == current_version(tbl)
    assert sorted(r["k"] for r in snapshot_read(spark, tbl).collect()) == [0, 1, 2, 3]


def test_history_cli(spark, tmp_path, capsys):
    import json
    import sys

    from agf_data_ingestion_spark.sources.snapshots import snapshot_tag, snapshot_write
    from scripts.agf_pipeline import main as pipeline_main

    tbl = str(tmp_path / "tbl")
    snapshot_write(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"), tbl)
    snapshot_tag(tbl, "rel-1")
    snapshot_write(spark.createDataFrame([(3, "c")], "k long, v string"), tbl)
    argv = sys.argv
    sys.argv = ["agf_pipeline.py", "history", "--table", tbl]
    try:
        rc = pipeline_main()
    finally:
        sys.argv = argv
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["current_version"] == 2 and out["rows"] == 3
    assert out["tags"] == {"rel-1": 1}
    assert [h["version"] for h in out["history"]] == [1, 2]
    assert out["history"][-1]["total_rows"] == 3


@pytest.mark.heavy_rung  # r13 suite-wall gate: scale rung; property pinned by tests/test_lm.py BPE equivalence
def test_tokenizer_subcommand_emits_merge_table(spark, capsys):
    """r5: the tokenizer subcommand prints the trained merge table plus
    corpus token totals as one JSON line, consistent with the catalog
    queries it wraps."""
    rc = _mod.cmd_tokenizer(argparse.Namespace(docs=SF))
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    from agf_data_ingestion_spark.plans.lm import _BPE_ROUNDS, docs_bpe_train

    assert [m["round"] for m in report["merges"]] == list(range(1, _BPE_ROUNDS + 1))
    expected = {
        r["round"]: (r["x"], r["y"], r["merged"], r["pair_count"])
        for r in docs_bpe_train(spark, SF).collect()
    }
    for m in report["merges"]:
        assert expected[m["round"]] == (m["pair"][0], m["pair"][1], m["merged"], m["count"])
    # tokenization never inflates below 1 token/word or above chars/word
    assert report["corpus_bpe_tokens"] >= report["corpus_words"]


def test_forget_keys_coerces_by_declared_type(spark, tmp_path, capsys):
    """ADVICE r7: `forget --keys score=1` on a DOUBLE key column must
    coerce the literal to float (PySpark's verifier rejects int for
    DoubleType) and commit a zero-read equality delete."""
    import sys

    from agf_data_ingestion_spark.sources.snapshots import (
        snapshot_read,
        snapshot_write,
    )
    from scripts.agf_pipeline import main as pipeline_main

    tbl = str(tmp_path / "tbl")
    snapshot_write(
        spark.createDataFrame(
            [(1.0, "a"), (2.5, "b"), (3.0, "c")], "score double, v string"
        ),
        tbl,
    )
    argv = sys.argv
    sys.argv = ["agf_pipeline.py", "forget", "--table", tbl, "--keys", "score=1"]
    try:
        rc = pipeline_main()
    finally:
        sys.argv = argv
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["committed"] is True and out["mode"] == "eq"
    got = sorted(r["score"] for r in snapshot_read(spark, tbl).collect())
    assert got == [2.5, 3.0]
    # and an unparseable literal fails with a clear message, not a stack
    sys.argv = ["agf_pipeline.py", "forget", "--table", tbl, "--keys", "score=abc"]
    try:
        import pytest as _pytest

        with _pytest.raises(SystemExit, match="cannot parse"):
            pipeline_main()
    finally:
        sys.argv = argv
