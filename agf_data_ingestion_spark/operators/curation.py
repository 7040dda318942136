"""End-to-end training-corpus curation pipeline (OP-X-CURATE, r9 —
VERDICT r8 ask #1): raw corpus → training shards as ONE measured run,
published atomically.

The reference system's whole point is an end-to-end pipeline (its
CLAUDE.md data-flow diagram: lake → parse → derive → catalog → export,
agf_ingestion_lambda.py:187-454 feeding agf_zip_generator_lambda.py) —
this module is that hand-off re-expressed for LLM training consumers,
composing the already-oracle-checked catalog stages into one artifact:

    rule gate        docs_quality_gate      (plans/text.py)
    exact dedup      md5 keep-first window  (cmd_curate semantics)
    near-dup dedup   docs_dup_clusters      (plans/text.py)
    decontamination  docs_contamination     (plans/training_data.py)
    quality cut      trained model + the docs_quality_pr_curve threshold
    DoReMi weights   domain_reweight_frame  (plans/mixing.py)
    WFQ interleave   weighted_interleave    (operators/shards.py)
    shard assignment assign_shards          (operators/shards.py)

and PUBLISHING {shards, lineage, datacard, index(postings+stats)} in a
single ``snapshot_multi_write`` transaction — a trainer either sees the
whole release or none of it, and ``snapshot_read_txn`` pins every
consumer to the same publish event.

Determinism: every stage is a pure function of row values (no
partition-id, no sampled boundary leaks — assign_shards' two-pass prefix
sum is bit-deterministic by construction), so the pipeline output is
bit-identical to running the stages one at a time with parquet
materialization between them (pinned in tests/test_curation.py).

Scale shape per stage (the 100 TB story):

* every gate moves only (doc_id)-shaped survivor frames; the corpus
  text rides through semi-joins hash-partitioned on doc_id;
* the quality cut is the single-exchange apply shape (broadcast
  model, map-side partial collapse to 1 row/doc, then a per-language
  window over doc-count score rows — never the corpus text);
* DoReMi touches the corpus once (groupBy(source) with map-side
  partials) and iterates on the K-row domain table;
* WFQ + sharding: one per-source window + the bounded two-pass prefix
  sum (driver traffic ≤ partition count);
* the publish writes the corpus text exactly once (the shards table);
  lineage/datacard/stats are metadata-sized, postings are the usual
  token-clustered index build.

Each stage boundary is an eager ``localCheckpoint``: per-stage wall
times are honest (no lazy cost smearing into later stages) and no
stage's plan is recomputed by downstream actions.
"""

from __future__ import annotations

import time
from fractions import Fraction

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from agf_data_ingestion_spark.plans.base import t

#: per-language quantile resolution of the quality cut — the PR curve's
#: tile count (plans/quality_model._PR_TILES); the chosen cut_tile c
#: means "keep docs whose per-language ntile > c"
_CUT_TILES = 20

#: canonical documents-table column set carried through every stage
_DOC_COLS = ("doc_id", "text", "lang", "source", "n_chars")


def stage_rule_gate(spark: SparkSession, sf_dir: str, docs: DataFrame) -> DataFrame:
    """Gopher-style rule gate: semi-join against the keep set of
    ``docs_quality_gate`` — the gate itself is a map-only projection."""
    from agf_data_ingestion_spark.plans.text import docs_quality_gate

    keep = docs_quality_gate(spark, sf_dir).filter(F.col("keep")).select("doc_id")
    return docs.join(keep, "doc_id", "left_semi")


def stage_exact_dedup(docs: DataFrame) -> DataFrame:
    """Keep the lowest-doc_id copy of each exact (case-folded) text —
    chosen AMONG the current survivors so a group whose global
    representative was gated out keeps its surviving copy (the
    cmd_curate rule).  One shuffle on the md5 hash."""
    w = Window.partitionBy(F.md5(F.lower(F.col("text")))).orderBy(F.asc("doc_id"))
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def stage_neardup(spark: SparkSession, sf_dir: str, docs: DataFrame) -> DataFrame:
    """Near-duplicate collapse: cluster labels from the FULL-corpus LSH
    graph (edges through gated-out members still connect their surviving
    neighbors); keep the lowest-id SURVIVOR of each cluster."""
    from agf_data_ingestion_spark.plans.text import docs_dup_clusters

    labels = docs_dup_clusters(spark, sf_dir)
    w = Window.partitionBy("cluster_id").orderBy(F.asc("doc_id"))
    return (
        docs.join(labels, "doc_id")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "cluster_id")
    )


def stage_decontam(spark: SparkSession, sf_dir: str, docs: DataFrame) -> DataFrame:
    """Benchmark decontamination: drop documents sharing any shingle with
    the held-out benchmark set AND the benchmark documents themselves
    (a training release must not contain the eval set it was scrubbed
    against).  The contaminated side is (doc_id)-shaped; broadcast."""
    from agf_data_ingestion_spark.plans.training_data import (
        _BENCH_DOCS,
        docs_contamination,
    )

    contaminated = docs_contamination(spark, sf_dir).select("doc_id")
    return docs.filter(F.col("doc_id") >= _BENCH_DOCS).join(
        contaminated, "doc_id", "left_anti"
    )


def pick_cut_tile(spark: SparkSession, sf_dir: str) -> int:
    """Choose the operating threshold from the PR curve: the ``cut_tile``
    maximizing F1 on the planted held-out labels, compared as EXACT
    rationals (F1 = 2tp/(2tp+fp+fn); Fraction avoids any float tie
    ambiguity); ties break toward the smallest (most permissive) cut.
    The curve is ≤ 19 rows — driver-side by design."""
    from agf_data_ingestion_spark.plans.quality_model import docs_quality_pr_curve

    rows = docs_quality_pr_curve(spark, sf_dir).collect()
    if not rows:
        return 0
    best = max(
        rows,
        key=lambda r: (
            Fraction(2 * r["tp"], max(1, 2 * r["tp"] + r["fp"] + r["fn"])),
            -r["cut_tile"],
        ),
    )
    return int(best["cut_tile"])


def stage_quality_cut(
    spark: SparkSession, sf_dir: str, docs: DataFrame, cut_tile: int
) -> DataFrame:
    """Trained-quality threshold: score each surviving document's REAL
    text with the planted-corpus model (hashed character-bigram weights,
    plans/quality_model.py) and keep the top ``(N−c)/N`` quantile of
    every language — the exact policy whose operating curve
    ``docs_quality_pr_curve`` sweeps, applied at the curve-chosen cut.

    Single-exchange shape: bigram rows LEFT-join the broadcast ≤4096-row
    model, ONE groupBy(doc_id) collapses map-side to a row per doc, and
    the per-language ntile windows doc-count score rows (never text)."""
    from agf_data_ingestion_spark.plans.quality_model import (
        _D,
        _bigrams,
        _corpus,
        _weights,
    )

    w = _weights(_bigrams(_corpus(spark, sf_dir))).select("bucket", "weight")
    bg = (
        docs.filter(F.length("text") >= 2)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.length("text") - 1)).alias("i"),
            F.col("text"),
        )
        .select(
            "doc_id",
            (
                F.conv(
                    F.substring(F.md5(F.col("text").substr(F.col("i"), F.lit(2))), 1, 6),
                    16,
                    10,
                ).cast("long")
                % _D
            ).alias("bucket"),
        )
    )
    scores = (
        bg.join(F.broadcast(w), "bucket", "left")
        .groupBy("doc_id")
        .agg(F.coalesce(F.sum("weight"), F.lit(0)).cast("long").alias("_score"))
    )
    tiled = (
        docs.select("doc_id", "lang")
        .join(scores, "doc_id", "left")
        .na.fill({"_score": 0})
        .withColumn(
            "_tile",
            F.ntile(_CUT_TILES).over(
                Window.partitionBy("lang").orderBy("_score", "doc_id")
            ),
        )
        .filter(F.col("_tile") > cut_tile)
        .select("doc_id")
    )
    return docs.join(tiled, "doc_id", "left_semi")


def curate_full(
    spark: SparkSession,
    sf_dir: str,
    out_root: str,
    *,
    budget_tokens: int = 4000,
    seed: str = "0",
    index_cluster_files: int | None = None,
) -> dict:
    """Run the whole curation pipeline and publish the release as ONE
    multi-table transaction.  Returns the funnel report:

    ``{"stages": [{"name", "rows_out", "wall_s"}, ...], "cut_tile": c,
      "weights": {source: weight_ppm}, "n_shards": n, "total_tokens": t,
      "txn": {"id": ..., "versions": {table: v}}, "tables": {...},
      "wall_s": total}``
    """
    import os

    from agf_data_ingestion_spark.operators.shards import (
        assign_shards,
        weighted_interleave,
    )
    from agf_data_ingestion_spark.operators.text_index import (
        _batch_stats,
        _encode,
    )
    from agf_data_ingestion_spark.plans.mixing import domain_reweight_frame
    from agf_data_ingestion_spark.plans.training_data import datacard_frame
    from agf_data_ingestion_spark.sources.snapshots import (
        snapshot_multi_write,
        snapshot_read_txn,
        snapshot_txn_id,
    )

    t_run = time.time()
    stages: list[dict] = []

    def _checkpointed(name: str, df: DataFrame) -> DataFrame:
        t0 = time.time()
        out = df.select(*_DOC_COLS).localCheckpoint(eager=True)
        stages.append(
            {"name": name, "rows_out": out.count(), "wall_s": round(time.time() - t0, 3)}
        )
        return out

    docs = _checkpointed("input", t(spark, sf_dir, "documents"))
    docs = _checkpointed("rule_gate", stage_rule_gate(spark, sf_dir, docs))
    docs = _checkpointed("exact_dedup", stage_exact_dedup(docs))
    docs = _checkpointed("neardup", stage_neardup(spark, sf_dir, docs))
    docs = _checkpointed("decontam", stage_decontam(spark, sf_dir, docs))

    t0 = time.time()
    cut = pick_cut_tile(spark, sf_dir)
    docs = _checkpointed("quality_cut", stage_quality_cut(spark, sf_dir, docs, cut))
    stages[-1]["wall_s"] = round(time.time() - t0, 3)  # include curve pick

    t0 = time.time()
    weights = domain_reweight_frame(docs).select("source", "weight_ppm")
    wrows = {r["source"]: int(r["weight_ppm"]) for r in weights.collect()}
    weights = spark.createDataFrame(
        sorted(wrows.items()), "source string, weight_ppm long"
    )
    stages.append(
        {"name": "doremi_weights", "rows_out": len(wrows), "wall_s": round(time.time() - t0, 3)}
    )

    t0 = time.time()
    assigned = assign_shards(
        weighted_interleave(docs, weights, seed=seed),
        budget_tokens=budget_tokens,
        seed=seed,
        order_key="_wfq",
    ).drop("_wfq", "_t", "weight_ppm")
    assigned = assigned.localCheckpoint(eager=True)
    n_final = assigned.count()
    stages.append(
        {"name": "wfq_shards", "rows_out": n_final, "wall_s": round(time.time() - t0, 3)}
    )

    # release datacard: the standard sections over the FINAL corpus plus
    # the funnel itself (one row per stage) — the provenance a release
    # ships with
    funnel = spark.createDataFrame(
        [("funnel", s["name"], s["rows_out"]) for s in stages],
        "section string, key string, value long",
    )
    datacard = datacard_frame(assigned.select(*_DOC_COLS)).unionByName(funnel)

    lineage = assigned.select("doc_id", "shard_id", "n_tokens")
    postings = _encode(assigned.select("doc_id", "text"), "text", "doc_id")
    stats = _batch_stats(postings)

    shards_tbl = os.path.join(out_root, "shards")
    lineage_tbl = os.path.join(out_root, "lineage")
    datacard_tbl = os.path.join(out_root, "datacard")
    postings_tbl = os.path.join(out_root, "index", "postings")
    stats_tbl = os.path.join(out_root, "index", "stats")

    t0 = time.time()
    versions = snapshot_multi_write(
        [
            (assigned, shards_tbl),
            (lineage, lineage_tbl),
            (datacard, datacard_tbl),
            (postings, postings_tbl),
            (stats, stats_tbl),
        ],
        mode="overwrite",
        op=f"curate_full:{seed}:{budget_tokens}",
        cluster_by={
            shards_tbl: ["shard_id", "global_pos"],
            lineage_tbl: ["doc_id"],
            postings_tbl: ["token"],
        },
        bloom_cols={lineage_tbl: ["doc_id"], postings_tbl: ["token"]},
        cluster_files=(
            {postings_tbl: index_cluster_files} if index_cluster_files else None
        ),
    )
    stages.append(
        {"name": "publish", "rows_out": n_final, "wall_s": round(time.time() - t0, 3)}
    )

    # txn-aligned read-back: all five tables resolve to the SAME publish
    # event, and the shards table round-trips the exact row count — the
    # "did the release land whole" check a consumer would run
    t0 = time.time()
    aligned = snapshot_read_txn(
        spark, [shards_tbl, lineage_tbl, datacard_tbl, postings_tbl, stats_tbl]
    )
    n_read = aligned[shards_tbl].count()
    if n_read != n_final:
        raise AssertionError(
            f"curate_full: published shards read back {n_read} rows, expected {n_final}"
        )
    stages.append(
        {"name": "txn_read_verify", "rows_out": n_read, "wall_s": round(time.time() - t0, 3)}
    )

    tok_row = assigned.agg(
        F.max("shard_id").alias("m"), F.sum("n_tokens").alias("t")
    ).collect()[0]
    return {
        "stages": stages,
        "cut_tile": cut,
        "weights": wrows,
        "n_shards": (int(tok_row["m"]) + 1) if tok_row["m"] is not None else 0,
        "total_tokens": int(tok_row["t"]) if tok_row["t"] is not None else 0,
        "budget_tokens": budget_tokens,
        "seed": seed,
        "txn": {
            "id": snapshot_txn_id(shards_tbl, versions[shards_tbl]),
            "versions": versions,
        },
        "tables": {
            "shards": shards_tbl,
            "lineage": lineage_tbl,
            "datacard": datacard_tbl,
            "postings": postings_tbl,
            "stats": stats_tbl,
        },
        "wall_s": round(time.time() - t_run, 3),
    }
