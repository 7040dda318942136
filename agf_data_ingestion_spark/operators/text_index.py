"""Persisted, incrementally-maintained BM25 inverted index (OP-X-TEXTIDX).

The query-side BM25 (plans/text.py ``docs_bm25_search``) re-tokenizes the
corpus per query — right for one-off analytics, wrong for a serving path:
at 100 TB a query must touch index bytes proportional to its TERMS, not to
the corpus.  This operator materializes the classic Lucene decomposition
on the snapshot table format (sources/snapshots.py):

* ``<root>/postings`` — one row per (token, doc_id) with the term
  frequency AND the doc length denormalized in (``dl`` costs 8 bytes per
  posting and removes the corpus-sized doc-length join from every query —
  the norms-file trade, resolved the wide way because postings are the
  only table a probe reads); ``cluster_by=["token"]`` + a token bloom
  make per-file token ranges tight, so a probe's ``plan_files`` opens a
  strict file subset per term (test-pinned).
* ``<root>/stats`` — append-only per-batch DELTA rows (batch doc count,
  batch token count).  Corpus totals are the SUM of a tiny table, which
  makes concurrent appends COMMUTE: two racing appends each land their
  own delta row and the fold is order-free exact integers — no
  read-modify-write, no lock, no stale-cumulative race.  (A cumulative
  counter in the commit marker — the ann_stream bookmark pattern — would
  go stale on an OCC rebase; deltas cannot.)

Both tables commit as ONE atomic multi-table transaction
(``snapshot_multi_write``): a reader never observes postings whose stats
row hasn't landed or vice versa, a crash between the two is repaired or
reclaimed by the txn marker protocol, and index maintenance inherits
time travel / CDC / OCC like any other table pair.

Append never re-reads the corpus: the batch is tokenized O(batch),
postings append + stats delta land atomically, and the table after any
append sequence is bit-identical to a from-scratch build of the union
corpus (the ann_index invariant, pinned in tests/test_text_index.py).

Scoring matches ``docs_bm25_search`` bit-for-bit: the rational log-free
idf ``(N − df + 0.5)/(df + 0.5)`` (ln() is libm-dependent), per-term
contributions cast to DECIMAL(25,9) and summed as a FIXED per-term column
chain (accumulation-order-independent), identical k1/b constants.  df
comes free from the probed postings themselves; N/avgdl from the stats
fold.  Search cost: |terms| pruned scans + one candidate-sized aggregate
+ TakeOrderedAndProject top-k — corpus size only enters through the
(pruned) posting list lengths.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from agf_data_ingestion_spark.plans.text import _BM25_B, _BM25_K1, _words
from agf_data_ingestion_spark.sources.snapshots import (
    snapshot_multi_write,
    snapshot_read,
)


def _postings_tbl(root: str) -> str:
    return os.path.join(root, "postings")


def _stats_tbl(root: str) -> str:
    return os.path.join(root, "stats")


def _encode(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(token, doc_id, tf, dl) posting rows for a document batch — one
    tokenize pass, map-side-combined aggregates, O(batch)."""
    tokens = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(_words(text_col)).alias("token")
    )
    dl = tokens.groupBy("doc_id").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("dl")
    )
    tf = tokens.groupBy("token", "doc_id").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("tf")
    )
    # dl join is batch-sized on both sides (never the corpus)
    return tf.join(dl, "doc_id").select("token", "doc_id", "tf", "dl")


def _batch_stats(postings: DataFrame) -> DataFrame:
    """One delta row (n_docs, tot_dl) for the batch, derived from its own
    posting rows so the pair can never disagree."""
    return postings.groupBy("doc_id").agg(F.min("dl").alias("dl")).agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_docs"),
        F.expr("CAST(SUM(dl) AS BIGINT)").alias("tot_dl"),
    )


def text_index_create(
    docs: DataFrame,
    root: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    cluster_files: int | None = None,
) -> dict:
    """Build (or rebuild) the index from scratch as one atomic two-table
    commit.  Postings are token-clustered with a token bloom — the
    data-skipping layout every probe depends on.  ``cluster_files``
    forces the commit into that many token-range files (at cluster scale
    the write fans out on its own; locally AQE coalesces a small batch
    into one whole-alphabet file and range pruning has nothing to cut)."""
    postings = _encode(docs, text_col, id_col)
    return _index_write(
        root, postings, mode="overwrite", op="tidx_create",
        cluster_files=cluster_files,
    )


def text_index_append(
    docs: DataFrame,
    root: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    cluster_files: int | None = None,
    op: str | None = None,
) -> dict:
    """Fold a new document batch in: O(batch) tokenize + atomic postings
    append + stats delta.  Concurrent appends commute (delta rows);
    resulting tables are bit-identical to a from-scratch build of the
    union corpus.  ``op`` overrides the commit label — the streaming
    runtime rides its exactly-once bookmark in it (the upsert_stream
    pattern)."""
    postings = _encode(docs, text_col, id_col)
    return _index_write(
        root, postings, mode="append", op=op or "tidx_append",
        cluster_files=cluster_files,
    )


def _index_write(
    root: str,
    postings: DataFrame,
    *,
    mode: str,
    op: str,
    cluster_files: int | None = None,
) -> dict:
    stats = _batch_stats(postings)
    p_tbl = _postings_tbl(root)
    return snapshot_multi_write(
        [(postings, p_tbl), (stats, _stats_tbl(root))],
        mode=mode,
        op=op,
        cluster_by={p_tbl: ["token"]},
        bloom_cols={p_tbl: ["token"]},
        cluster_files={p_tbl: cluster_files} if cluster_files else None,
    )


def text_index_stats(spark: SparkSession, root: str) -> tuple[int, int]:
    """(n_docs, tot_dl) — the order-free integer fold over the tiny
    delta table."""
    r = (
        snapshot_read(spark, _stats_tbl(root))
        .agg(
            F.expr("CAST(SUM(n_docs) AS BIGINT)").alias("n"),
            F.expr("CAST(SUM(tot_dl) AS BIGINT)").alias("t"),
        )
        .collect()[0]
    )
    return int(r["n"]), int(r["t"])


def text_index_search(
    spark: SparkSession,
    root: str,
    terms: list[str],
    *,
    topk: int = 15,
) -> DataFrame:
    """Top-``topk`` documents for ``terms`` under the exact BM25 scoring
    of ``docs_bm25_search`` — |terms| PRUNED posting scans (token
    clustering + blooms), never a corpus pass.  Returns (doc_id,
    n_terms_matched, score DOUBLE) ordered by (score desc, doc_id) — the
    unique-tiebreak rule — matching the batch query row-for-row."""
    empty = "doc_id bigint, n_terms_matched bigint, score double"
    if not terms:
        return spark.createDataFrame([], empty)
    n_docs, tot_dl = text_index_stats(spark, root)
    if n_docs == 0:  # index exists but holds no documents yet
        return spark.createDataFrame([], empty)
    k1p1 = _BM25_K1 + 1.0
    omb = 1.0 - _BM25_B
    avgdl = tot_dl / n_docs  # IEEE divide, same both uses
    per_term = []
    for i, term in enumerate(sorted(set(terms))):
        p = snapshot_read(
            spark, _postings_tbl(root), where=[("token", "==", term)]
        ).select(
            "doc_id",
            "dl",
            F.col("tf").alias(f"tf_{i}"),
        )
        per_term.append(p)
    # candidates: full outer fold over the per-term frames on doc_id —
    # each is one posting list, all tiny relative to the corpus
    cand = per_term[0]
    for i, p in enumerate(per_term[1:], start=1):
        cand = (
            cand.join(p.withColumnRenamed("dl", f"_dl_{i}"), "doc_id", "full_outer")
            .withColumn("dl", F.coalesce("dl", f"_dl_{i}"))
            .drop(f"_dl_{i}")
        )
    nterms = len(per_term)
    cand = cand.select(
        "doc_id",
        "dl",
        *[F.coalesce(f"tf_{i}", F.lit(0)).alias(f"tf_{i}") for i in range(nterms)],
    ).localCheckpoint(eager=True)
    dfs = cand.agg(
        *[
            F.expr(f"CAST(SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS BIGINT)").alias(
                f"df_{i}"
            )
            for i in range(nterms)
        ]
    )
    scored = cand.crossJoin(F.broadcast(dfs))

    def term_score(i: int):
        tf = F.col(f"tf_{i}")
        idf = (F.lit(n_docs) - F.col(f"df_{i}") + F.lit(0.5)) / (
            F.col(f"df_{i}") + F.lit(0.5)
        )
        ts = (
            idf
            * (tf * F.lit(k1p1))
            / (
                tf
                + F.lit(_BM25_K1)
                * (F.lit(omb) + F.lit(_BM25_B) * F.col("dl") / F.lit(avgdl))
            )
        )
        return F.when(tf > 0, ts.cast("decimal(25,9)")).otherwise(
            F.lit(0).cast("decimal(25,9)")
        )

    matched = sum(
        ((F.col(f"tf_{i}") > 0).cast("long") for i in range(nterms)),
        F.lit(0).cast("long"),
    )
    score = sum(
        (term_score(i) for i in range(1, nterms)), term_score(0)
    ).cast("double")
    return (
        scored.select(
            "doc_id",
            matched.alias("n_terms_matched"),
            score.alias("score"),
        )
        .filter(F.col("n_terms_matched") > 0)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(topk)
    )