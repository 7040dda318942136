"""Training-shard writer: deterministic, token-budgeted shards of a
curated corpus — the delivery end of the pipeline (WebDataset/Megatron
loaders consume fixed-size shards; the reference ships curated exports as
zip batches, agf_zip_generator_lambda.py — this is the same hand-off
re-expressed for training consumers at corpus scale).

The scale problem is the GLOBAL running token sum: a naive
``Window.orderBy(...)`` with no partition key plans a single-reducer sort
— one task sees the whole corpus.  ``assign_shards`` instead uses the
classic two-pass distributed prefix sum:

1. range-repartition on the (md5-salted, unique) order key and sort
   within partitions — a full shuffle, but every partition sorts only
   its slice;
2. per-partition token subtotals → collected to the driver (BOUNDED by
   the partition count, never data-sized) → exclusive prefix offsets
   broadcast back;
3. local running sum + partition offset = exact global running sum,
   computed in parallel by a per-partition window.

Shard identity depends only on the global cumulative sum over the total
order — NOT on where range boundaries land — so results are
bit-deterministic even though ``repartitionByRange`` samples its
boundaries.

Epoch shuffling rides the same order key as ``docs_epoch_order``
(plans/training_data.py): ``md5(seed || ':' || doc_id)`` — change the
seed, get a new deterministic permutation and therefore a new shard
layout; replay the seed, get byte-identical shards on any cluster.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


#: WFQ virtual-time scale (weighted_interleave) — cum_tokens × scale must
#: fit BIGINT: safe to ~9e9 tokens per source
_WFQ_SCALE = 1_000_000_000


def weighted_interleave(
    docs: DataFrame,
    weights: DataFrame,
    *,
    seed: str = "0",
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Deterministic WEIGHTED interleave of a multi-source corpus (r8,
    VERDICT r7 ask #5 — the consumer of ``docs_domain_reweight``'s
    ``weight_ppm``): weighted-fair-queuing virtual times on exact
    integers.  Within each source, docs are ordered by
    ``md5(seed:doc_id)`` and finish at ``t = cum_tokens × SCALE DIV
    weight_ppm``; the ``_wfq`` sort key (zero-padded t ‖ md5) then makes
    every prefix of the global order carry per-source token shares
    ∝ weight_ppm, within one document of truncation.  Rows past the
    horizon where the FIRST source exhausts are dropped — beyond it the
    mixture is unsatisfiable by construction (start the next epoch with
    a new seed instead).

    ``weights``: a (source, weight_ppm) frame — K rows, broadcast.
    Feed the result to ``assign_shards(..., order_key="_wfq")``; each
    shard's per-source token share then matches the weights
    (tests/test_shards.py pins the tolerance), and the catalog query
    ``docs_reweighted_shards`` (plans/mixing.py) is the single-window
    oracle twin of this two-pass pipeline.

    Scale shape: one per-source window (hash-partitioned on source —
    salt via the skewed-rank decomposition if one source dominates), a
    K-row horizon aggregate, one broadcast; no corpus collect."""
    d = docs.withColumn(
        "n_tokens", F.size(F.split(F.col(text_col), " ")).cast("long")
    ).withColumn(
        "_h",
        F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))),
    )
    d = d.join(
        F.broadcast(weights.select(source_col, "weight_ppm")), source_col
    )
    sw = (
        Window.partitionBy(source_col)
        .orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn("_cum", F.sum("n_tokens").over(sw)).withColumn(
        "_t", F.expr(f"(_cum * {_WFQ_SCALE}) DIV weight_ppm")
    )
    hor = (
        d.groupBy(source_col)
        .agg(F.max("_t").alias("_tm"))
        .agg(F.min("_tm").alias("_hor"))
    )
    return (
        d.crossJoin(F.broadcast(hor))
        .filter(F.col("_t") <= F.col("_hor"))
        .withColumn(
            "_wfq",
            F.concat(F.lpad(F.col("_t").cast("string"), 20, "0"), F.col("_h")),
        )
        .drop("_cum", "_hor", "_h")
    )


def assign_shards(
    docs: DataFrame,
    *,
    budget_tokens: int = 4096,
    seed: str = "0",
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
    order_key: str | None = None,
) -> DataFrame:
    """Adds ``n_tokens``, ``global_pos`` (1-based rank in the shuffled
    order) and ``shard_id`` (= floor((cumulative_tokens - 1) / budget))
    to ``docs``.  Deterministic for a given (corpus, seed, budget) —
    independent of cluster size, partition boundaries, or row arrival
    order.  ``order_key`` (r8) replaces the md5 shuffle order with a
    caller-supplied total-order column — the weighted-interleave hook
    (``weighted_interleave``'s ``_wfq`` key)."""
    n_parts = num_partitions or docs.sparkSession.sparkContext.defaultParallelism
    ordered = (
        docs.withColumn("n_tokens", F.size(F.split(F.col(text_col), " ")))
        .withColumn(
            "_ord",
            F.col(order_key)
            if order_key
            else F.md5(
                F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))
            ),
        )
        .repartitionByRange(n_parts, "_ord")
        .sortWithinPartitions("_ord")
        .withColumn("_part", F.spark_partition_id())
        # PIN the materialized partitioning: repartitionByRange samples its
        # boundaries with an rdd.id-seeded reservoir, so re-executing the
        # plan in a second job (the pass-2 join below is a separate action
        # from the pass-1 collect) could land boundary rows in DIFFERENT
        # partitions than the ones whose offsets were collected.  The
        # checkpoint makes both passes read the same physical partitions —
        # the same rule as every other multi-action plan in this repo
        # (plans/iterative.py).
        .localCheckpoint(eager=True)
    )
    # pass 1: per-partition subtotals — the collect is bounded by the
    # partition count (rows ≤ n_parts), never by data size
    subtotals = {
        r["_part"]: (r["toks"], r["cnt"])
        for r in ordered.groupBy("_part")
        .agg(F.sum("n_tokens").alias("toks"), F.count("*").alias("cnt"))
        .collect()
    }
    tok_off, cnt_off, offsets = 0, 0, {}
    for p in sorted(subtotals):
        offsets[p] = (tok_off, cnt_off)
        tok_off += subtotals[p][0]
        cnt_off += subtotals[p][1]
    off_df = ordered.sparkSession.createDataFrame(
        [(p, int(t), int(c)) for p, (t, c) in offsets.items()],
        "_part int, _tok_off long, _cnt_off long",
    )
    # pass 2: local running sums (parallel per-partition windows) + offset
    w = (
        Window.partitionBy("_part")
        .orderBy("_ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ordered.join(F.broadcast(off_df), "_part")
        .withColumn("_cum", F.sum("n_tokens").over(w) + F.col("_tok_off"))
        .withColumn("global_pos", F.row_number().over(w).cast("long") + F.col("_cnt_off"))
        # integer floor division (not double /): _cum values near 2^53
        # with a non-power-of-two budget could round across a shard
        # boundary under float division (r4 ADVICE); `div` truncates
        # toward zero, which equals floor here because _cum >= 1
        .withColumn(
            "shard_id", F.expr(f"(_cum - 1) div {int(budget_tokens)}").cast("long")
        )
        .drop("_ord", "_part", "_tok_off", "_cnt_off", "_cum")
    )


def write_training_shards(
    docs: DataFrame,
    out_dir: str,
    *,
    budget_tokens: int = 4096,
    seed: str = "0",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict:
    """Materialize token-budgeted shards under ``out_dir``: one parquet
    directory per shard (``shard_id=N/``, single file — each shard's rows
    are co-located by the pre-write repartition on shard_id) plus a
    ``manifest.json`` with per-shard document/token counts for loader
    bookkeeping.  Returns the manifest dict.

    Idempotent overwrite per run; replaying the same (corpus, seed,
    budget) reproduces the identical layout on any cluster."""
    assigned = assign_shards(
        docs,
        budget_tokens=budget_tokens,
        seed=seed,
        text_col=text_col,
        id_col=id_col,
    )
    # one materialization for the three downstream actions (max, write,
    # stats): without it each action would re-run the prefix-sum pipeline
    # and the manifest could be computed from a different materialization
    # than the files on disk
    assigned = assigned.localCheckpoint(eager=True)
    n_shards = assigned.agg(F.max("shard_id")).collect()[0][0]
    n_shards = int(n_shards) + 1 if n_shards is not None else 0
    (
        assigned.repartition(max(n_shards, 1), "shard_id")
        .sortWithinPartitions("global_pos")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(os.path.join(out_dir, "shards"))
    )
    stats = (
        assigned.groupBy("shard_id")
        .agg(
            F.count("*").alias("docs"),
            F.sum("n_tokens").alias("tokens"),
            F.min("global_pos").alias("first_pos"),
            F.max("global_pos").alias("last_pos"),
        )
        .collect()
    )
    manifest = {
        "seed": seed,
        "budget_tokens": budget_tokens,
        "n_shards": n_shards,
        "shards": {
            int(r["shard_id"]): {
                "docs": int(r["docs"]),
                "tokens": int(r["tokens"]),
                "first_pos": int(r["first_pos"]),
                "last_pos": int(r["last_pos"]),
                "path": f"shards/shard_id={int(r['shard_id'])}",
            }
            for r in stats
        },
    }
    os.makedirs(out_dir, exist_ok=True)
    tmp = os.path.join(out_dir, "manifest.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(out_dir, "manifest.json"))
    return manifest
