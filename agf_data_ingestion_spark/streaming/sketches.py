"""Streaming distinct-count sketching: per-micro-batch KMV sketches merged
into a persistent sketch table via ``foreachBatch``.

A KMV sketch is mergeable — the bottom-k of a union equals the bottom-k of
per-part bottom-k sets — so streaming distinct-count needs NO stateful
operator, NO watermark, and no replay: each micro-batch contributes its
bottom-k hash set, the sink merges it with the persisted sketch and
re-truncates.  State is O(k × groups) *forever*, regardless of stream
length — the metric-table shape the reference pushes to CloudWatch
(OP-SINK-METRICS, `agf_reconciliation_lambda.py:275-289`), and the same
tree-merge a 1000-executor cluster uses to roll distinct counts up without
rescanning history.  Batch/streaming unification: the identical
``kmv_sketch`` function is the batch twin, so the oracle-checked catalog
query (plans/sketches.py) pins the semantics.

The persisted sketch is ≤ k rows per group BY CONSTRUCTION, so the sink
may safely collect it to the driver for the atomic rewrite — this is the
one place "collect" is not a scale smell, because boundedness is the data
structure's contract, not an assumption about the data.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_K = 64


# crash-safe versioned commit + absent-vs-corrupt read discipline,
# shared with the streaming SCD2 dimension (operators/statestore.py)
from agf_data_ingestion_spark.operators.statestore import (  # noqa: E402
    state_read as _state_read,
    state_write as _state_write,
)
_HASH_HEX = 15  # 60-bit hash space
_HASH_SPACE = float(1 << 60)


def kmv_sketch(df: DataFrame, *, group_col: str, key_col: str, k: int = _K) -> DataFrame:
    """Bottom-``k`` md5 hashes of ``key_col`` per ``group_col`` — the sketch
    itself, as a (group, h) DataFrame.  Works identically on batch input
    and inside a micro-batch."""
    h = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, _HASH_HEX), 16, 10
    ).cast("long")
    # grp cast to string: the persisted state schema is string-typed, and
    # a bigint group column would otherwise crash createDataFrame in the
    # sink's bounded rewrite
    hashes = (
        df.select(F.col(group_col).cast("string").alias("grp"), h.alias("h"))
        .filter(F.col("h").isNotNull())  # null keys carry no identity
        .distinct()
    )
    w = Window.partitionBy("grp").orderBy("h")
    return (
        hashes.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")
    )


def merge_kmv(a: DataFrame, b: DataFrame, *, k: int = _K) -> DataFrame:
    """Merge two sketches: union, dedup, re-truncate.  Exact by the k-min
    merge property."""
    u = a.unionByName(b).distinct()
    w = Window.partitionBy("grp").orderBy("h")
    return u.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")


def kmv_estimates(sketch: DataFrame, *, k: int = _K) -> DataFrame:
    """(grp, n_kept, est) distinct-count estimates from a sketch table."""
    agg = sketch.groupBy("grp").agg(F.count("*").alias("n_kept"), F.max("h").alias("kth"))
    est = F.when(F.col("n_kept") < k, F.col("n_kept").cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(_HASH_SPACE) / F.col("kth").cast("double")
    )
    return agg.select("grp", "n_kept", est.alias("est"))


def kmv_sink(
    spark: SparkSession,
    table_dir: str,
    *,
    group_col: str,
    key_col: str,
    k: int = _K,
):
    """``foreachBatch`` function maintaining the persistent sketch at
    ``table_dir``: sketch the batch, merge with the stored sketch,
    atomically replace.  The rewrite goes through the driver because the
    merged sketch is ≤ k rows per group by construction (see module doc)."""

    def sink(batch: DataFrame, batch_id: int) -> None:
        new = kmv_sketch(batch, group_col=group_col, key_col=key_col, k=k)
        cur = _state_read(spark, table_dir)
        if cur is not None:
            new = merge_kmv(cur, new, k=k)
        rows = new.collect()  # bounded: ≤ k × groups by the sketch contract
        merged = spark.createDataFrame(rows, schema="grp string, h long")
        _state_write(merged, table_dir, batch_id)

    return sink


def kmv_read(spark: SparkSession, table_dir: str) -> DataFrame:
    """The persisted sketch table of a ``kmv_sink`` store."""
    stored = _state_read(spark, table_dir)
    if stored is None:
        raise FileNotFoundError(f"no kmv state at {table_dir}")
    return stored


# ---------------------------------------------------------------------------
# Misra–Gries heavy hitters (frequent-items sketch, mergeable)
# ---------------------------------------------------------------------------

_MG_K = 32


def mg_summary(df: DataFrame, *, key_col: str, k: int = _MG_K) -> tuple[DataFrame, int]:
    """Misra–Gries summary of ``df``: ≤ ``k`` (key, cnt) rows where cnt is a
    LOWER BOUND on the key's true count, plus the decrement ``err`` applied
    (true_count ≤ cnt + total accumulated err; Misra & Gries 1982, and the
    mergeable-summaries compression of Agarwal et al., PODS'12).

    Exact per-input counts come from one map-side-combined groupBy; the
    compression subtracts the (k+1)-th largest count from every counter and
    drops the non-positive ones — at most k keys can exceed that pivot, so
    the summary is ≤ k rows by construction.  The pivot lookup is a
    distributed TakeOrderedAndProject (limit k+1), never a global sort.
    """
    counts = df.groupBy(F.col(key_col).cast("string").alias("key")).agg(
        F.count("*").cast("long").alias("cnt")
    )
    return _mg_compress(counts, k=k)


def _mg_compress(counts: DataFrame, *, k: int) -> tuple[DataFrame, int]:
    # one materialization: the pivot collect, the kept projection, and the
    # caller's own collect would otherwise re-run the counts lineage
    # (including the stored-state read + outer merge join) three times
    counts = counts.localCheckpoint(eager=True)
    top = counts.orderBy(F.desc("cnt"), F.asc("key")).limit(k + 1).collect()
    if len(top) <= k:
        return counts, 0
    pivot = int(top[k].cnt)
    kept = counts.select("key", (F.col("cnt") - pivot).alias("cnt")).filter(F.col("cnt") > 0)
    return kept, pivot


def mg_merge(
    a: DataFrame, b: DataFrame, *, k: int = _MG_K
) -> tuple[DataFrame, int]:
    """Merge two summaries: add counters keyed-outer, re-compress.  The
    combined guarantee is the sum of both sides' errs plus the new
    compression's decrement."""
    u = (
        a.select("key", F.col("cnt").alias("ca"))
        .join(b.select("key", F.col("cnt").alias("cb")), "key", "full_outer")
        .select(
            "key",
            (F.coalesce("ca", F.lit(0)) + F.coalesce("cb", F.lit(0))).alias("cnt"),
        )
    )
    return _mg_compress(u, k=k)


def mg_sink(spark: SparkSession, table_dir: str, *, key_col: str, k: int = _MG_K):
    """``foreachBatch`` function maintaining a persistent heavy-hitters
    summary at ``table_dir`` — the same bounded-state-forever sink shape as
    ``kmv_sink``: per-batch counts are summarized, merged with the stored
    summary, and atomically rewritten.  Total err after any prefix of the
    stream is ≤ N_seen/(k+1), so every key with true count above that is
    guaranteed present.

    The cumulative err bound and the last-applied batch id live in META
    rows of the SAME parquet (``meta`` column non-null), so the state is a
    single atomic artifact — a crash can never separate the counters from
    their error bound.  Unlike ``kmv_sink`` (hash-set union, naturally
    idempotent), Misra–Gries counter ADDITION is not: re-applying a
    delivered-again batch would double-count and break the ``cnt ≤ true``
    lower-bound contract, so the sink skips any batch_id it has already
    applied (foreachBatch re-delivers under the same batch_id)."""

    def sink(batch: DataFrame, batch_id: int) -> None:
        new, err_new = mg_summary(batch, key_col=key_col, k=k)
        err = err_new
        stored = _state_read(spark, table_dir)
        if stored is not None:
            meta = {r.key: r.cnt for r in stored.filter(F.col("meta").isNotNull()).collect()}
            if meta.get("batch", -1) >= batch_id:
                return  # re-delivered batch: already applied
            cur = stored.filter(F.col("meta").isNull()).select("key", "cnt")
            new, err_merge = mg_merge(cur, new, k=k)
            err += err_merge + int(meta.get("err", 0))
        rows = [(r.key, int(r.cnt), None) for r in new.collect()]  # ≤ k rows
        rows += [("err", int(err), "m"), ("batch", int(batch_id), "m")]
        merged = spark.createDataFrame(rows, schema="key string, cnt long, meta string")
        _state_write(merged, table_dir, batch_id)

    return sink


def mg_read(spark: SparkSession, table_dir: str) -> tuple[DataFrame, int]:
    """(summary DataFrame, cumulative err bound) for a persisted sink."""
    stored = _state_read(spark, table_dir)
    if stored is None:
        raise FileNotFoundError(f"no mg state at {table_dir}")
    err_rows = stored.filter((F.col("meta").isNotNull()) & (F.col("key") == "err")).collect()
    return (
        stored.filter(F.col("meta").isNull()).select("key", "cnt"),
        int(err_rows[0].cnt) if err_rows else 0,
    )


# ---------------------------------------------------------------------------
# Per-group Misra–Gries ("top tokens per domain"): bounded counters per group
# ---------------------------------------------------------------------------


def mg_group_summary(
    df: DataFrame, *, group_col: str, key_col: str, k: int = _MG_K
) -> tuple[DataFrame, DataFrame]:
    """Per-group Misra–Gries: (grp, key, cnt) with ≤ k counters per group,
    plus (grp, err) decrements.  Unlike the global variant there is no
    driver collect anywhere in the compress — the per-group (k+1)-th
    largest count comes from a row_number window that Spark executes as
    WindowGroupLimit (map-side truncation to k+1 rows per group before the
    exchange), so the whole summary is one shuffle on (grp, key) plus one
    on grp, both bounded."""
    counts = df.groupBy(
        F.col(group_col).cast("string").alias("grp"),
        F.col(key_col).cast("string").alias("key"),
    ).agg(F.count("*").cast("long").alias("cnt"))
    return _mg_group_compress(counts, k=k)


def _mg_group_compress(counts: DataFrame, *, k: int) -> tuple[DataFrame, DataFrame]:
    w = Window.partitionBy("grp").orderBy(F.desc("cnt"), F.asc("key"))
    ranked = counts.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k + 1)
    pivot = ranked.filter(F.col("rn") == k + 1).select("grp", F.col("cnt").alias("pivot"))
    kept = (
        ranked.filter(F.col("rn") <= k)
        .join(pivot, "grp", "left")
        .select(
            "grp",
            "key",
            (F.col("cnt") - F.coalesce("pivot", F.lit(0))).alias("cnt"),
        )
        .filter(F.col("cnt") > 0)
    )
    err = pivot.select("grp", F.col("pivot").alias("err"))
    return kept, err


def _err_add(a: DataFrame, b: DataFrame) -> DataFrame:
    """(grp, err) ⊕ (grp, err): keyed-outer sum."""
    return (
        a.select("grp", F.col("err").alias("ea"))
        .join(b.select("grp", F.col("err").alias("eb")), "grp", "full_outer")
        .select("grp", (F.coalesce("ea", F.lit(0)) + F.coalesce("eb", F.lit(0))).alias("err"))
    )


def mg_group_merge(
    a: DataFrame, b: DataFrame, *, k: int = _MG_K
) -> tuple[DataFrame, DataFrame]:
    """Merge two per-group summaries (counter rows only): keyed-outer add,
    re-compress.  Returned err is the NEW compression's decrements — the
    caller adds it to both sides' accumulated errs (``_err_add``)."""
    u = (
        a.select("grp", "key", F.col("cnt").alias("ca"))
        .join(b.select("grp", "key", F.col("cnt").alias("cb")), ["grp", "key"], "full_outer")
        .select(
            "grp",
            "key",
            (F.coalesce("ca", F.lit(0)) + F.coalesce("cb", F.lit(0))).alias("cnt"),
        )
    )
    return _mg_group_compress(u, k=k)


def mg_group_sink(
    spark: SparkSession, table_dir: str, *, group_col: str, key_col: str, k: int = _MG_K
):
    """``foreachBatch`` sink: ≤ k counters + one err row per group, and the
    last-applied batch id, all in ONE parquet (meta column distinguishes
    row kinds) — atomic, idempotent under re-delivery, O(k·groups) state
    forever.  The bounded driver materialization is the same contract as
    ``kmv_sink``: ≤ (k+1) × groups rows by construction."""

    def sink(batch: DataFrame, batch_id: int) -> None:
        new, err = mg_group_summary(batch, group_col=group_col, key_col=key_col, k=k)
        stored = _state_read(spark, table_dir)
        if stored is not None:
            # batch rows carry meta='b', err rows meta='m' — DISTINCT
            # markers, because a NULL group's err row would otherwise be
            # shape-identical to the batch row and the dedup guard could
            # nondeterministically read an err value as the batch id
            last = stored.filter(F.col("meta") == "b").collect()
            if last and int(last[0].cnt) >= batch_id:
                return  # re-delivered batch: already applied
            cur = stored.filter(F.col("meta").isNull()).select("grp", "key", "cnt")
            cur_err = stored.filter(F.col("meta") == "m").select(
                "grp", F.col("cnt").alias("err")
            )
            new, merge_err = mg_group_merge(cur, new, k=k)
            err = _err_add(_err_add(cur_err, err), merge_err)
        rows = [(r.grp, r.key, int(r.cnt), None) for r in new.collect()]
        rows += [(r.grp, None, int(r.err), "m") for r in err.collect()]
        rows += [(None, None, int(batch_id), "b")]
        merged = spark.createDataFrame(
            rows, schema="grp string, key string, cnt long, meta string"
        )
        _state_write(merged, table_dir, batch_id)

    return sink


def mg_group_read(spark: SparkSession, table_dir: str) -> tuple[DataFrame, dict]:
    """(counter DataFrame (grp, key, cnt), {grp: err}) for a persisted
    sink.  err rows (meta='m') may legitimately carry a NULL group."""
    stored = _state_read(spark, table_dir)
    if stored is None:
        raise FileNotFoundError(f"no mg group state at {table_dir}")
    errs = {
        r.grp: int(r.cnt) for r in stored.filter(F.col("meta") == "m").collect()
    }
    return stored.filter(F.col("meta").isNull()).select("grp", "key", "cnt"), errs
