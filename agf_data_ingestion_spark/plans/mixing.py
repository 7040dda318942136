"""Corpus mixture design (OP-X-DOREMI, OP-X-OVERLAP): domain-weight
optimization and the exact cross-source overlap matrix — the two
decisions a training-mixture owner makes BEFORE sampling (what share
each source gets, and which sources are secretly the same data).

``docs_domain_reweight`` — DoReMi-style Group-DRO domain reweighting
(Xie et al. 2023, "DoReMi: Optimizing Data Mixtures Speeds Up Language
Model Pretraining").  DoReMi runs multiplicative-weights updates where
domains whose proxy-model EXCESS LOSS exceeds the current mixture's
average gain weight.  The engine-exact analog (the CLAUDE.md no-exp
rule — ``exp`` is not IEEE-correctly-rounded, so Hedge's exponential
update is replaced by its first-order multiplicative form, itself a
standard MW variant):

* per-domain hardness signal = mean chars-per-word in ppm, an exact
  integer corpus statistic (the cheap perplexity stand-in: long-word
  domains are harder; swap in real proxy losses at deployment);
* R rounds over the K-row weight table:
  ``mixavg = Σ(w·excess) DIV Σw`` (the current mixture's average),
  ``factor = max(0.1, 1 + η·(excess − mixavg))`` in ppm arithmetic,
  ``w ← (w·factor) DIV 1e6`` renormalized to total K·1e6 by truncating
  division — every quantity BIGINT, every round bit-identical to the
  DuckDB twin that unrolls the same rounds as chained MATERIALIZED
  CTEs (the plans/iterative.py discipline; ``SUM(...) OVER ()`` is an
  order-free integer sum in both engines).

Scale shape: the corpus is touched ONCE (one groupBy(source) with
map-side partials); the iteration runs on the K-row domain table
(K = distinct sources, enumerable by definition) — rounds cost
nothing at any corpus size.

``docs_source_overlap`` — the exact pairwise shingle-overlap matrix
between sources: |A∩B|, Jaccard, and both containments in ppm, from
distinct 3-word shingles (the plans/text.py shingle convention).  This
is dataset-level contamination triage (RedPajama/Dolma dedup reports):
two "different" sources with high containment are the same crawl twice.

Scale shape: one shingle explode → distinct (source, gram) — the
post-explode ``.distinct()`` rule, never array_distinct — then a
self-join on the gram string whose per-gram cost is bounded by K²
pairs (a constant: sources are enumerable), shuffle-hash pinned (both
sides are corpus-sized — never broadcast); the pair and size
aggregates are map-combined.  Output is the ≤ K(K−1)/2-row matrix.
Pairs with ZERO shared shingles are absent (inner join) — the matrix
reports overlap, not its complement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from agf_data_ingestion_spark.plans.base import QuerySpec, t

#: multiplicative-weights rounds and learning rate (ppm) — small enough
#: that clamped factors stay positive, large enough that the planted
#: hardness spread separates weights in R rounds
_DRM_ROUNDS = 6
_DRM_ETA = 300_000
_PPM = 1_000_000


def docs_domain_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source training-mixture weights after ``_DRM_ROUNDS`` exact-
    integer multiplicative-weights rounds; ``upweighted`` marks domains
    that ended above the uniform share."""
    d = t(spark, sf_dir, "documents").select("source", "text")
    base = (
        d.select(
            "source",
            # bigint BEFORE the multiply: Spark length() is INT and a
            # 2148+-char doc would overflow int32 under ANSI (the DuckDB
            # twin is BIGINT-native)
            F.expr(
                "(cast(length(text) as bigint) * 1000000)"
                " DIV size(split(text, ' '))"
            ).alias("cpw"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.expr("sum(cpw) DIV count(*)").cast("long").alias("excess_ppm"),
        )
    )
    w = base.select(
        "source", "n_docs", "excess_ppm", F.lit(_PPM).cast("long").alias("w")
    )
    for _ in range(_DRM_ROUNDS):
        w = w.selectExpr(
            "source",
            "n_docs",
            "excess_ppm",
            f"""greatest(
                  100000L,
                  {_PPM}L + ((excess_ppm - (sum(w * excess_ppm) OVER ())
                              DIV (sum(w) OVER ())) * {_DRM_ETA})
                           DIV {_PPM}
                ) AS factor""",
            "w",
        ).selectExpr(
            "source",
            "n_docs",
            "excess_ppm",
            f"(w * factor) DIV {_PPM} AS wn",
        ).selectExpr(
            "source",
            "n_docs",
            "excess_ppm",
            f"(wn * (count(*) OVER ()) * {_PPM}) DIV (sum(wn) OVER ()) AS w",
        )
    return w.select(
        "source",
        "n_docs",
        "excess_ppm",
        F.col("w").alias("weight_ppm"),
        (F.col("w") > _PPM).alias("upweighted"),
    )


def docs_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact pairwise source overlap over distinct 3-word shingles:
    intersection size, Jaccard, and both containments, all in ppm."""
    d = t(spark, sf_dir, "documents").select("source", "text")
    words = F.split(F.col("text"), " ")
    # guard short docs: Spark sequence(1, n) with n <= 0 counts DOWN
    # (CLAUDE.md) — emit an empty gram list instead
    idx = F.when(
        F.size(words) >= 3, F.sequence(F.lit(1), F.size(words) - 2)
    ).otherwise(F.array().cast("array<int>"))
    # ONE corpus exchange on gram: the explicit repartition satisfies the
    # distinct (gram ⊆ its keys) AND both self-join sides, so the four
    # consumers (join a/b, sizes ×2) collapse to one executed shuffle +
    # three ReusedExchange reads at runtime (verified: 3 ReusedExchange
    # nodes in the final adaptive plan) instead of each branch planning
    # its own distinct-then-join exchanges — the r5 exchange-reuse rule
    grams = (
        d.select("source", words.alias("w"), F.explode(idx).alias("i"))
        .select(
            "source",
            F.concat_ws(
                " ",
                F.expr("w[i - 1]"),
                F.expr("w[i]"),
                F.expr("w[i + 1]"),
            ).alias("gram"),
        )
        .repartition("gram")
        .distinct()
    )
    sizes = grams.groupBy("source").agg(F.count("*").alias("n"))
    a = grams.select(F.col("source").alias("src_a"), "gram")
    b = grams.select(F.col("source").alias("src_b"), "gram")
    inter = (
        a.join(b.hint("shuffle_hash"), "gram")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").alias("inter"))
    )
    sz = F.broadcast(sizes)  # K rows
    return (
        inter.join(sz.select(F.col("source").alias("src_a"), F.col("n").alias("na")), "src_a")
        .join(sz.select(F.col("source").alias("src_b"), F.col("n").alias("nb")), "src_b")
        .select(
            "src_a",
            "src_b",
            "inter",
            "na",
            "nb",
            F.expr(f"(inter * {_PPM}) DIV (na + nb - inter)").alias("jaccard_ppm"),
            F.expr(f"(inter * {_PPM}) DIV na").alias("contain_a_ppm"),
            F.expr(f"(inter * {_PPM}) DIV nb").alias("contain_b_ppm"),
        )
    )


#: KMV sketch size for the overlap sketch — relative error ~1/sqrt(k)
#: ≈ 6.25%; 60-bit md5-derived hash space (engine-identical, the
#: plans/sketches.py convention)
_OVK = 256
_OVS = 64  # level-1 salt fan-out: parallelism within one source's k-min
_OV_HEX = 15
_OV_SPACE = float(1 << 60)


def _source_grams(d: DataFrame) -> DataFrame:
    """Distinct (source, 3-word shingle) — the shared front half of the
    exact matrix and its sketch twin."""
    words = F.split(F.col("text"), " ")
    idx = F.when(
        F.size(words) >= 3, F.sequence(F.lit(1), F.size(words) - 2)
    ).otherwise(F.array().cast("array<int>"))
    return (
        d.select("source", words.alias("w"), F.explode(idx).alias("i"))
        .select(
            "source",
            F.concat_ws(
                " ",
                F.expr("w[i - 1]"),
                F.expr("w[i]"),
                F.expr("w[i + 1]"),
            ).alias("gram"),
        )
    )


def docs_source_overlap_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ONE-PASS sketch twin of ``docs_source_overlap`` (VERDICT r7 ask
    #2): per-source KMV signatures over the same distinct 3-word shingles,
    merged per pair — at 100 TB the exact matrix's one all-gram shuffle is
    itself the bottleneck (measured ~7x at 10x on dense vocab), while this
    plan's pair stage runs on K²·k signature rows, a corpus-size CONSTANT.

    Estimators (Beyer et al. 2007 KMV; Bar-Yossef et al. 2002): merge the
    two signatures, re-take the k smallest of the union; ``est_union`` =
    (k−1)·2⁶⁰/h_(k); ``est_jaccard_ppm`` = |both|·1e6 DIV n_kept (the
    fraction of the union's k-min present in BOTH signatures is an
    unbiased Jaccard estimator); ``est_inter`` = ĵ·û.  Every quantity is
    md5-derived and integer (or a single identically-shaped double
    expression), so the DuckDB oracle computes the BIT-IDENTICAL sketch —
    a full hash-match, strictly stronger than the bounds-verified-boolean
    fallback; accuracy vs the exact matrix is pinned at ≥4σ in
    tests/test_mixing.py.

    Scale shape: one distinct over (source, gram) — full hash parallelism
    — then a salted two-level k-min (level 1 fans each source over
    ``_OVS`` hash buckets, level 2 merges; k-min of k-mins == global
    k-min, so the single-level oracle is exact); everything after runs on
    ≤ K·k signature rows.  The pair fan-out joins a K²-row pair table to
    the K·k-row signature table — both broadcast-safe by construction
    (sources are enumerable)."""
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents").select("source", "text")
    h = F.conv(
        F.substring(F.md5(F.col("gram")), 1, _OV_HEX), 16, 10
    ).cast("long")
    hashes = _source_grams(d).select("source", h.alias("h")).distinct()
    lvl1w = Window.partitionBy("source", "salt").orderBy("h")
    lvl1 = (
        hashes.withColumn("salt", F.pmod(F.col("h"), F.lit(_OVS)))
        .withColumn("rn", F.row_number().over(lvl1w))
        .filter(F.col("rn") <= _OVK)
        .drop("rn", "salt")
    )
    lvl2w = Window.partitionBy("source").orderBy("h")
    sig = (
        lvl1.withColumn("rn", F.row_number().over(lvl2w))
        .filter(F.col("rn") <= _OVK)
        .drop("rn")
        # THE multi-consumer corpus aggregate (r4 rule): three consumers
        # (tag_a, tag_b, source list) would each replan the corpus scan —
        # checkpointing the <= K·k-row signature table makes "the corpus
        # is touched once" a physical guarantee, not an AQE reuse hope
        .localCheckpoint(eager=True)
    )
    srcs = sig.select("source").distinct()
    pairs = (
        srcs.select(F.col("source").alias("src_a"))
        .join(srcs.select(F.col("source").alias("src_b")))
        .filter(F.col("src_a") < F.col("src_b"))
    )
    tag_a = pairs.join(
        sig.withColumnRenamed("source", "src_a"), "src_a"
    ).select("src_a", "src_b", "h", F.lit(1).alias("ia"), F.lit(0).alias("ib"))
    tag_b = pairs.join(
        sig.withColumnRenamed("source", "src_b"), "src_b"
    ).select("src_a", "src_b", "h", F.lit(0).alias("ia"), F.lit(1).alias("ib"))
    merged = (
        tag_a.unionByName(tag_b)
        .groupBy("src_a", "src_b", "h")
        .agg(F.max("ia").alias("ia"), F.max("ib").alias("ib"))
    )
    mw = Window.partitionBy("src_a", "src_b").orderBy("h")
    sk = (
        merged.withColumn("rn", F.row_number().over(mw))
        .filter(F.col("rn") <= _OVK)
        .groupBy("src_a", "src_b")
        .agg(
            F.count("*").alias("n_kept"),
            F.max("h").alias("kth_hash"),
            F.sum(F.col("ia") * F.col("ib")).cast("long").alias("n_both"),
        )
    )
    est_union = F.when(
        F.col("n_kept") < _OVK, F.col("n_kept").cast("double")
    ).otherwise(
        F.lit(float(_OVK - 1)) * F.lit(_OV_SPACE) / F.col("kth_hash").cast("double")
    )
    return sk.select(
        "src_a",
        "src_b",
        "n_kept",
        "kth_hash",
        "n_both",
        F.expr(f"(n_both * {_PPM}) DIV n_kept").alias("est_jaccard_ppm"),
        est_union.alias("est_union"),
        (
            F.col("n_both").cast("double")
            * est_union
            / F.col("n_kept").cast("double")
        ).alias("est_inter"),
    )


_OVL_SKETCH_SQL = f"""
WITH g AS (
  SELECT DISTINCT source,
         w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] AS gram
  FROM (
    SELECT source, string_split(text, ' ') AS w,
           UNNEST(range(1, len(string_split(text, ' ')) - 1)) AS i
    FROM documents
    WHERE len(string_split(text, ' ')) >= 3)
),
h AS (
  SELECT DISTINCT source,
         ('0x' || substr(md5(gram), 1, {_OV_HEX}))::BIGINT AS h
  FROM g
),
r AS (
  SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn
  FROM h
),
sig AS (SELECT source, h FROM r WHERE rn <= {_OVK}),
prs AS (
  SELECT a.source AS src_a, b.source AS src_b
  FROM (SELECT DISTINCT source FROM sig) a
  JOIN (SELECT DISTINCT source FROM sig) b ON a.source < b.source
),
m AS (
  SELECT src_a, src_b, h, MAX(ia) AS ia, MAX(ib) AS ib
  FROM (
    SELECT p.src_a, p.src_b, s.h, 1 AS ia, 0 AS ib
    FROM prs p JOIN sig s ON s.source = p.src_a
    UNION ALL
    SELECT p.src_a, p.src_b, s.h, 0 AS ia, 1 AS ib
    FROM prs p JOIN sig s ON s.source = p.src_b)
  GROUP BY 1, 2, 3
),
mr AS (
  SELECT *, row_number() OVER (PARTITION BY src_a, src_b ORDER BY h) AS rn
  FROM m
),
sk AS (
  SELECT src_a, src_b,
         CAST(COUNT(*) AS BIGINT) AS n_kept,
         MAX(h) AS kth_hash,
         CAST(SUM(ia * ib) AS BIGINT) AS n_both
  FROM mr WHERE rn <= {_OVK} GROUP BY 1, 2
)
SELECT src_a, src_b, n_kept, kth_hash, n_both,
       (n_both * {_PPM}) // n_kept AS est_jaccard_ppm,
       CASE WHEN n_kept < {_OVK} THEN CAST(n_kept AS DOUBLE)
            ELSE {float(_OVK - 1)} * {_OV_SPACE} / CAST(kth_hash AS DOUBLE)
       END AS est_union,
       CAST(n_both AS DOUBLE)
         * (CASE WHEN n_kept < {_OVK} THEN CAST(n_kept AS DOUBLE)
                 ELSE {float(_OVK - 1)} * {_OV_SPACE} / CAST(kth_hash AS DOUBLE)
            END)
         / CAST(n_kept AS DOUBLE) AS est_inter
FROM sk
"""


def _drm_round_sql(i: int) -> str:
    prev = f"r{i - 1}"
    return f"""
r{i}a AS MATERIALIZED (
  SELECT source, n_docs, excess_ppm, w,
         greatest(
           100000,
           {_PPM} + ((excess_ppm - (SUM(w * excess_ppm) OVER ())
                      // (SUM(w) OVER ())) * {_DRM_ETA}) // {_PPM}
         ) AS factor
  FROM {prev}
),
r{i}b AS MATERIALIZED (
  SELECT source, n_docs, excess_ppm, (w * factor) // {_PPM} AS wn FROM r{i}a
),
r{i} AS MATERIALIZED (
  SELECT source, n_docs, excess_ppm,
         (wn * (COUNT(*) OVER ()) * {_PPM}) // (SUM(wn) OVER ()) AS w
  FROM r{i}b
)"""


_DRM_SQL = f"""
WITH base AS MATERIALIZED (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(cpw) AS BIGINT) // COUNT(*) AS excess_ppm
  FROM (
    SELECT source,
           (length(text) * {_PPM}) // len(string_split(text, ' ')) AS cpw
    FROM documents)
  GROUP BY 1
),
r0 AS MATERIALIZED (
  SELECT source, n_docs, excess_ppm, CAST({_PPM} AS BIGINT) AS w FROM base
),{",".join(_drm_round_sql(i) for i in range(1, _DRM_ROUNDS + 1))}
SELECT source, n_docs, excess_ppm,
       CAST(w AS BIGINT) AS weight_ppm,
       w > {_PPM} AS upweighted
FROM r{_DRM_ROUNDS}
"""


_OVL_SQL = f"""
WITH g AS (
  SELECT DISTINCT source,
         w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] AS gram
  FROM (
    SELECT source, string_split(text, ' ') AS w,
           UNNEST(range(1, len(string_split(text, ' ')) - 1)) AS i
    FROM documents
    WHERE len(string_split(text, ' ')) >= 3)
),
sizes AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM g GROUP BY 1),
inter AS (
  SELECT a.source AS src_a, b.source AS src_b,
         CAST(COUNT(*) AS BIGINT) AS inter
  FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source
  GROUP BY 1, 2
)
SELECT i.src_a, i.src_b, i.inter, sa.n AS na, sb.n AS nb,
       (i.inter * {_PPM}) // (sa.n + sb.n - i.inter) AS jaccard_ppm,
       (i.inter * {_PPM}) // sa.n AS contain_a_ppm,
       (i.inter * {_PPM}) // sb.n AS contain_b_ppm
FROM inter i
JOIN sizes sa ON i.src_a = sa.source
JOIN sizes sb ON i.src_b = sb.source
"""


QUERIES: dict[str, QuerySpec] = {
    "docs_domain_reweight": QuerySpec(
        docs_domain_reweight, _DRM_SQL, ("OP-X-DOREMI",)
    ),
    "docs_source_overlap": QuerySpec(
        docs_source_overlap, _OVL_SQL, ("OP-X-OVERLAP",)
    ),
    "docs_source_overlap_sketch": QuerySpec(
        docs_source_overlap_sketch,
        _OVL_SKETCH_SQL,
        ("OP-X-OVERLAP", "OP-X-APPROX"),
    ),
}
