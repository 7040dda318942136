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
}
