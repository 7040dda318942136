"""URL-level corpus curation (OP-X-URLCURATE): canonicalize → dedup →
blocklist → per-domain frequency cap, oracle-checked end-to-end.

RefinedWeb (§3.1) and CCNet curate a web corpus BEFORE reading any
document text: URLs are canonicalized, exact-deduped on the canonical
form, blocklisted registered domains are dropped, and per-domain
document counts are capped so a few mega-sites cannot dominate the
training mixture.  The reference system has no URL surface (its keys
are storage paths, cf. functions/paths.py) — this is part of the
100 TB training-data extension.

The corpus has no URL column, so URLs are PLANTED deterministically
(the plans/pii.py pattern): ``b = md5('url:'||doc_id)`` drives the
RAW-form variation (scheme case, ``www.``, default port, trailing
slash, utm tracking params in scrambled order, fragment) while the
CONTENT identity derives from ``v = (b DIV 64) % (n_docs DIV 2)``
(domain, subdomain, path id, meaningful query param) — so documents
sharing ``v`` carry byte-DIFFERENT raw URLs with the same canonical
form.  Both engines build the identical planted corpus, and the query
is self-evaluating: ``canon_ok`` asserts the canonicalizer output
equals the closed-form expected canonical URL on EVERY row (TRUE for
100% of rows at every sf), which subsumes variant-collapse.

Deriving the v-modulus and the domain cap from ``count(*)`` keeps the
plant scale-free: duplicates exist and the cap binds at sf0.001 and at
sf0.1 alike (the adaptive-blocking `_sd_bits` rule — integer-only
arithmetic both engines compute identically; the 1-row count is
cross-joined broadcast, never a global window).

Scale shape: one map-only scan builds raw+canon (regex subset —
whole-stage codegen), then exactly two key-partitioned corpus
shuffles: row_number over ``canon`` (dedup — canonical URLs are
high-cardinality, no skew) and the SALTED per-domain rank (cap).  No
global window, no collect.

Skew-safe per-domain rank (r7, VERDICT r6 finding #2): web-scale
domain skew means `row_number() OVER (PARTITION BY domain, ...)`
funnels a mega-domain's every document through ONE reducer — the
full-shuffle-on-skewed-key shape this repo bans elsewhere.  The cap
rank is therefore computed as an exact DISTRIBUTED row_number
(``_salted_rank``): rows are ranked within ``(domain, eligible,
salt)`` cells (``salt = doc_id % S``, S derived from corpus size by
integer-only arithmetic — the adaptive `_sd_bits` rule, so the oracle
twin computes the identical S), per-cell counts roll up to prefix-sum
offsets over the TINY (domain, eligible, salt)-count table, and
``rank = offset + within-cell rank``.  That is exactly
``row_number() OVER (PARTITION BY domain, eligible ORDER BY
doc_id % S, doc_id)`` — the tie-broken (salt, doc_id) total order is
the documented cap order (a deterministic per-domain cap does not
care WHICH docs survive, and salt-order keeps an unbiased spread of
the domain instead of the lowest ids) — and the oracle computes it as
that single window.  A mega-domain now spreads over S reducers
(S = 65536 at 1e12 docs → ≤ ~15k rows per cell for a domain owning
the whole corpus); the offsets side is bounded by distinct
(domain, salt) cells and joins back on the cell key the corpus is
already partitioned by (shuffle-hash pinned — with many single-doc
domains the cell table approaches corpus size, so it must never be
broadcast).  Wire cost: the probe side shuffles once on canon and
once on the cell key; the count branch re-shuffles a COLUMN-PRUNED
(doc_id, canon, domain) projection on canon (pruning forks the
exchange subtree, so it cannot reuse the wide one) and everything
after it is map-combined partial counts — strictly cheaper than the
unbounded single-reducer cliff it replaces.

Canonicalization/domain logic is the PRODUCTION code path
(functions/urls.py) — the oracle checks the real operator, not a twin
reimplementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from agf_data_ingestion_spark.functions.urls import (
    TRACKING_PREFIX,
    canonical_url,
    registered_domain,
    url_host,
)
from agf_data_ingestion_spark.plans.base import QuerySpec, t

#: registered domains excluded outright (the blocklist — tiny, in-plan)
_BLOCKED = ("d0.com", "d1.com")

#: adaptive salt-cell count for the distributed per-domain rank —
#: integer-only so the DuckDB twin computes the identical value
#: (64 at catalog scale; 65536 at 1e12 docs)
_S_CELLS_SQL = "greatest(64, least(65536, tot DIV 4096))"


def _salted_rank(df: DataFrame) -> DataFrame:
    """Exact distributed ``row_number() OVER (PARTITION BY domain,
    eligible ORDER BY doc_id % s_cells, doc_id)`` without a per-domain
    single-reducer window: rank within (domain, eligible, salt) cells,
    then add the prefix-sum offset of earlier cells (computed over the
    tiny cell-count table).  Input needs (doc_id, tot, domain, eligible);
    adds ``dr``.  Factored out so the planted mega-domain pytest can pin
    both the values (≡ the single-window ground truth) and the plan (no
    corpus window partitioned by domain without the salt)."""
    salted = df.withColumn("s_cells", F.expr(_S_CELLS_SQL)).withColumn(
        "salt", F.col("doc_id") % F.col("s_cells")
    )
    w_cell = Window.partitionBy("domain", "eligible", "salt").orderBy("doc_id")
    r1 = salted.withColumn("rn_s", F.row_number().over(w_cell))
    # cell-count branch: Catalyst prunes the unused window, so this side
    # is map-side partial counts — the corpus shuffles once (probe side)
    cells = salted.groupBy("domain", "eligible", "salt").agg(
        F.count("*").alias("c")
    )
    w_off = (
        Window.partitionBy("domain", "eligible")
        .orderBy("salt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = cells.select(
        "domain",
        "eligible",
        "salt",
        F.coalesce(F.sum("c").over(w_off), F.lit(0)).alias("_off"),
    )
    # the cell table is one row per NON-EMPTY (domain, eligible, salt)
    # cell — with many single-doc domains that approaches corpus size, so
    # it must never be broadcast (the corpus-side ban); the hinted side is
    # the build side, and both sides are already clustered on the cell key
    return (
        r1.join(offs.hint("shuffle_hash"), ["domain", "eligible", "salt"])
        .withColumn("dr", (F.col("_off") + F.col("rn_s")).cast("long"))
        .drop("s_cells", "salt", "rn_s", "_off")
    )


def docs_url_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select("doc_id")
    tot = d.agg(F.count("*").cast("long").alias("tot"))
    base = d.crossJoin(F.broadcast(tot)).select(
        "doc_id",
        "tot",
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("url:"), F.col("doc_id").cast("string"))), 1, 10
            ),
            16,
            10,
        )
        .cast("long")
        .alias("b"),
    )
    parts = base.select(
        "doc_id",
        "b",
        "tot",
        F.expr("(b DIV 64) % greatest(1, tot DIV 2)").alias("v"),
    ).select(
        "doc_id",
        "b",
        "tot",
        "v",
        (F.col("v") % 41).alias("k"),
        (F.col("v") % 7 == 0).alias("news"),
        F.expr("(v DIV 7) % 997").alias("pathid"),
        (F.col("v") % 3 == 0).alias("hasq"),
        (F.col("v") % 1000).alias("qid"),
    )

    utm = (
        F.when(
            F.col("b") % 6 == 0,
            F.concat(F.lit("utm_source=x"), (F.col("b") % 5).cast("string")),
        )
        .when(
            F.col("b") % 6 == 3,
            F.concat(F.lit("utm_campaign=y"), (F.col("b") % 7).cast("string")),
        )
        .otherwise(F.lit(None).cast("string"))
    )
    mq = F.when(
        F.col("hasq"), F.concat(F.lit("id="), F.col("qid").cast("string"))
    ).otherwise(F.lit(None).cast("string"))
    qstr = (
        F.when(
            utm.isNotNull() & mq.isNotNull() & (F.col("b") % 2 == 0),
            F.concat(F.lit("?"), utm, F.lit("&"), mq),
        )
        .when(utm.isNotNull() & mq.isNotNull(), F.concat(F.lit("?"), mq, F.lit("&"), utm))
        .when(mq.isNotNull(), F.concat(F.lit("?"), mq))
        .when(utm.isNotNull(), F.concat(F.lit("?"), utm))
        .otherwise(F.lit(""))
    )
    raw = F.concat(
        F.when(F.col("b") % 3 == 0, "HTTPS://").otherwise("https://"),
        F.when(F.col("b") % 2 == 0, "www.").otherwise(""),
        F.when(F.col("news"), "news.").otherwise(""),
        F.lit("D"),
        F.col("k").cast("string"),
        F.lit(".COM"),
        F.when(F.col("b") % 5 == 0, ":443").otherwise(""),
        F.lit("/p/"),
        F.col("pathid").cast("string"),
        F.when(F.col("b") % 4 == 0, "/").otherwise(""),
        qstr,
        F.when(F.col("b") % 9 == 0, F.concat(F.lit("#s"), (F.col("b") % 10).cast("string"))).otherwise(""),
    )
    expected = F.concat(
        F.lit("https://"),
        F.when(F.col("news"), "news.").otherwise(""),
        F.lit("d"),
        F.col("k").cast("string"),
        F.lit(".com"),
        F.lit("/p/"),
        F.col("pathid").cast("string"),
        F.when(F.col("hasq"), F.concat(F.lit("?id="), F.col("qid").cast("string"))).otherwise(""),
    )

    urls = parts.select(
        "doc_id",
        "tot",
        raw.alias("raw"),
        expected.alias("expected"),
    ).select(
        "doc_id",
        "tot",
        "raw",
        "expected",
        canonical_url(F.col("raw")).alias("canon"),
        registered_domain(url_host(F.col("raw"))).alias("domain"),
    )

    w_dup = Window.partitionBy("canon").orderBy("doc_id")
    staged = urls.select(
        "doc_id",
        "tot",
        "raw",
        "expected",
        "canon",
        "domain",
        F.col("domain").isin(*_BLOCKED).alias("blocked"),
        (F.row_number().over(w_dup) > 1).alias("is_dup"),
    ).withColumn("eligible", ~F.col("blocked") & ~F.col("is_dup"))

    ranked = _salted_rank(staged).withColumn(
        "domain_cap", F.expr("greatest(1, tot DIV 250)").cast("long")
    )
    return ranked.select(
        "doc_id",
        "domain",
        "blocked",
        "is_dup",
        F.when(F.col("eligible"), F.col("dr")).otherwise(F.lit(0)).cast("long").alias("domain_rank"),
        "domain_cap",
        (F.col("eligible") & (F.col("dr") <= F.col("domain_cap"))).alias("kept"),
        (F.col("canon") == F.col("expected")).alias("canon_ok"),
        F.md5(F.col("canon")).alias("canon_hash"),
        F.md5(F.col("raw")).alias("raw_hash"),
    )


_URL_SQL = f"""
WITH base AS (
  SELECT doc_id, tot,
         ('0x' || substr(md5('url:' || CAST(doc_id AS VARCHAR)), 1, 10))::BIGINT AS b
  FROM documents
  CROSS JOIN (SELECT CAST(COUNT(*) AS BIGINT) AS tot FROM documents) t
),
parts AS (
  SELECT doc_id, b, tot, v,
         v % 41 AS k,
         (v % 7 = 0) AS news,
         (v // 7) % 997 AS pathid,
         (v % 3 = 0) AS hasq,
         v % 1000 AS qid
  FROM (SELECT *, (b // 64) % greatest(1, tot // 2) AS v FROM base)
),
built AS (
  SELECT doc_id, tot,
         CASE WHEN b % 3 = 0 THEN 'HTTPS://' ELSE 'https://' END
         || CASE WHEN b % 2 = 0 THEN 'www.' ELSE '' END
         || CASE WHEN news THEN 'news.' ELSE '' END
         || 'D' || CAST(k AS VARCHAR) || '.COM'
         || CASE WHEN b % 5 = 0 THEN ':443' ELSE '' END
         || '/p/' || CAST(pathid AS VARCHAR)
         || CASE WHEN b % 4 = 0 THEN '/' ELSE '' END
         || CASE
              WHEN utm IS NOT NULL AND mq IS NOT NULL AND b % 2 = 0
                THEN '?' || utm || '&' || mq
              WHEN utm IS NOT NULL AND mq IS NOT NULL
                THEN '?' || mq || '&' || utm
              WHEN mq IS NOT NULL THEN '?' || mq
              WHEN utm IS NOT NULL THEN '?' || utm
              ELSE '' END
         || CASE WHEN b % 9 = 0 THEN '#s' || CAST(b % 10 AS VARCHAR) ELSE '' END
           AS raw,
         'https://'
         || CASE WHEN news THEN 'news.' ELSE '' END
         || 'd' || CAST(k AS VARCHAR) || '.com'
         || '/p/' || CAST(pathid AS VARCHAR)
         || CASE WHEN hasq THEN '?id=' || CAST(qid AS VARCHAR) ELSE '' END
           AS expected
  FROM (
    SELECT *,
           CASE WHEN b % 6 = 0 THEN 'utm_source=x' || CAST(b % 5 AS VARCHAR)
                WHEN b % 6 = 3 THEN 'utm_campaign=y' || CAST(b % 7 AS VARCHAR)
                ELSE NULL END AS utm,
           CASE WHEN hasq THEN 'id=' || CAST(qid AS VARCHAR) ELSE NULL END AS mq
    FROM parts)
),
canond AS (
  SELECT doc_id, tot, raw, expected,
         scheme || '://' || host || cport || path
         || CASE WHEN q = '' THEN '' ELSE '?' || q END AS canon,
         regexp_extract(host, '([^.]+\\.[^.]+)$', 1) AS domain
  FROM (
    SELECT *,
           CASE WHEN port = '' THEN ''
                WHEN scheme = 'https' AND port = '443' THEN ''
                WHEN scheme = 'http' AND port = '80' THEN ''
                ELSE ':' || port END AS cport,
           CASE WHEN path0 = '' THEN '/' ELSE path0 END AS path,
           coalesce(array_to_string(list_sort(list_filter(
             string_split(rawq, '&'),
             x -> substr(x, 1, {len(TRACKING_PREFIX)}) <> '{TRACKING_PREFIX}'
                  AND x <> '')), '&'), '') AS q
    FROM (
      SELECT *,
             CASE WHEN substr(host0, 1, 4) = 'www.' THEN substr(host0, 5)
                  ELSE host0 END AS host,
             regexp_extract(hostport, ':([0-9]+)$', 1) AS port,
             regexp_replace(
               regexp_extract(raw, '^[a-zA-Z]+://[^/?#]+(/[^?#]*)', 1),
               '/$', '') AS path0,
             regexp_extract(raw, '\\?([^#]*)', 1) AS rawq
      FROM (
        SELECT *,
               lower(regexp_extract(raw, '^([a-zA-Z]+)://', 1)) AS scheme,
               lower(regexp_extract(raw, '^[a-zA-Z]+://([^/?#]+)', 1)) AS hostport,
               regexp_extract(lower(regexp_extract(raw, '^[a-zA-Z]+://([^/?#]+)', 1)),
                              '^([^:]+)', 1) AS host0
        FROM built)))
),
staged AS (
  SELECT *,
         (NOT blocked AND NOT is_dup) AS eligible
  FROM (
    SELECT doc_id, tot, raw, expected, canon, domain,
           domain IN ('d0.com', 'd1.com') AS blocked,
           row_number() OVER (PARTITION BY canon ORDER BY doc_id) > 1 AS is_dup
    FROM canond)
),
ranked AS (
  -- the single-window twin of the Spark side's distributed salted rank:
  -- identical S (integer-only arithmetic), identical (salt, doc_id) order
  SELECT *,
         row_number() OVER (
           PARTITION BY domain, eligible
           ORDER BY doc_id % greatest(64, least(65536, tot // 4096)), doc_id
         ) AS dr,
         CAST(greatest(1, tot // 250) AS BIGINT) AS domain_cap
  FROM staged
)
SELECT doc_id, domain, blocked, is_dup,
       CAST(CASE WHEN eligible THEN dr ELSE 0 END AS BIGINT) AS domain_rank,
       domain_cap,
       (eligible AND dr <= domain_cap) AS kept,
       (canon = expected) AS canon_ok,
       md5(canon) AS canon_hash,
       md5(raw) AS raw_hash
FROM ranked
"""


QUERIES: dict[str, QuerySpec] = {
    "docs_url_curation": QuerySpec(docs_url_curation, _URL_SQL, ("OP-X-URLCURATE",)),
}
