"""OP-X-URLCURATE: canonicalizer unit rules + planted-corpus invariants.

The cross-engine bit-identity of ``docs_url_curation`` is covered by
scripts/check_oracle.py (driver gate); these tests pin the
canonicalization RULES themselves on hand-written URLs — including the
branches the planted corpus cannot reach (http:80, non-default port,
missing path) — and the curation invariants on the catalog output.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from agf_data_ingestion_spark.functions.urls import (
    canonical_url,
    registered_domain,
    url_host,
)
from agf_data_ingestion_spark.plans.urls import docs_url_curation
from tests.conftest import SF_SMOKE

CASES = [
    # scheme+host lowercase, fragment dropped
    ("HTTPS://EXAMPLE.COM/A#frag", "https://example.com/A"),
    # default ports stripped per scheme
    ("https://example.com:443/a", "https://example.com/a"),
    ("http://example.com:80/a", "http://example.com/a"),
    # non-default port survives
    ("https://example.com:8443/a", "https://example.com:8443/a"),
    # http:443 is NOT the default for http — survives
    ("http://example.com:443/a", "http://example.com:443/a"),
    # empty path → '/', root stays '/'
    ("https://example.com", "https://example.com/"),
    ("https://example.com/", "https://example.com/"),
    # one trailing slash stripped off non-root
    ("https://example.com/a/b/", "https://example.com/a/b"),
    # one leading www. label stripped; inner 'www' untouched
    ("https://www.example.com/a", "https://example.com/a"),
    ("https://news.www.example.com/a", "https://news.www.example.com/a"),
    # tracking params dropped, survivors sorted, order-insensitive
    ("https://example.com/a?z=2&utm_source=t&a=1", "https://example.com/a?a=1&z=2"),
    ("https://example.com/a?a=1&z=2", "https://example.com/a?a=1&z=2"),
    # all params tracking → no query at all
    ("https://example.com/a?utm_source=t&utm_campaign=u", "https://example.com/a"),
    # empty query / dangling '?' vanish
    ("https://example.com/a?", "https://example.com/a"),
    # NO percent-decoding (decoding is not idempotent)
    ("https://example.com/a%2Fb", "https://example.com/a%2Fb"),
]


def test_canonicalization_rules(spark):
    df = spark.createDataFrame([(r, e) for r, e in CASES], "raw string, expected string")
    rows = df.select("raw", "expected", canonical_url(F.col("raw")).alias("got")).collect()
    bad = [(r.raw, r.expected, r.got) for r in rows if r.got != r.expected]
    assert not bad, bad


def test_registered_domain_and_host(spark):
    df = spark.createDataFrame(
        [
            ("https://www.news.d3.com:443/x", "news.d3.com", "d3.com"),
            ("https://D8.COM/x", "d8.com", "d8.com"),
        ],
        "raw string, host string, dom string",
    )
    rows = df.select(
        "host",
        "dom",
        url_host(F.col("raw")).alias("h"),
        registered_domain(url_host(F.col("raw"))).alias("d"),
    ).collect()
    for r in rows:
        assert r.h == r.host and r.d == r.dom


def test_salted_rank_mega_domain_exact_and_skew_safe(spark):
    """VERDICT r6 finding #2: the per-domain cap rank must survive a
    mega-domain.  Values: the distributed salted rank ≡ the single-window
    ground truth in (doc_id % S, doc_id) order.  Plan: no corpus
    row_number window partitioned by domain WITHOUT the salt, and the
    cell-offset join stays a shuffle join (the cell table approaches
    corpus size under many tiny domains — never broadcast)."""
    from pyspark.sql import Window

    from agf_data_ingestion_spark.plans.urls import _salted_rank

    n = 20_000  # 95% of rows in ONE domain
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit(n).cast("long").alias("tot"),
        F.when(F.col("id") % 20 != 0, F.lit("mega.com"))
        .otherwise(F.concat(F.lit("d"), (F.col("id") % 7).cast("string"), F.lit(".com")))
        .alias("domain"),
        (F.col("id") % 13 != 0).alias("eligible"),
    )
    got = _salted_rank(base)
    s = F.expr("greatest(64, least(65536, tot DIV 4096))")
    w = Window.partitionBy("domain", "eligible").orderBy(
        (F.col("doc_id") % s).asc(), F.col("doc_id").asc()
    )
    want = base.select("doc_id", F.row_number().over(w).cast("long").alias("dr"))
    gm = {r["doc_id"]: r["dr"] for r in got.select("doc_id", "dr").collect()}
    wm = {r["doc_id"]: r["dr"] for r in want.collect()}
    assert gm == wm

    plan = got._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "row_number() windowspecdefinition(domain" in line:
            assert "salt" in line, line  # never a bare per-domain window
    assert "ShuffledHashJoin" in plan, plan
    assert "BroadcastHashJoin" not in plan, plan


def test_curation_invariants(spark):
    out = docs_url_curation(spark, SF_SMOKE)
    agg = out.agg(
        F.count("*").alias("n"),
        F.sum(F.when(~F.col("canon_ok"), 1).otherwise(0)).alias("bad_canon"),
        F.sum(F.col("is_dup").cast("int")).alias("dups"),
        F.sum(F.col("blocked").cast("int")).alias("blk"),
        F.sum(F.col("kept").cast("int")).alias("kept"),
        # cap must BIND: eligible rows past the cap exist and are dropped
        F.sum(
            F.when(
                (F.col("domain_rank") > F.col("domain_cap"))
                & ~F.col("blocked")
                & ~F.col("is_dup"),
                1,
            ).otherwise(0)
        ).alias("over_cap"),
        F.sum(F.when(F.col("kept") & F.col("blocked"), 1).otherwise(0)).alias("kept_blocked"),
        F.sum(F.when(F.col("kept") & F.col("is_dup"), 1).otherwise(0)).alias("kept_dup"),
        F.sum(
            F.when(F.col("kept") & (F.col("domain_rank") > F.col("domain_cap")), 1).otherwise(0)
        ).alias("kept_over_cap"),
    ).first()
    assert agg.n > 0 and agg.bad_canon == 0
    # every curation path is exercised by the planted corpus
    assert agg.dups > 0 and agg.blk > 0 and agg.over_cap > 0 and agg.kept > 0
    # and kept rows violate none of the three rules
    assert agg.kept_blocked == 0 and agg.kept_dup == 0 and agg.kept_over_cap == 0

    # per-domain kept counts never exceed the cap
    viol = (
        out.filter(F.col("kept"))
        .groupBy("domain")
        .agg(F.count("*").alias("c"), F.max("domain_cap").alias("cap"))
        .filter(F.col("c") > F.col("cap"))
        .count()
    )
    assert viol == 0
